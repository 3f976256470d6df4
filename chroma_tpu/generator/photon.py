"""Photon generation from particle vertices.

The reference delegates photon generation (Cherenkov + scintillation)
to Geant4 running in forked worker processes connected over ZeroMQ
(reference: chroma/generator/photon.py).  That architecture is kept —
it is host-side and device-agnostic — with a pluggable physics backend:

  * ``G4Generator`` (chroma_tpu/generator/g4gen.py) when a Geant4
    python environment is present;
  * ``ParametricGenerator`` otherwise: a fast parametric model that
    produces Cherenkov-cone photons for relativistic charged tracks
    and isotropic scintillation photons from the detector medium's
    scintillation tables.  It reproduces photon *counts, spectra and
    timing* well enough for framework-level likelihood and PDF work
    without a Geant4 installation.
"""
import multiprocessing
import os
import threading
import time
import uuid

import numpy as np

from chroma_tpu import event
from chroma_tpu.event import PARTICLE_MASS_MEV
from chroma_tpu.sample import uniform_sphere
from chroma_tpu.transform import normalize, get_perp, rotate

try:
    import zmq
    HAVE_ZMQ = True
except ImportError:
    HAVE_ZMQ = False


def photon_bomb(n, wavelength, pos, t0=0.0):
    """An Event of n isotropic monochromatic photons from a point."""
    pos = np.tile(pos, (n, 1)).astype(np.float32)
    dir = uniform_sphere(n).astype(np.float32)
    pol = np.cross(uniform_sphere(n), dir).astype(np.float32)
    pol /= np.linalg.norm(pol, axis=1)[:, None]
    wavelengths = np.full(n, wavelength, dtype=np.float32)
    t = np.full(n, t0, dtype=np.float32)
    return event.Event(photons_beg=event.Photons(
        pos=pos, dir=dir, pol=pol, wavelengths=wavelengths, t=t))


class ParametricGenerator(object):
    """Parametric Cherenkov + scintillation photon generator.

    Cherenkov: ~370 photons/cm/(sin^2 theta_c) in the visible for a
    beta~1 particle (Frank-Tamm integrated over 300-600 nm), emitted on
    the Cherenkov cone along a straight track of the particle's CSDA
    -ish range, with 1/lambda^2 wavelength weighting.
    Scintillation: ``material.scintillation_light_yield`` photons/MeV
    (default 0 => none) emitted isotropically at the vertex with the
    material's scintillation spectrum and a single-exponential decay.
    """

    CHERENKOV_PHOTONS_PER_MM = 37.0  # dN/dx at sin^2=1, 300-600nm window

    def __init__(self, material, rng=None):
        self.material = material
        self.rng = rng or np.random.RandomState()
        ri = np.asarray(material.refractive_index)
        self.n_medium = float(np.interp(450.0, ri[:, 0], ri[:, 1]))

    def _track_length_mm(self, particle, ke):
        """Crude range model: ~5 mm/MeV for electrons in water-like
        media, scaled by mass for heavier particles; photons convert
        and give ~their energy to an electron-like shower."""
        mass = PARTICLE_MASS_MEV.get(particle, 100.0)
        if particle == 'gamma':
            return max(5.0 * ke * 0.7, 1.0)
        if mass < 1.0:      # electrons
            return max(5.0 * ke, 1.0)
        # heavier particles: shorter range per energy
        return max(2.0 * ke * (0.511 / mass) ** 0.25, 1.0)

    def _beta(self, particle, ke):
        mass = PARTICLE_MASS_MEV.get(particle, 100.0)
        if mass == 0:
            return 1.0
        gamma = 1.0 + ke / mass
        return np.sqrt(max(1.0 - 1.0 / gamma ** 2, 0.0))

    def _cherenkov_photons(self, vertex):
        beta = self._beta(vertex.particle_name, vertex.ke)
        n = self.n_medium
        if beta * n <= 1.0:
            return None
        sin2 = 1.0 - 1.0 / (beta * n) ** 2
        length = self._track_length_mm(vertex.particle_name, vertex.ke)
        mean = self.CHERENKOV_PHOTONS_PER_MM * sin2 * length
        nph = self.rng.poisson(mean)
        if nph == 0:
            return None

        dirv = normalize(np.asarray(vertex.dir, float))
        # photon origin along the track
        s = self.rng.uniform(0, length, nph)
        pos = np.asarray(vertex.pos, float)[None, :] + s[:, None] * dirv
        # Cherenkov angle around the track direction
        cos_c = 1.0 / (beta * n)
        sin_c = np.sqrt(1.0 - cos_c ** 2)
        phi = self.rng.uniform(0, 2 * np.pi, nph)
        t1 = normalize(get_perp(dirv))
        t2 = np.cross(dirv, t1)
        pdir = (cos_c * dirv[None, :]
                + sin_c * (np.cos(phi)[:, None] * t1[None, :]
                           + np.sin(phi)[:, None] * t2[None, :]))
        # polarization in the (track, photon) plane
        pol = normalize(np.cross(pdir, np.cross(dirv, pdir)))
        # 1/lambda^2 spectrum between 300 and 600 nm
        u = self.rng.uniform(0, 1, nph)
        lam = 1.0 / (1.0 / 300.0 + u * (1.0 / 600.0 - 1.0 / 300.0))
        t = vertex.t0 + s / (beta * 299.792458)
        flags = np.full(nph, event.CHERENKOV, dtype=np.uint32)
        return event.Photons(pos=pos, dir=pdir, pol=pol, wavelengths=lam,
                             t=t, flags=flags)

    def _scintillation_photons(self, vertex):
        ly = getattr(self.material, 'scintillation_light_yield', None)
        if not ly:
            return None
        nph = self.rng.poisson(ly * vertex.ke)
        if nph == 0:
            return None
        pos = np.tile(vertex.pos, (nph, 1))
        dirv = uniform_sphere(nph)
        pol = normalize(np.cross(uniform_sphere(nph), dirv))
        spectrum = getattr(self.material, 'scintillation_spectrum', None)
        if spectrum is not None:
            spectrum = np.asarray(spectrum)
            cdf = np.cumsum(spectrum[:, 1])
            cdf = cdf / cdf[-1]
            lam = np.interp(self.rng.uniform(0, 1, nph), cdf,
                            spectrum[:, 0])
        else:
            lam = self.rng.normal(420.0, 30.0, nph)
        decay = getattr(self.material, 'scintillation_rise_time', None) \
            or 5.0
        t = vertex.t0 + self.rng.exponential(decay, nph)
        flags = np.full(nph, event.SCINTILLATION, dtype=np.uint32)
        return event.Photons(pos=pos, dir=dirv, pol=pol, wavelengths=lam,
                             t=t, flags=flags)

    def generate_photons(self, vertices, mute=False):
        """Photons for a list of vertices (the G4Generator interface)."""
        parts = []
        for v in vertices:
            for p in (self._cherenkov_photons(v),
                      self._scintillation_photons(v)):
                if p is not None and len(p):
                    parts.append(p)
            for child in (v.children or []):
                child_photons = self.generate_photons([child], mute=mute)
                if len(child_photons):
                    parts.append(child_photons)
        if not parts:
            return event.Photons()
        return event.Photons.join(parts)


def _make_generator(material, seed, prefer_g4=True):
    if prefer_g4:
        try:
            from chroma_tpu.generator.g4gen import G4Generator
            return G4Generator(material, seed=seed)
        except ImportError:
            pass
    return ParametricGenerator(material,
                               rng=np.random.RandomState(seed))


class GeneratorProcess(multiprocessing.Process):
    """Forked photon-generation worker fed vertices over ZMQ PULL and
    returning photon-filled events over PUSH (reference:
    chroma/generator/photon.py G4GeneratorProcess)."""

    def __init__(self, idnum, material, vertex_socket_address,
                 photon_socket_address, seed=None, tracking=False):
        multiprocessing.Process.__init__(self)
        self.idnum = idnum
        self.material = material
        self.vertex_socket_address = vertex_socket_address
        self.photon_socket_address = photon_socket_address
        self.seed = seed
        self.tracking = tracking
        self.daemon = True

    def run(self):
        gen = _make_generator(self.material, self.seed)
        context = zmq.Context()
        vertex_socket = context.socket(zmq.PULL)
        vertex_socket.connect(self.vertex_socket_address)
        photon_socket = context.socket(zmq.PUSH)
        photon_socket.connect(self.photon_socket_address)

        # ready handshake so the parent knows the world is built
        photon_socket.send_pyobj(('READY', self.idnum))

        while True:
            ev = vertex_socket.recv_pyobj()
            ev.photons_beg = gen.generate_photons(ev.vertices)
            ev.nphotons = len(ev.photons_beg)
            photon_socket.send_pyobj(ev)


class G4ParallelGenerator(object):
    """Pool of photon-generation workers (reference:
    chroma/generator/photon.py G4ParallelGenerator).  Events may come
    back out of order."""

    def __init__(self, nprocesses, material, base_seed=None,
                 tracking=False):
        if not HAVE_ZMQ:
            raise ImportError('pyzmq is required for the parallel '
                              'generator pool')
        self.material = material
        if base_seed is None:
            base_seed = np.random.randint(100000000)
        base_address = 'ipc:///tmp/chroma_tpu_' + uuid.uuid4().hex
        self.vertex_address = base_address + '.vertex'
        self.photon_address = base_address + '.photon'
        self.processes = [
            GeneratorProcess(i, material, self.vertex_address,
                             self.photon_address, seed=base_seed + i,
                             tracking=tracking)
            for i in range(nprocesses)]
        for p in self.processes:
            p.start()

        self.zmq_context = zmq.Context()
        self.vertex_socket = self.zmq_context.socket(zmq.PUSH)
        self.vertex_socket.bind(self.vertex_address)
        self.photon_socket = self.zmq_context.socket(zmq.PULL)
        self.photon_socket.bind(self.photon_address)

        self.processes_initialized = False

    def _wait_for_ready(self):
        if not self.processes_initialized:
            for _ in self.processes:
                msg = self.photon_socket.recv_pyobj()
                assert msg[0] == 'READY'
            self.processes_initialized = True

    def generate_events(self, events):
        """Yield photon-filled events for an iterable of vertex events.
        Backpressure: at most 2 x nprocesses events in flight."""
        self._wait_for_ready()

        sem = threading.Semaphore(len(self.processes) * 2)
        sent = [0]

        def sender():
            for ev in events:
                sem.acquire()
                self.vertex_socket.send_pyobj(ev)
                sent[0] += 1
            sent.append(True)  # done marker

        t = threading.Thread(target=sender)
        t.daemon = True
        t.start()

        received = 0
        while True:
            done = len(sent) > 1
            if done and received == sent[0]:
                break
            # poll so we never block forever racing the done marker
            if self.photon_socket.poll(100):
                ev = self.photon_socket.recv_pyobj()
                received += 1
                sem.release()
                yield ev
        t.join()

    def __del__(self):
        for p in getattr(self, 'processes', []):
            if p.is_alive():
                p.terminate()
