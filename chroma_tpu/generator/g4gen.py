"""Geant4-backed photon generation (parity: chroma/generator/g4gen.py).

The reference builds a Geant4 world of the detector material, converts
chroma Materials into G4 materials with scintillation property tables,
fires the particle gun, and harvests optical photons from a tracking
action that kills them at creation (reference: chroma/generator/
g4gen.py:64-163 + src/G4chroma.cc:184-206).  This module implements
the same behavior on top of ``geant4_pybind``: a one-material world,
Penelope EM + optical physics, and a stacking action that records and
kills every optical photon at creation so Geant4 never transports
them (the TPU engine does).

Importing this module raises ImportError when no Geant4 python
bindings are installed; the worker pool then falls back to the native
physics-grade ``TrackGenerator`` (chroma_tpu/generator/trackgen.py).
"""
import numpy as np

import geant4_pybind as g4

from chroma_tpu import event

HBARC_MEV_NM = 197.3269804e-6   # MeV * nm
MM = 1.0                        # Geant4 default length unit is mm


def _to_energy_pairs(data):
    """(wavelength nm, value) table -> (energies MeV ascending, values)
    as the reference's add_prop does (g4gen.py:22)."""
    data = np.asarray(data, float)
    e = 2 * np.pi * HBARC_MEV_NM / data[::-1, 0]
    return e.tolist(), data[::-1, 1].tolist()


def create_g4material(material):
    """chroma Material -> G4Material with optical/scintillation tables
    (reference: chroma/generator/g4gen.py:37-61)."""
    nist = g4.G4NistManager.Instance()
    comp = getattr(material, 'composition', None) or \
        {'H': 0.1119, 'O': 0.8881}
    density = (getattr(material, 'density', 0.0) or 1.0) * g4.g / g4.cm3
    g4mat = g4.G4Material(material.name, density, len(comp))
    for symbol, frac in comp.items():
        g4mat.AddElement(nist.FindOrBuildElement(symbol), float(frac))

    table = g4.G4MaterialPropertiesTable()
    if getattr(material, 'refractive_index', None) is not None:
        e, v = _to_energy_pairs(material.refractive_index)
        table.AddProperty('RINDEX', e, v)
    spec = getattr(material, 'scintillation_spectrum', None)
    if spec is not None:
        spec = np.asarray(spec, float)
        # dy/dwavelength -> dy/denergy, as the reference's
        # 'dy_dwavelength' option does (g4gen.py:24)
        e, v = _to_energy_pairs(np.column_stack(
            [spec[:, 0],
             spec[:, 1] * spec[:, 0] ** 2 / (2 * np.pi * HBARC_MEV_NM)]))
        table.AddProperty('SCINTILLATIONCOMPONENT1', e, v)
        table.AddConstProperty('SCINTILLATIONYIELD1', 1.0)
    ly = getattr(material, 'scintillation_light_yield', None)
    if ly:
        table.AddConstProperty('SCINTILLATIONYIELD', float(ly) / g4.MeV)
        table.AddConstProperty('RESOLUTIONSCALE', 1.0)
    wf = getattr(material, 'scintillation_waveform', None)
    if wf is not None:
        wf = np.asarray(wf, float)
        if np.all(wf[:, 0] <= 0):          # (-tau, amplitude) rows
            table.AddConstProperty('SCINTILLATIONTIMECONSTANT1',
                                   float(-wf[0, 0]) * g4.ns)
    rise = getattr(material, 'scintillation_rise_time', None)
    if rise:
        table.AddConstProperty('SCINTILLATIONRISETIME1',
                               float(rise) * g4.ns)
    g4mat.SetMaterialPropertiesTable(table)

    mod = getattr(material, 'scintillation_mod', None)
    if mod is not None:
        from chroma_tpu.generator.trackgen import _birks_constant_mm
        g4mat.GetIonisation().SetBirksConstant(
            _birks_constant_mm(material) * g4.mm / g4.MeV)
    return g4mat


class _World(g4.G4VUserDetectorConstruction):
    def __init__(self, g4material, size_m=100.0):
        super().__init__()
        self.material = g4material
        self.size = size_m * g4.m

    def Construct(self):
        box = g4.G4Box('world', self.size / 2, self.size / 2,
                       self.size / 2)
        lv = g4.G4LogicalVolume(box, self.material, 'world')
        return g4.G4PVPlacement(None, g4.G4ThreeVector(), lv, 'world',
                                None, False, 0)


class _Physics(g4.G4VModularPhysicsList):
    """Penelope low-energy EM + optical processes, photons killed at
    creation by the stacking action (reference: src/G4chroma.cc:17-34
    builds the same list)."""

    def __init__(self):
        super().__init__()
        self.RegisterPhysics(g4.G4EmPenelopePhysics(0))
        optical = g4.G4OpticalPhysics()
        self.RegisterPhysics(optical)


class _PhotonHarvester(g4.G4UserStackingAction):
    """Records optical photons at creation and kills them — the
    pybind equivalent of the reference TrackingAction
    (src/G4chroma.cc:184-206)."""

    def __init__(self):
        super().__init__()
        self.reset()

    def reset(self):
        self.pos, self.dir, self.pol = [], [], []
        self.wavelength, self.t, self.flags = [], [], []

    def ClassifyNewTrack(self, track):
        if track.GetDefinition() == \
                g4.G4OpticalPhoton.OpticalPhotonDefinition():
            p = track.GetPosition()
            d = track.GetMomentumDirection()
            q = track.GetPolarization()
            self.pos.append((p.x, p.y, p.z))
            self.dir.append((d.x, d.y, d.z))
            self.pol.append((q.x, q.y, q.z))
            self.wavelength.append(
                2 * np.pi * HBARC_MEV_NM / track.GetKineticEnergy())
            self.t.append(track.GetGlobalTime() / g4.ns)
            proc = track.GetCreatorProcess()
            name = proc.GetProcessName() if proc else ''
            flag = event.CHERENKOV if 'Cerenkov' in name else (
                event.SCINTILLATION if 'Scint' in name else 0)
            self.flags.append(flag)
            return g4.G4ClassificationOfNewTrack.fKill
        return g4.G4ClassificationOfNewTrack.fUrgent

    def photons(self):
        n = len(self.pos)
        if n == 0:
            return event.Photons()
        return event.Photons(
            pos=np.asarray(self.pos, np.float32),
            dir=np.asarray(self.dir, np.float32),
            pol=np.asarray(self.pol, np.float32),
            wavelengths=np.asarray(self.wavelength, np.float32),
            t=np.asarray(self.t, np.float32),
            flags=np.asarray(self.flags, np.uint32))


class _Gun(g4.G4VUserPrimaryGeneratorAction):
    def __init__(self):
        super().__init__()
        self.gun = g4.G4ParticleGun(1)
        self.vertex = None

    def GeneratePrimaries(self, anEvent):
        v = self.vertex
        pd = g4.G4ParticleTable.GetParticleTable().FindParticle(
            v.particle_name)
        self.gun.SetParticleDefinition(pd)
        self.gun.SetParticlePosition(
            g4.G4ThreeVector(*[float(x) * MM for x in v.pos]))
        self.gun.SetParticleMomentumDirection(
            g4.G4ThreeVector(*[float(x) for x in v.dir]))
        self.gun.SetParticleEnergy(float(v.ke) * g4.MeV)
        self.gun.SetParticleTime(float(v.t0) * g4.ns)
        if v.pol is not None:
            self.gun.SetParticlePolarization(
                g4.G4ThreeVector(*[float(x) for x in v.pol]))
        self.gun.GeneratePrimaryVertex(anEvent)


class G4Generator(object):
    """In-process Geant4 photon generator (reference:
    chroma/generator/g4gen.py:64)."""

    def __init__(self, material, seed=None):
        if seed is not None:
            g4.G4Random.setTheSeed(int(seed) & 0x7FFFFFFF)
        self.run_manager = g4.G4RunManagerFactory.CreateRunManager(
            g4.G4RunManagerType.Serial)
        self.world_material = create_g4material(material)
        self.run_manager.SetUserInitialization(_World(self.world_material))
        self.run_manager.SetUserInitialization(_Physics())
        self.harvester = _PhotonHarvester()
        self.gun = _Gun()

        class _Init(g4.G4VUserActionInitialization):
            def __init__(s):
                super().__init__()

            def Build(s):
                s.SetUserAction(self.gun)
                s.SetUserAction(self.harvester)

        self._init = _Init()
        self.run_manager.SetUserInitialization(self._init)
        self.run_manager.Initialize()
        # warm up the physics tables
        self.generate_photons(
            [event.Vertex('e-', (0, 0, 0), (1, 0, 0), 0.5)], mute=True)

    def generate_photons(self, vertices, mute=False):
        parts = []
        for v in vertices:
            self.harvester.reset()
            self.gun.vertex = v
            self.run_manager.BeamOn(1)
            parts.append(self.harvester.photons())
            for child in (v.children or []):
                parts.append(self.generate_photons([child], mute=mute))
        parts = [p for p in parts if len(p)]
        if not parts:
            return event.Photons()
        return event.Photons.join(parts)
