"""Likelihood evaluation end-to-end (model: the reference's
reconstruction workflow, SURVEY §3.3) and demo-detector physics
sanity."""
import itertools

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from chroma_tpu import event, make, demo
from chroma_tpu.geometry import Solid, vacuum
from chroma_tpu.detector import Detector
from chroma_tpu.demo.optics import r7081hqe_photocathode, bialkali_qe
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.sim import Simulation
from chroma_tpu.likelihood import Likelihood
from chroma_tpu.generator.photon import photon_bomb


@pytest.fixture(scope='module')
def box_sim():
    """Four-PMT box detector: one PMT per x/y face."""
    # meter-scale so source displacement shows up in hit times well
    # above the 1.2 ns transit smear (the likelihood is time-only)
    det = Detector(vacuum)
    pmt = Solid(make.box(400.0, 400.0, 40.0), vacuum, vacuum,
                surface=r7081hqe_photocathode)
    rot_y = np.array([[0, 0, 1.], [0, 1, 0], [-1., 0, 0]])
    rot_x = np.array([[1., 0, 0], [0, 0, 1.], [0, -1., 0]])
    det.add_pmt(pmt, rotation=rot_y, displacement=(1000.0, 0, 0))
    det.add_pmt(pmt, rotation=rot_y, displacement=(-1000.0, 0, 0))
    det.add_pmt(pmt, rotation=rot_x, displacement=(0, 1000.0, 0))
    det.add_pmt(pmt, rotation=rot_x, displacement=(0, -1000.0, 0))
    det.set_time_dist_gaussian(1.2, -6.0, 6.0)
    det.set_charge_dist_gaussian(1.0, 0.1, 0.5, 1.5)
    geo = create_geometry_from_obj(det, update_bvh_cache=False)
    return Simulation(geo, geant4_processes=0, seed=99)


def bombs(pos, n=3000, t0=20.0):
    while True:
        yield photon_bomb(n, 400.0, pos, t0=t0).photons_beg


def test_likelihood_discriminates_position(box_sim):
    """NLL of the observed event is lower for the true source position
    than for a displaced hypothesis."""
    ev = next(box_sim.simulate(photon_bomb(3000, 400.0, (400.0, 0, 0),
                                           t0=20.0).photons_beg,
                               run_daq=True))
    assert ev.channels.hit.any()

    lik = Likelihood(box_sim, event=ev, trange=(-0.5, 200.0))
    nll_true = lik.eval(bombs((400.0, 0, 0)), nevals=2, nreps=2, ndaq=8)
    nll_false = lik.eval(bombs((-400.0, 0, 0)), nevals=2, nreps=2, ndaq=8)
    assert np.isfinite(nll_true.nominal_value)
    assert np.isfinite(nll_false.nominal_value)
    # the +x source puts more light on PMT 0; a -x hypothesis predicts
    # the mirror pattern, so it should fit worse
    assert nll_true.nominal_value < nll_false.nominal_value


def test_demo_detection_fraction():
    """In the tiny demo, the detected fraction of 400 nm photons from
    the center should be of order coverage x QE (sanity envelope)."""
    geo = create_geometry_from_obj(demo.tiny)
    sim = Simulation(geo, geant4_processes=0, seed=7)
    ev = next(sim.simulate(photon_bomb(20000, 400.0, (0, 0, 0)).photons_beg,
                           keep_photons_end=True))
    flags = ev.photons_end.flags
    detected = ((flags & event.SURFACE_DETECT) > 0).mean()
    qe = bialkali_qe(400.0)
    # every photon terminates
    assert ((flags & event.TERMINAL_FLAGS) != 0).all()
    # coverage of the PMT+LC faces is substantial in the tiny demo;
    # detection should land within a broad physical envelope
    assert 0.02 < detected < qe, detected
    # black sphere absorbs a large share
    absorbed = ((flags & event.SURFACE_ABSORB) > 0).mean()
    assert absorbed > 0.2


def test_likelihood_time_charge_2d(box_sim):
    """time_only=False: the 2D (t,q) variable-bin estimator runs and
    still discriminates vertex position (exceeds the reference, whose
    2D vbin mode is unimplemented — ref gpu/pdf.py get_pdf_eval)."""
    ev = next(box_sim.simulate(photon_bomb(4000, 400.0, (300, 0, 0),
                                           t0=20.0).photons_beg,
                               run_daq=True))
    lik = Likelihood(box_sim, event=ev, trange=(-0.5, 200.0),
                     time_only=False)

    def nll(pos):
        return lik.eval(bombs(pos), nevals=2, nreps=2, ndaq=8)

    right = nll((300, 0, 0))
    wrong = nll((-300, 0, 0))
    assert np.isfinite(right.nominal_value)
    assert np.isfinite(wrong.nominal_value)
    assert right.nominal_value < wrong.nominal_value
