"""Pallas walker (ops/mbvh_pallas) bit-exactness vs the jnp walker.

Runs in pallas interpret mode on the CPU backend; the same kernel is
Mosaic-compiled on real TPUs (tools/profile_pallas_walk.py checks
exactness there too).
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from chroma_tpu import make, geometry
from chroma_tpu.ops.geometry_pack import pack_geometry
from chroma_tpu.ops import mbvh as mbvh_ops
from chroma_tpu.ops import mbvh_pallas as MP


def _rays(n, seed=0, radius=0.0):
    rng = np.random.RandomState(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = (rng.uniform(-radius, radius, size=(n, 3)).astype(np.float32)
         if radius else np.zeros((n, 3), np.float32))
    return jnp.asarray(o), jnp.asarray(d)


def _assert_same(ref, out, n):
    for k in ('triangle', 'distance', 'material_code'):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert np.array_equal(a, b, equal_nan=True), \
            f'{k}: {np.sum(a != b)}/{n} mismatch'
    assert np.array_equal(np.asarray(ref['normal']),
                          np.asarray(out['normal']))


def _pack_single(mesh):
    from tests.test_mbvh import pack_geometry_for
    return pack_geometry_for(mesh)


def test_pallas_matches_jnp_flat():
    geom = _pack_single(make.sphere(50.0, nsteps=24))
    n = 256
    org, dirv = _rays(n)
    ref = mbvh_ops.intersect_mesh(org, dirv, geom)
    out = MP.intersect_mesh_pallas(org, dirv, geom, block=128)
    assert int(np.sum(np.asarray(ref['triangle']) >= 0)) == n
    _assert_same(ref, out, n)


def test_pallas_matches_jnp_instanced():
    from chroma_tpu.demo import tiny
    geo = tiny()
    geo.flatten()
    geom = pack_geometry(geo)
    assert geom.mbvh_instanced
    n = 256
    org, dirv = _rays(n, seed=3)
    ref = mbvh_ops.intersect_mesh(org, dirv, geom)
    out = MP.intersect_mesh_pallas(org, dirv, geom, block=128)
    _assert_same(ref, out, n)


def test_pallas_respects_lht_and_active():
    geom = _pack_single(make.sphere(50.0, nsteps=16))
    n = 128
    org, dirv = _rays(n, seed=5)
    ref0 = mbvh_ops.intersect_mesh(org, dirv, geom)
    lht = jnp.asarray(ref0['triangle'])
    active = jnp.asarray(np.arange(n) % 2 == 0)
    ref = mbvh_ops.intersect_mesh(org, dirv, geom,
                                  last_hit_triangle=lht, active=active)
    out = MP.intersect_mesh_pallas(org, dirv, geom,
                                   last_hit_triangle=lht, active=active,
                                   block=128)
    _assert_same(ref, out, n)
    # inactive lanes report a miss
    tri = np.asarray(out['triangle'])
    assert (tri[1::2] == -1).all()


@pytest.mark.slow
def test_fused_pallas_matches_jnp():
    """The fused driver must produce BIT-IDENTICAL propagation with
    the pallas walker and the jnp walker (same pops -> same service
    cadence -> same RNG draws)."""
    import jax
    from chroma_tpu.demo import tiny
    from chroma_tpu.ops.fused import propagate_fused
    from chroma_tpu.generator.photon import photon_bomb

    geo = tiny()
    geo.flatten()
    geom = pack_geometry(geo)
    n = 512
    np.random.seed(7)
    ph = photon_bomb(n, 400.0, (0.0, 0.0, 0.0)).photons_beg
    state = dict(
        pos=jnp.asarray(ph.pos, jnp.float32),
        dir=jnp.asarray(ph.dir, jnp.float32),
        pol=jnp.asarray(ph.pol, jnp.float32),
        wavelength=jnp.asarray(ph.wavelengths, jnp.float32),
        t=jnp.asarray(ph.t, jnp.float32),
        weight=jnp.asarray(ph.weights, jnp.float32),
        flags=jnp.asarray(ph.flags, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        index=jnp.arange(n, dtype=jnp.uint32),
    )
    key = jax.random.PRNGKey(11)
    # prune='off' in both: pruning changes which iteration a lane
    # drains on (the pallas pop's threshold is one row fresher), which
    # re-pairs RNG draws; with it off the pop sequences — and so the
    # service cadence and every draw — are exactly equal
    out_j, stats_j = propagate_fused(state, geom, key, max_steps=20,
                                     width=n, use_pallas=False,
                                     prune='off')
    out_p, stats_p = propagate_fused(state, geom, key, max_steps=20,
                                     width=n, use_pallas=True,
                                     prune='off', ondeck=False)
    for k in out_j:
        a, b = np.asarray(out_j[k]), np.asarray(out_p[k])
        assert np.array_equal(a, b, equal_nan=True), \
            f'{k}: {np.sum(a != b)}/{a.size} differ'
    # photon_steps and services must agree too (same cadence)
    assert int(stats_j[0]) == int(stats_p[0])
    assert int(stats_j[1]) == int(stats_p[1])


@pytest.mark.slow
@pytest.mark.parametrize('od_slots', [1, 2])
def test_fused_ondeck_conserves_photons(od_slots):
    """The ondeck drain-restart driver must retire every input photon
    exactly once to its own pool slot (order-preserving), with sane
    terminal flags, and its detection statistics must agree with the
    non-ondeck driver within Poisson tolerance.  Runs both the
    single-slot path and the two-slot swap cascade (od_slots=2)."""
    import jax
    from chroma_tpu import event
    from chroma_tpu.demo import tiny
    from chroma_tpu.ops.fused import propagate_fused
    from chroma_tpu.generator.photon import photon_bomb

    geo = tiny()
    geo.flatten()
    geom = pack_geometry(geo)
    n = 768    # > width so the pool refill path runs
    np.random.seed(13)
    ph = photon_bomb(n, 400.0, (0.0, 0.0, 0.0)).photons_beg
    state = dict(
        pos=jnp.asarray(ph.pos, jnp.float32),
        dir=jnp.asarray(ph.dir, jnp.float32),
        pol=jnp.asarray(ph.pol, jnp.float32),
        wavelength=jnp.asarray(ph.wavelengths, jnp.float32),
        t=jnp.asarray(ph.t, jnp.float32),
        weight=jnp.asarray(ph.weights, jnp.float32),
        flags=jnp.asarray(ph.flags, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        index=jnp.arange(n, dtype=jnp.uint32),
    )
    key = jax.random.PRNGKey(19)
    out_o, stats_o = propagate_fused(state, geom, key, max_steps=40,
                                     width=256, use_pallas=True,
                                     ondeck=True, od_slots=od_slots)
    out_r, stats_r = propagate_fused(state, geom, key, max_steps=40,
                                     width=256, use_pallas=True,
                                     ondeck=False)
    # order preserved; every photon terminal (or out of steps)
    assert np.array_equal(np.asarray(out_o['index']),
                          np.asarray(state['index']))
    assert np.array_equal(np.asarray(out_o['evidx']),
                          np.asarray(state['evidx']))
    flags_o = np.asarray(out_o['flags'])
    term = flags_o & event.TERMINAL_FLAGS
    # photons may also run out of steps mid-flight; those carry no
    # terminal flag but must have moved
    moved = ~np.isclose(np.asarray(out_o['t']),
                        np.asarray(state['t']))
    assert ((term != 0) | moved).all()
    # same physics distribution as the non-ondeck driver (same seed,
    # different RNG pairing): detection counts agree within Poisson
    det_o = int(((flags_o & event.SURFACE_DETECT) != 0).sum())
    det_r = int(((np.asarray(out_r['flags'])
                  & event.SURFACE_DETECT) != 0).sum())
    assert abs(det_o - det_r) < 6 * max(np.sqrt(det_r + 1), 3.0), \
        (det_o, det_r)
    # photon-step totals should be comparable (same physics; the
    # restart path must not silently drop or duplicate steps)
    assert 0.5 * int(stats_r[1]) <= int(stats_o[1]) <= 2 * int(stats_r[1])


@pytest.mark.slow
def test_fused_od2_reduces_service_passes():
    """The second on-deck slot must actually fire: at a long service
    window a lane completes more than one walk per window, so the
    two-slot cascade needs measurably fewer service passes to drain
    the same pool — with identical physics (same seed => detection
    counts equal up to RNG re-pairing, here checked exactly equal
    because both paths consume draws per service pass in the same
    order for this configuration)."""
    import jax
    from chroma_tpu import event
    from chroma_tpu.demo import tiny
    from chroma_tpu.ops.fused import propagate_fused
    from chroma_tpu.generator.photon import photon_bomb

    geo = tiny()
    geo.flatten()
    geom = pack_geometry(geo)
    n = 1024
    np.random.seed(13)
    ph = photon_bomb(n, 400.0, (0.0, 0.0, 0.0)).photons_beg
    state = dict(
        pos=jnp.asarray(ph.pos, jnp.float32),
        dir=jnp.asarray(ph.dir, jnp.float32),
        pol=jnp.asarray(ph.pol, jnp.float32),
        wavelength=jnp.asarray(ph.wavelengths, jnp.float32),
        t=jnp.asarray(ph.t, jnp.float32),
        weight=jnp.asarray(ph.weights, jnp.float32),
        flags=jnp.asarray(ph.flags, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        index=jnp.arange(n, dtype=jnp.uint32),
    )
    key = jax.random.PRNGKey(19)
    services = {}
    for s in (1, 2):
        out, st = propagate_fused(state, geom, key, max_steps=40,
                                  width=256, use_pallas=True,
                                  ondeck=True, od_slots=s,
                                  service_every=24, chains=1)
        flags = np.asarray(out['flags'])
        moved = ~np.isclose(np.asarray(out['t']),
                            np.asarray(state['t']))
        assert (((flags & event.TERMINAL_FLAGS) != 0) | moved).all()
        assert np.array_equal(np.asarray(out['index']),
                              np.asarray(state['index']))
        services[s] = int(st[0])
    assert services[2] < services[1], services


def test_pallas_ragged_lane_width():
    """Lane widths that are not a block multiple are padded inside
    walk_iter (regression: the fused driver's drain compaction used to
    hand the kernel 1024//3-wide lanes, whose ragged tail block DMA'd
    past the buffer and faulted the device)."""
    geom = _pack_single(make.sphere(50.0, nsteps=24))
    for n in (341, 85, 129):
        org, dirv = _rays(n, seed=7)
        ref = mbvh_ops.intersect_mesh(org, dirv, geom)
        out = MP.intersect_mesh_pallas(org, dirv, geom, block=128)
        _assert_same(ref, out, n)
