"""Finer ablation of the production _service_ondeck (r5).

profile_service4 showed the pass costs ~2.75 ms of which physics is
only ~0.36 ms and the seeds ~0: the plumbing dominates.  This tool
splits the plumbing: RNG draw block, the BIG assembly (unpack + where
+ concat over photon keys), the retire/refill scatter+gather, and the
walker-state writebacks.

Usage: PYTHONPATH=... python tools/profile_service5.py [tiny|full] [K]
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache_tpu')

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu import gpu
from chroma_tpu.benchmark import _isotropic_photons, _sync
from chroma_tpu.ops import fused as F
from chroma_tpu.ops import mbvh_pallas as MP

C = 3
W = 4096
OD_SLOTS = int(os.environ.get('OD_SLOTS', '1'))


def build(geom, state):
    depth = min(geom.mbvh_depth, 48)
    n = state['pos'].shape[0]
    packed = F._pack(state)
    seg = n // C
    pools = [jax.lax.slice_in_dim(packed, c * seg, (c + 1) * seg)
             for c in range(C)]
    lanes = [F._make_lane(state, geom, c * seg, W, depth, pal=True,
                          ondeck=True, od_slots=OD_SLOTS)
             for c in range(C)]
    ptrs = [jnp.asarray(W, jnp.int32) for _ in range(C)]
    keys = list(jax.random.split(jax.random.PRNGKey(0), C))
    return lanes, pools, ptrs, keys


def timeit(label, fn, carry, K):
    out = fn(carry)
    _sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(carry)
        _sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(f'{label:14s}: {min(ts)/K*1e3:7.3f} ms/pass', flush=True)


def run_service(geom, K, lanes, pools, ptrs, keys, bases, label,
                patches=()):
    orig = {}
    try:
        if 'draws' in patches:
            orig['uniform'] = jax.random.uniform

            def fake_uniform(key, shape, dtype=jnp.float32, **kw):
                return jnp.full(shape, 0.5, dtype)
            jax.random.uniform = fake_uniform
        if 'physics' in patches:
            orig['physics'] = F.physics_update

            def fake_physics(big, res, geom_, u, flags, active,
                             nan_mask, sf, use_weights=False):
                return dict(pos=big['pos'], dir=big['dir'],
                            pol=big['pol'],
                            wavelength=big['wavelength'], t=big['t'],
                            weight=big['weight'], flags=flags,
                            last_hit_triangle=big['last_hit_triangle'],
                            evidx=big['evidx'], index=big['index'])
            F.physics_update = fake_physics
        if 'seeds' in patches:
            orig['reseed'] = F._reseed_pallas
            orig['odseed'] = MP.od_slot_seed
            F._reseed_pallas = lambda lane, need, geom_: lane

            def fake_odseed(pos_t, dir_t, lht, ok, slot=1):
                n = pos_t.shape[1]
                pre = 'od_' if slot == 1 else 'od2_'
                return {pre + 'rays': jnp.zeros((6, n), jnp.float32),
                        pre + 'uregs': jnp.zeros((2, n), jnp.uint32)}
            MP.od_slot_seed = fake_odseed

        @jax.jit
        def run(carry):
            def body(i, carry):
                lanes, pools, ptrs, keys = carry
                lanes, pools, ptrs, keys = F._service_ondeck(
                    list(lanes), list(pools), list(ptrs), list(keys),
                    geom, 100, 0, False, bases, od_slots=OD_SLOTS)
                return (tuple(lanes), tuple(pools), tuple(ptrs),
                        tuple(keys))
            return jax.lax.fori_loop(0, K, body, carry)

        carry = (tuple(lanes), tuple(pools), tuple(ptrs), tuple(keys))
        timeit(label, run, carry, K)
    finally:
        if 'uniform' in orig:
            jax.random.uniform = orig['uniform']
        if 'physics' in orig:
            F.physics_update = orig['physics']
        if 'reseed' in orig:
            F._reseed_pallas = orig['reseed']
            MP.od_slot_seed = orig['odseed']


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    gg = gpu.GPUDetector.from_table_cache(which)
    geom = gg.geom
    state = gpu.GPUPhotons(_isotropic_photons(1 << 20)).state
    lanes, pools, ptrs, keys = build(geom, state)
    seg = state['pos'].shape[0] // C
    bases = [c * seg for c in range(C)]

    # isolated primitives first
    w_all = C * W
    nsets = 1 + OD_SLOTS
    key0 = jax.random.PRNGKey(3)

    @jax.jit
    def draws_only(key):
        def body(i, key):
            key, sk = jax.random.split(key)
            u = jax.random.uniform(sk, (nsets * w_all, F.NDRAWS),
                                   dtype=jnp.float32)
            return jax.lax.cond(u[0, 0] < 2.0, lambda k: k,
                                lambda k: jax.random.split(k)[0], key)
        return jax.lax.fori_loop(0, K, body, key)
    timeit('draws only', draws_only, key0, K)

    pool0 = pools[0]

    @jax.jit
    def scat_gather(carry):
        def body(i, carry):
            pool, x = carry
            idx = (jnp.arange(2 * W, dtype=jnp.int32) * 37 + i) \
                % pool.shape[0]
            rows = pool[idx]
            pool = pool.at[idx].set(rows + x.astype(jnp.uint32))
            return pool, x + 1
        return jax.lax.fori_loop(0, K, body, carry)
    timeit('pool scat+gath', scat_gather, (pool0, jnp.int32(0)), K)

    run_service(geom, K, lanes, pools, ptrs, keys, bases, 'full')
    run_service(geom, K, lanes, pools, ptrs, keys, bases, '-draws',
                ('draws',))
    run_service(geom, K, lanes, pools, ptrs, keys, bases,
                '-draws-phys', ('draws', 'physics'))
    run_service(geom, K, lanes, pools, ptrs, keys, bases,
                '-all', ('draws', 'physics', 'seeds'))


if __name__ == '__main__':
    main()
