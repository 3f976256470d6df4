"""Component-level timing of the ondeck service pass at production
config (C=3, chain width 4096): what makes a service pass cost ~2 ms?

Times each piece standalone (amortized over a fori_loop so the ~26 ms
dispatch tax divides out):

  physics    physics_update over 2*w_all concatenated photons
  od_seed    MP.od_slot_seed at w_all lanes (slot packing only --
             the root slab test moved into the kernel)
  seed       MP.seed at w_all lanes (the _reseed_pallas body)
  draws      jax.random.uniform (2*w_all, NDRAWS)
  pack       _pack + _unpack round trip at w_all
  pool       retire scatter + refill gather at w_all over a 1M pool

Usage: python tools/profile_service3.py [tiny|full] [w_all] [K]
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache_tpu')

import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu import gpu
from chroma_tpu.benchmark import _isotropic_photons, _sync
from chroma_tpu.ops import fused as F
from chroma_tpu.ops import mbvh_pallas as MP
from chroma_tpu.ops.propagate import physics_update, NDRAWS


def amortized(make_body, state, K=50, number=3):
    """min time of K fori_loop iterations of body, per iteration."""
    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, K, make_body, state)
    _sync(run(state))
    ts = []
    for _ in range(number):
        t0 = time.time()
        _sync(run(state))
        ts.append(time.time() - t0)
    return min(ts) / K


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    w_all = int(sys.argv[2]) if len(sys.argv) > 2 else 12288
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    gg = gpu.GPUDetector.from_table_cache(which)
    geom = gg.geom
    n = 1 << 20
    state = gpu.GPUPhotons(_isotropic_photons(n)).state
    depth = int(geom.mbvh_depth)

    # ---- draws -------------------------------------------------------
    def body_draws(i, key):
        key, sk = jax.random.split(key)
        u = jax.random.uniform(sk, (2 * w_all, NDRAWS),
                               dtype=jnp.float32)
        return jax.random.fold_in(key, jnp.sum(u).astype(jnp.int32))
    t = amortized(body_draws, jax.random.PRNGKey(0), K)
    print(f'draws   (2x{w_all}, {NDRAWS}): {t*1e3:7.3f} ms')

    # ---- physics_update ---------------------------------------------
    big = {k: jnp.concatenate([v[:w_all], v[w_all:2 * w_all]])
           for k, v in state.items()}
    res = dict(triangle=jnp.zeros(2 * w_all, jnp.int32),
               distance=jnp.full(2 * w_all, 100.0),
               normal=jnp.tile(jnp.array([[0., 0., 1.]]), (2 * w_all, 1)),
               material_code=jnp.zeros(2 * w_all, jnp.uint32),
               incomplete=jnp.zeros(2 * w_all, bool))

    def body_phys(i, carry):
        big, key = carry
        key, sk = jax.random.split(key)
        u = jax.random.uniform(sk, (2 * w_all, NDRAWS),
                               dtype=jnp.float32)
        active = (big['flags'] & jnp.uint32(1)) == 0
        out = physics_update(big, res, geom, u, big['flags'], active,
                             jnp.zeros(2 * w_all, bool), 0)
        return dict(big, **out), key
    t_phys = amortized(body_phys, (big, jax.random.PRNGKey(1)), K)
    print(f'physics (2x{w_all}):        {t_phys*1e3:7.3f} ms '
          f'(incl draws)')

    # ---- od_seed ------------------------------------------------------
    pos_t = state['pos'][:w_all].T
    dir_t = state['dir'][:w_all].T
    lht = state['last_hit_triangle'][:w_all]

    def body_odseed(i, carry):
        pos_t, acc = carry
        od = MP.od_slot_seed(pos_t + 0.0 * acc, dir_t, lht,
                             jnp.ones(w_all, bool))
        return pos_t, jnp.sum(od['od_rays']) * 0.0
    t = amortized(body_odseed, (pos_t, jnp.zeros(())), K)
    print(f'od_seed (1x{w_all}):        {t*1e3:7.3f} ms')

    # ---- seed (reseed body) ------------------------------------------
    def body_seed(i, carry):
        pos_t, acc = carry
        W = MP.seed(geom, depth, pos_t + 0.0 * acc, dir_t, lht,
                    jnp.ones(w_all, bool))
        return pos_t, jnp.sum(W['rays']) * 0.0
    t = amortized(body_seed, (pos_t, jnp.zeros(())), K)
    print(f'seed    (1x{w_all}):        {t*1e3:7.3f} ms')

    # ---- pack/unpack ---------------------------------------------------
    lane_state = {k: v[:w_all] for k, v in state.items()}

    def body_pack(i, carry):
        st, acc = carry
        packed = F._pack(st)
        st2 = F._unpack(packed + 0.0 * acc)
        return st2, jnp.sum(packed) * 0.0
    t = amortized(body_pack, (lane_state, jnp.zeros(())), K)
    print(f'pack+unpack (1x{w_all}):    {t*1e3:7.3f} ms')

    # ---- pool retire + refill -----------------------------------------
    pool = F._pack(state)[:1 << 20]

    def body_pool(i, carry):
        pool, ptr = carry
        finished = (jnp.arange(w_all) % 3) == 0
        out_idx = jnp.where(finished, jnp.arange(w_all) + ptr,
                            pool.shape[0])
        packed = pool[:w_all]
        pool = pool.at[out_idx].set(packed, mode='drop')
        rank = jnp.cumsum(finished.astype(jnp.int32)) - 1
        grab = ptr + rank
        src = jnp.clip(grab, 0, pool.shape[0] - 1)
        fresh = jnp.where(finished[:, None], pool[src], packed)
        return pool, ptr + jnp.sum(fresh[:, 0]).astype(jnp.int32) * 0 + 1
    t = amortized(body_pool, (pool, jnp.zeros((), jnp.int32)), K)
    print(f'pool    (1x{w_all}):        {t*1e3:7.3f} ms')


if __name__ == '__main__':
    main()
