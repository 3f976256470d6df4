"""Ablation profile of the fused driver's _service pass, as wired.

Times K service passes (fori_loop, amortized) on a realistic
mid-flight lane state at width W, then re-times with pieces stubbed
out to attribute the cost:

  full        the real _service
  -physics    physics_update replaced by identity
  -reseed     _reseed_pallas skipped
  -pool       retire scatter + refill gather skipped
  -draws      the (W, NDRAWS) uniform block skipped

Usage: python tools/profile_service2.py [tiny|full] [log2_w] [K]
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache_tpu')

import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu import gpu, event
from chroma_tpu.benchmark import _isotropic_photons, _sync
from chroma_tpu.ops import fused as F
from chroma_tpu.ops import mbvh as mbvh_ops
from chroma_tpu.ops import mbvh_pallas as MP
from chroma_tpu.ops.propagate import physics_update, NDRAWS


def timeit(fn, number=3, warm=1):
    for _ in range(warm):
        _sync(fn())
    ts = []
    for _ in range(number):
        t0 = time.time()
        _sync(fn())
        ts.append(time.time() - t0)
    return min(ts)


def service_variant(geom, max_steps, skip=()):
    """A copy of F._service (pallas mode) with ablation switches."""
    def service(lane, pool, next_ptr, key):
        w = lane['pos'].shape[0]
        n_pool = pool.shape[0]
        key, sk = jax.random.split(key)
        if 'draws' in skip:
            u = jnp.zeros((w, NDRAWS), jnp.float32) + 0.5
        else:
            u = jax.random.uniform(sk, (w, NDRAWS), dtype=jnp.float32)

        holding = lane['holding']
        alive = (lane['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
        trav_done = lane['W_uregs'][MP.U_ACT] == 0
        bad = jnp.isnan(jnp.sum(lane['dir'], axis=1)
                        + jnp.sum(lane['pos'], axis=1))
        ready = holding & alive & trav_done & (lane['step'] < max_steps)
        nan_mask = ready & bad
        flags = jnp.where(nan_mask,
                          lane['flags']
                          | jnp.uint32(event.NO_HIT | event.NAN_ABORT),
                          lane['flags'])
        active = ready & ~bad

        res = F._pallas_results(lane)
        if 'physics' in skip:
            lane = dict(lane, flags=flags)
        else:
            pstate = {k: lane[k] for k in F._PHOTON_KEYS}
            new_state = physics_update(pstate, res, geom, u, flags,
                                       active, nan_mask, 0,
                                       use_weights=False)
            lane = dict(lane, **new_state)
        lane['step'] = lane['step'] + ready.astype(jnp.int32)

        alive2 = (lane['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
        finished = holding & trav_done & (~alive2
                                          | (lane['step'] >= max_steps))
        if 'pool' not in skip:
            out_idx = jnp.where(finished,
                                lane['index'].astype(jnp.int32), n_pool)
            packed = F._pack(lane)
            pool = pool.at[out_idx].set(packed, mode='drop')
            rank = jnp.cumsum(finished.astype(jnp.int32)) - 1
            grab = next_ptr + rank
            have = finished & (grab < n_pool)
            src = jnp.clip(grab, 0, n_pool - 1)
            fresh = F._unpack(jnp.where(have[:, None], pool[src], packed))
            for k in F._PHOTON_KEYS:
                lane[k] = fresh[k]
            lane['step'] = jnp.where(have, 0, lane['step'])
            lane['holding'] = (holding & ~finished) | have
            next_ptr = next_ptr + jnp.sum(finished.astype(jnp.int32))

        if 'reseed' not in skip:
            alive3 = (lane['flags']
                      & jnp.uint32(event.TERMINAL_FLAGS)) == 0
            ok = ~jnp.isnan(jnp.sum(lane['dir'], axis=1)
                            + jnp.sum(lane['pos'], axis=1))
            need = lane['holding'] & alive3 & ok & trav_done \
                & (lane['step'] < max_steps)
            lane = F._reseed_pallas(lane, need, geom)
        return lane, pool, next_ptr, key
    return service


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    w = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 13)
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    gg = gpu.GPUDetector.from_table_cache(which)
    geom = gg.geom
    n = 4 * w
    gp = gpu.GPUPhotons(_isotropic_photons(n))
    state = dict(gp.state, index=jnp.arange(n, dtype=jnp.uint32))
    print(f'# detector={which} w={w} K={K}', flush=True)

    pool = F._pack(state)
    depth = min(geom.mbvh_depth, mbvh_ops.MAX_LEVELS)
    lane = F._make_lane(state, geom, 0, w, depth, pal=True)
    # advance the walk a few iterations for a realistic drain mixture
    instanced = bool(geom.mbvh_instanced)
    sq = mbvh_ops.tquant_scale(geom)
    rows = geom.mbvh_rows

    @jax.jit
    def advance(lane, k):
        def body(i, lane):
            W = {kk[2:]: lane[kk] for kk in F._W_KEYS}
            ptr = jax.lax.bitcast_convert_type(W['uregs'][MP.U_PTR],
                                               jnp.int32)
            W = MP.walk_iter(rows[ptr].T, W, int(geom.mbvh_depth),
                             instanced, sq)
            out = dict(lane)
            out.update({'W_' + kk: v for kk, v in W.items()})
            return out
        return jax.lax.fori_loop(0, k, body, lane)

    lane = advance(lane, 5)
    key = jax.random.PRNGKey(3)
    next_ptr = jnp.asarray(w, jnp.int32)

    variants = [(), ('physics',), ('reseed',), ('pool',), ('draws',),
                ('physics', 'reseed', 'pool', 'draws')]
    base = None
    for skip in variants:
        svc = service_variant(geom, 100, skip=skip)

        @jax.jit
        def loop(lane, pool, next_ptr, key, svc=svc):
            def body(i, carry):
                lane, pool, next_ptr, key = carry
                return svc(lane, pool, next_ptr, key)
            return jax.lax.fori_loop(0, K, body,
                                     (lane, pool, next_ptr, key))

        t = timeit(lambda: loop(lane, pool, next_ptr, key)[0]['pos'],
                   number=2)
        ms = t / K * 1e3
        name = 'full' if not skip else '-' + ',-'.join(skip)
        extra = ''
        if base is None:
            base = ms
        else:
            extra = f'  (saves {base - ms:.3f} ms)'
        print(f'{name:28s} {ms:7.3f} ms/service{extra}', flush=True)


if __name__ == '__main__':
    main()
