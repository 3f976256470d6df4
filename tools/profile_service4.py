"""Ablation timing of the PRODUCTION _service_ondeck at C=3/w=4096.

Runs the real function in a fori_loop (K iterations, amortized) on
production-shaped lane/pool state, then re-times with pieces patched
out to attribute the ~2 ms/pass cost:

  full        the real _service_ondeck
  -physics    physics_update -> identity
  -seeds      od_slot_seed + _reseed_pallas -> no-ops
  -both       both of the above

Usage: python tools/profile_service4.py [tiny|full] [K]
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


def run_variant(geom, state, label, K, patch_physics=False,
                patch_seeds=False):
    orig_phys = F.physics_update
    orig_reseed = F._reseed_pallas
    orig_odseed = MP.od_slot_seed

    if patch_physics:
        def fake_physics(big, res, geom_, u, flags, active, nan_mask,
                         sf, use_weights=False):
            return dict(pos=big['pos'], dir=big['dir'], pol=big['pol'],
                        wavelength=big['wavelength'], t=big['t'],
                        weight=big['weight'], flags=flags,
                        last_hit_triangle=big['last_hit_triangle'],
                        evidx=big['evidx'], index=big['index'])
        F.physics_update = fake_physics
    if patch_seeds:
        F._reseed_pallas = lambda lane, need, geom_: lane

        def fake_odseed(pos_t, dir_t, lht, ok, slot=1):
            n = pos_t.shape[1]
            pre = 'od_' if slot == 1 else 'od2_'
            return {pre + 'rays': jnp.zeros((6, n), jnp.float32),
                    pre + 'uregs': jnp.zeros((2, n), jnp.uint32)}
        MP.od_slot_seed = fake_odseed

    try:
        lanes, pools, ptrs, keys = build(geom, state)
        seg = state['pos'].shape[0] // C
        bases = [c * seg for c in range(C)]

        @jax.jit
        def run(carry):
            def body(i, carry):
                lanes, pools, ptrs, keys = carry
                lanes, pools, ptrs, keys = F._service_ondeck(
                    list(lanes), list(pools), list(ptrs), list(keys),
                    geom, 100, 0, False, bases, od_slots=OD_SLOTS)
                return tuple(lanes), tuple(pools), tuple(ptrs), \
                    tuple(keys)
            return jax.lax.fori_loop(0, K, body, carry)

        carry = (tuple(lanes), tuple(pools), tuple(ptrs), tuple(keys))
        out = run(carry)
        _sync(out[2][0])
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = run(carry)
            _sync(out[2][0])
            ts.append(time.time() - t0)
        print(f'{label:10s}: {min(ts)/K*1e3:7.3f} ms/pass', flush=True)
    finally:
        F.physics_update = orig_phys
        F._reseed_pallas = orig_reseed
        MP.od_slot_seed = orig_odseed


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    gg = gpu.GPUDetector.from_table_cache(which)
    geom = gg.geom
    state = gpu.GPUPhotons(_isotropic_photons(1 << 20)).state

    run_variant(geom, state, 'full', K)
    run_variant(geom, state, '-physics', K, patch_physics=True)
    run_variant(geom, state, '-seeds', K, patch_seeds=True)
    run_variant(geom, state, '-both', K, patch_physics=True,
                patch_seeds=True)


if __name__ == '__main__':
    main()
