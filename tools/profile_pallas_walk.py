"""Pallas walker vs jnp walker on the real chip: correctness + cost.

Runs (a) a bit-exactness check of intersect_mesh_pallas against
ops.mbvh.intersect_mesh on the full-demo table, and (b) a fixed-K
device loop of (gather + walk_iter) with reseed-on-drain, reporting
ns/lane-iteration — directly comparable to tools/profile_walkgather.py
(jnp body: 90-103 ns/lane).

Usage: python tools/profile_pallas_walk.py [tiny|full] [log2_width ...]
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
from chroma_tpu.ops import mbvh, mbvh_pallas as MP

K = int(os.environ.get('PALLAS_WALK_K', 512))
BLOCK = int(os.environ.get('PALLAS_WALK_BLOCK', MP.DEFAULT_BLOCK))


def check(geom, n=8192):
    ph = _isotropic_photons(n)
    org = jnp.asarray(ph.pos)
    dirv = jnp.asarray(ph.dir)
    ref = mbvh.intersect_mesh(org, dirv, geom)
    out = MP.intersect_mesh_pallas(org, dirv, geom, block=BLOCK)
    ok = True
    for k in ('triangle', 'distance', 'material_code'):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        eq = np.array_equal(a, b, equal_nan=True)
        ok &= eq
        print(f'  {k}: ' + ('match' if eq else
                            f'MISMATCH {np.sum(a != b)}/{n}'), flush=True)
    eqn = np.array_equal(np.asarray(ref['normal']),
                         np.asarray(out['normal']))
    ok &= eqn
    print('  normal: ' + ('match' if eqn else 'MISMATCH'), flush=True)
    print(f'  hits {int(np.sum(np.asarray(ref["triangle"]) >= 0))}/{n}'
          f'  -> {"OK" if ok else "FAIL"}', flush=True)
    return ok


def bench(geom, n):
    depth = int(geom.mbvh_depth)
    instanced = bool(geom.mbvh_instanced)
    sq = mbvh.tquant_scale(geom)
    rows = geom.mbvh_rows
    ph = _isotropic_photons(n)
    org = jnp.asarray(ph.pos)
    dirv = jnp.asarray(ph.dir)
    W0 = MP.seed(geom, depth, org.T, dirv.T,
                 jnp.full(n, -1, jnp.int32), jnp.ones(n, bool))

    @jax.jit
    def loop(W):
        def body(i, W):
            ptr = jax.lax.bitcast_convert_type(W['uregs'][MP.U_PTR],
                                               jnp.int32)
            row_t = rows[ptr].T
            W = MP.walk_iter(row_t, W, depth, instanced, sq,
                             block=BLOCK)
            # reseed drained lanes so every iteration does real work
            done = W['uregs'][MP.U_ACT] == 0
            W2 = MP.seed(geom, depth, W['rays'][MP.R_ORG:MP.R_ORG + 3],
                         W['rays'][MP.R_DIR:MP.R_DIR + 3],
                         jnp.full(n, -1, jnp.int32), done)
            keep = lambda a, b: jnp.where(done[None, :], b, a)
            return {k: keep(W[k], W2[k]) for k in W}
        return jax.lax.fori_loop(0, K, body, W)

    out = loop(W0)
    _sync(out['uregs'])
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = loop(W0)
        _sync(out['uregs'])
        ts.append(time.time() - t0)
    t = min(ts) / K
    print(f'  walk+gather+reseed: {t*1e6:8.1f} us/iter '
          f'({t/n*1e9:5.1f} ns/lane)  [block={BLOCK}]', flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    widths = [1 << int(x) for x in sys.argv[2:]] or [8192]
    gg = gpu.GPUDetector.from_table_cache(which)
    geom = gg.geom
    print(f'# detector={which} rows={geom.mbvh_rows.shape} '
          f'depth={geom.mbvh_depth} instanced={geom.mbvh_instanced}',
          flush=True)
    check(geom)
    for n in widths:
        print(f'== width {n} ==', flush=True)
        bench(geom, n)


if __name__ == '__main__':
    main()
