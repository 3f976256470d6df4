"""Per-pop outcome histogram of the MBVH walk on real rays.

Steps the Pallas walker state iteration-by-iteration on isotropic
photons and classifies every processed row:

  kind        cluster / internal / instance-entry
  improved    the pop lowered the ray's best hit distance

plus the rows-per-ray distribution (whose spread sets the fused
driver's lock-step idle).  'no-outcome' pops — neither improved the
hit nor (for internals) pushed children that were later popped — are
the slack a better tree/pruning could cut from rows/photon-step.

Usage: python -m tools.profile_popmix [tiny|full] [log2_n] [iters]
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache_tpu')

import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu import gpu
from chroma_tpu.benchmark import _isotropic_photons
from chroma_tpu.ops import mbvh
from chroma_tpu.ops import mbvh_pallas as MP
from chroma_tpu.bvh.mbvh import HDR_KIND, KIND_CLUSTER, KIND_ENTRY


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    n = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 12)
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    gg = gpu.GPUDetector.from_table_cache(which)
    geom = gg.geom
    hdr = np.asarray(geom.mbvh_rows[:, HDR_KIND])
    is_cl = (hdr & KIND_CLUSTER) != 0
    is_en = (hdr & KIND_ENTRY) != 0

    ph = _isotropic_photons(n)
    depth = int(geom.mbvh_depth)
    instanced = bool(geom.mbvh_instanced)
    sq = mbvh.tquant_scale(geom)
    rows = geom.mbvh_rows
    W = MP.seed(geom, depth, jnp.asarray(ph.pos).T,
                jnp.asarray(ph.dir).T, jnp.full(n, -1, jnp.int32),
                jnp.ones(n, bool))

    kinds = np.zeros(3, np.int64)        # cluster / internal / entry
    improved_by = np.zeros(3, np.int64)
    rows_per_ray = np.zeros(n, np.int64)
    prev = np.asarray(W['hregs'][MP.H_MIN])
    for it in range(iters):
        act = np.asarray(W['uregs'][MP.U_ACT]) != 0
        if not act.any():
            break
        ptr = np.asarray(jax.lax.bitcast_convert_type(
            W['uregs'][MP.U_PTR], jnp.int32))
        row_t = rows[jnp.asarray(ptr)].T
        W = MP.walk_iter(row_t, W, depth, instanced, sq)
        p = ptr[act]
        kcl, ken = is_cl[p], is_en[p]
        k = np.where(kcl, 0, np.where(ken, 2, 1))
        np.add.at(kinds, k, 1)
        nd = np.asarray(W['hregs'][MP.H_MIN])
        imp = ((nd < prev) & act)[act]
        np.add.at(improved_by, k[imp], 1)
        rows_per_ray += act
        prev = nd

    tot = int(kinds.sum())
    print(f'# {which} n={n} total pops={tot} '
          f'({tot/n:.1f} rows/ray-first-step... full walk)')
    for i, name in enumerate(('cluster', 'internal', 'entry')):
        print(f'  {name:9s} {kinds[i]/tot:5.2f} of pops, improved '
              f'{improved_by[i]/max(kinds[i],1):5.2f} of them')
    print('rows/ray: mean %.1f p50 %d p90 %d p99 %d max %d'
          % (rows_per_ray.mean(), *np.percentile(
              rows_per_ray, [50, 90, 99]).astype(int),
             int(rows_per_ray.max())))
    hist = np.bincount(np.clip(rows_per_ray, 0, 40))
    print('hist(rows/ray, cap 40):', list(hist))


if __name__ == '__main__':
    main()
