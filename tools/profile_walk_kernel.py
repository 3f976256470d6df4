"""Decompose the Pallas walker iteration: DMA-bound or compute-bound?

Times, at a fixed width, K dependent iterations of
  (a) gather + full walk_iter           (the production body)
  (b) gather + a copy-through pallas_call with identical BlockSpecs
      (same state round trip, no compute)
  (c) gather alone (rows[ptr].T with a data-dependent next ptr)

(a)-(b) isolates the kernel's compute-critical-path share; (b)-(c)
isolates the state-DMA share.  Mosaic double-buffers block DMA with
compute across grid steps, so if (b) is close to (c) the state round
trip is hidden and shrinking it (e.g. 16-bit tcodes) buys nothing.

Usage: python -m tools.profile_walk_kernel [tiny|full] [log2_w] [K]
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache_tpu')

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chroma_tpu import gpu
from chroma_tpu.benchmark import _isotropic_photons, _sync
from chroma_tpu.ops import mbvh
from chroma_tpu.ops import mbvh_pallas as MP
from chroma_tpu.bvh.mbvh import ROW_WIDTH, BRANCH


def timeit(fn, number=3, warm=1):
    for _ in range(warm):
        _sync(fn())
    ts = []
    for _ in range(number):
        t0 = time.time()
        _sync(fn())
        ts.append(time.time() - t0)
    return min(ts)


def copy_iter(row_t, W, depth, block):
    """pallas_call with walk_iter's exact specs, body = copy + a touch
    of the row (so the row block DMA isn't dead-code eliminated)."""
    n = row_t.shape[1]
    b = min(block, n)
    D = depth

    def kern(sq_ref, row_ref, rays_ref, tcodes_ref, bases_ref,
             uregs_ref, hregs_ref, iregs_ref, otcodes_ref, obases_ref,
             ouregs_ref, ohregs_ref, oiregs_ref):
        otcodes_ref[:, :] = tcodes_ref[:, :]
        obases_ref[:, :] = bases_ref[:, :]
        # fold one row word into uregs so the row DMA stays live and
        # the next gather index depends on the kernel output
        u = uregs_ref[:, :]
        ptr = u[MP.U_PTR:MP.U_PTR + 1, :] ^ (row_ref[0:1, :]
                                             & jnp.uint32(1))
        ouregs_ref[:, :] = jnp.concatenate(
            [ptr, u[1:, :]], axis=0)
        ohregs_ref[:, :] = hregs_ref[:, :]
        oiregs_ref[:, :] = iregs_ref[:, :]

    def spec(rows_):
        return pl.BlockSpec((rows_, b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    sq_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    S = MP.nslots(D)
    shapes = dict(rays=(12, n), tcodes=(S * BRANCH, n), bases=(S, n),
                  uregs=(8, n), hregs=(4, n), iregs=(MP.I_ROWS, n))
    dtypes = dict(rays=jnp.float32, tcodes=jnp.int16, bases=jnp.int32,
                  uregs=jnp.uint32, hregs=jnp.float32,
                  iregs=jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(n // b,),
        in_specs=[sq_spec, spec(ROW_WIDTH)]
        + [spec(shapes[k][0]) for k in MP.W_KEYS],
        out_specs=tuple(spec(shapes[k][0]) for k in MP._RW_KEYS),
        out_shape=tuple(jax.ShapeDtypeStruct(shapes[k], dtypes[k])
                        for k in MP._RW_KEYS),
        input_output_aliases={i + 3: i for i in range(len(MP._RW_KEYS))},
    )(jnp.reshape(jnp.zeros((), jnp.float32), (1, 1)), row_t,
      *[W[k] for k in MP.W_KEYS])
    new = dict(zip(MP._RW_KEYS, out))
    new['rays'] = W['rays']
    return new


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    w = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 13)
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    block = MP.DEFAULT_BLOCK

    gg = gpu.GPUDetector.from_table_cache(which)
    geom = gg.geom
    depth = int(geom.mbvh_depth)
    instanced = bool(geom.mbvh_instanced)
    sq = mbvh.tquant_scale(geom)
    rows = geom.mbvh_rows
    R = rows.shape[0]

    ph = _isotropic_photons(w)
    org = jnp.asarray(ph.pos)
    dirv = jnp.asarray(ph.dir)
    W0 = MP.seed(geom, depth, org.T, dirv.T,
                 jnp.full(w, -1, jnp.int32), jnp.ones(w, bool))
    print(f'# {which} w={w} K={K} depth={depth} rows={rows.shape}',
          flush=True)

    def ptr_of(W):
        return jax.lax.bitcast_convert_type(W['uregs'][MP.U_PTR],
                                            jnp.int32) % R

    @jax.jit
    def loop_full(W):
        def body(i, W):
            row_t = rows[ptr_of(W)].T
            return MP.walk_iter(row_t, W, depth, instanced, sq,
                                block=block)
        return jax.lax.fori_loop(0, K, body, W)

    @jax.jit
    def loop_copy(W):
        def body(i, W):
            row_t = rows[ptr_of(W)].T
            return copy_iter(row_t, W, depth, block)
        return jax.lax.fori_loop(0, K, body, W)

    @jax.jit
    def loop_gather(W):
        def body(i, W):
            row_t = rows[ptr_of(W)].T
            u = W['uregs']
            ptr = u[MP.U_PTR:MP.U_PTR + 1, :] ^ (row_t[0:1, :]
                                                 & jnp.uint32(1))
            return dict(W, uregs=jnp.concatenate([ptr, u[1:, :]],
                                                 axis=0))
        return jax.lax.fori_loop(0, K, body, W)

    # slim copy: only uregs/hregs round-trip the kernel; tcodes/bases/
    # iregs/rays bypass it (isolates how much of the copy-through cost
    # is state-DMA volume vs pallas fixed cost)
    def slim_iter(row_t, W, block):
        n = row_t.shape[1]
        b = block

        def kern(row_ref, uregs_ref, hregs_ref, ouregs_ref, ohregs_ref):
            u = uregs_ref[:, :]
            ptr = u[MP.U_PTR:MP.U_PTR + 1, :] ^ (row_ref[0:1, :]
                                                 & jnp.uint32(1))
            ouregs_ref[:, :] = jnp.concatenate([ptr, u[1:, :]], axis=0)
            ohregs_ref[:, :] = hregs_ref[:, :]

        def spec(rows_):
            return pl.BlockSpec((rows_, b), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kern,
            grid=(n // b,),
            in_specs=[spec(ROW_WIDTH), spec(8), spec(4)],
            out_specs=(spec(8), spec(4)),
            out_shape=(jax.ShapeDtypeStruct((8, n), jnp.uint32),
                       jax.ShapeDtypeStruct((4, n), jnp.float32)),
            input_output_aliases={1: 0, 2: 1},
        )(row_t, W['uregs'], W['hregs'])
        return dict(W, uregs=out[0], hregs=out[1])

    @jax.jit
    def loop_slim(W):
        def body(i, W):
            row_t = rows[ptr_of(W)].T
            return slim_iter(row_t, W, block)
        return jax.lax.fori_loop(0, K, body, W)

    row_const = jnp.zeros((ROW_WIDTH, w), jnp.uint32)

    @jax.jit
    def loop_full_norow(W):
        def body(i, W):
            W = MP.walk_iter(row_const, W, depth, instanced, sq,
                             block=block)
            return W
        return jax.lax.fori_loop(0, K, body, W)

    @jax.jit
    def loop_copy_norow(W):
        def body(i, W):
            return copy_iter(row_const, W, depth, block)
        return jax.lax.fori_loop(0, K, body, W)

    only = os.environ.get('PROFILE_ONLY', '')
    for name, fn in (('full walk_iter', loop_full),
                     ('copy-through kernel', loop_copy),
                     ('slim copy (u+h only)', loop_slim),
                     ('gather only', loop_gather),
                     ('full, no gather', loop_full_norow),
                     ('copy, no gather', loop_copy_norow)):
        if only and only not in name:
            continue
        t = timeit(lambda fn=fn: fn(W0)['uregs'])
        per = t / K
        print(f'  {name:22s} {per*1e6:8.1f} us/iter '
              f'({per/w*1e9:6.2f} ns/lane)', flush=True)


if __name__ == '__main__':
    main()
