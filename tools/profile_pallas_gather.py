"""Microbenchmark: pallas DMA row-gather vs XLA gather on the TPU.

The fused walker's per-iteration cost is dominated by `rows[ptr]` —
an (n,) dynamic row gather from the (R, 840) u32 MBVH table in HBM.
Round-2 profiling measured ~69 ns/row (~48 GB/s effective), far from
HBM bandwidth.  This probes whether explicit pallas DMA pipelines do
better.

Usage: python tools/profile_pallas_gather.py [R] [n]
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 840


def xla_gather(rows, idx):
    return rows[idx]


@functools.partial(jax.jit, static_argnames=('ch', 'nsem'))
def pallas_gather_grid(rows, idx, ch=256, nsem=32):
    """Grid over chunks of ch lanes; out block in VMEM; nsem
    outstanding row DMAs pipelined per chunk."""
    n = idx.shape[0]
    assert n % ch == 0

    def kernel(idx_ref, rows_ref, out_ref, sem):
        i = pl.program_id(0)

        def dma(j):
            r = idx_ref[i * ch + j]
            return pltpu.make_async_copy(
                rows_ref.at[r], out_ref.at[j], sem.at[j % nsem])

        def warm(j, _):
            dma(j).start()
            return 0
        jax.lax.fori_loop(0, min(nsem, ch), warm, 0)

        def body(j, _):
            dma(j).wait()
            nxt = j + nsem

            @pl.when(nxt < ch)
            def _():
                dma(nxt).start()
            return 0
        jax.lax.fori_loop(0, ch, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // ch,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((ch, W), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, W), rows.dtype),
        grid_spec=grid_spec,
    )(idx, rows)


@functools.partial(jax.jit, static_argnames=('nsem',))
def pallas_gather_flat(rows, idx, nsem=64):
    """Single kernel instance, HBM->HBM row copies, nsem outstanding."""
    n = idx.shape[0]

    def kernel(idx_ref, rows_ref, out_ref, sem):
        def dma(j):
            r = idx_ref[j]
            return pltpu.make_async_copy(
                rows_ref.at[r], out_ref.at[j], sem.at[j % nsem])

        def warm(j, _):
            dma(j).start()
            return 0
        jax.lax.fori_loop(0, min(nsem, n), warm, 0)

        def body(j, _):
            dma(j).wait()
            nxt = j + nsem

            @pl.when(nxt < n)
            def _():
                dma(nxt).start()
            return 0
        jax.lax.fori_loop(0, n, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, W), rows.dtype),
        grid_spec=grid_spec,
    )(idx, rows)


K = 64     # chained gathers per dispatch to amortize ~30 ms host sync


def bench(fn, rows, idx, label, **kw):
    """Times K chained gathers inside one jit (the tunneled platform
    costs ~30 ms per dispatch, so single-call timing lies)."""
    R = rows.shape[0]

    def chained(rows, idx):
        def body(i, carry):
            idx2, acc = carry
            out = fn(rows, idx2, **kw)
            # fold the first word of each row back into the indices so
            # iterations are data-dependent (no overlap/DCE)
            w0 = out.reshape(out.shape[0], -1)[:, 0]
            idx2 = ((idx + w0.astype(jnp.int32)) % R).astype(jnp.int32)
            return idx2, acc + w0[0]
        (idx2, acc) = jax.lax.fori_loop(
            0, K, body, (idx, jnp.uint32(0)))[0:2]
        return idx2, acc

    cf = jax.jit(chained)
    try:
        out = fn(rows, idx, **kw)
        out.block_until_ready()
        cf(rows, idx)[1].block_until_ready()
    except Exception as e:
        print(f'{label}: FAILED {type(e).__name__}: '
              f'{str(e).splitlines()[0][:140]}')
        return None
    ref = np.asarray(rows)[np.asarray(idx)]
    ok = np.array_equal(np.asarray(out).reshape(ref.shape), ref)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        cf(rows, idx)[1].block_until_ready()
        ts.append(time.perf_counter() - t0)
    t = min(ts) / K
    n = idx.shape[0]
    nb = int(np.prod(rows.shape[1:])) * 4
    gbs = n * nb / t / 1e9
    print(f'{label}: {t*1e6:8.1f} us  {t/n*1e9:6.1f} ns/row '
          f'{gbs:7.1f} GB/s  correct={ok}')
    return t


@functools.partial(jax.jit, static_argnames=('ch', 'nsem'))
def pallas_gather_3d(rows, idx, ch=256, nsem=32):
    """rows is (R, S, 128) so a one-row slice is tile-aligned; grid
    over chunks of ch lanes, out block in VMEM, nsem outstanding
    row DMAs."""
    n = idx.shape[0]
    S = rows.shape[1]
    assert n % ch == 0

    def kernel(idx_ref, rows_ref, out_ref, sem):
        i = pl.program_id(0)

        def dma(j):
            r = idx_ref[i * ch + j]
            return pltpu.make_async_copy(
                rows_ref.at[r], out_ref.at[j], sem.at[j % nsem])

        def warm(j, _):
            dma(j).start()
            return 0
        jax.lax.fori_loop(0, min(nsem, ch), warm, 0)

        def body(j, _):
            dma(j).wait()
            nxt = j + nsem

            @pl.when(nxt < ch)
            def _():
                dma(nxt).start()
            return 0
        jax.lax.fori_loop(0, ch, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // ch,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((ch, S, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, S, 128), rows.dtype),
        grid_spec=grid_spec,
    )(idx, rows)


def bench3d(rows3, idx, label, **kw):
    return bench(pallas_gather_3d, rows3, idx, label, **kw)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 12308
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.randint(0, 2**32, size=(R, W), dtype=np.uint32))
    idx = jnp.asarray(rng.randint(0, R, size=n).astype(np.int32))

    bench(jax.jit(xla_gather), rows, idx, 'xla gather 2d    ')
    # tile-aligned 3D layouts: (R, 8, 128) padded, (R, 7, 128) exact-ish
    rows8 = jnp.asarray(rng.randint(
        0, 2**32, size=(R, 8, 128), dtype=np.uint32))
    rows7 = jnp.asarray(rng.randint(
        0, 2**32, size=(R, 7, 128), dtype=np.uint32))
    bench(jax.jit(xla_gather), rows7, idx, 'xla gather 3d/7  ')
    for S, r3 in ((8, rows8), (7, rows7)):
        for ch in (256, 1024):
            for nsem in (16, 64):
                bench3d(r3, idx,
                        f'pallas 3d S={S} ch={ch:4d} nsem={nsem:3d}',
                        ch=ch, nsem=nsem)


if __name__ == '__main__':
    main()
