"""Can Mosaic gather rows from a VMEM-resident table, and how fast?

If a (R,128) VMEM table can be gathered with per-lane dynamic indices
at VPU-ish speed, a TLAS/BLAS instanced traversal can keep the whole
hot working set on-chip and escape the flat ~30 ns/row HBM gather tax
(ARCHITECTURE.md cost model).  Tests:

  V1  jnp.take(table, idx, axis=0) inside a Pallas kernel
      (table (R,128) f32 VMEM, idx (B,) i32) — supported? ns/row?
  V2  same via one-hot matmul inside the kernel (MXU) for comparison.
  V3  XLA (non-Pallas) gather of the same shapes — the baseline tax.

Usage: python tools/profile_vmem_gather.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1])


def timeit(fn, number=3, warm=1):
    for _ in range(warm):
        _sync(fn())
    ts = []
    for _ in range(number):
        t0 = time.time()
        _sync(fn())
        ts.append(time.time() - t0)
    return min(ts)


LOOP = 32   # gathers per kernel call, chained to defeat CSE


def v1_take(R, B, W=128):
    table = jax.random.normal(jax.random.PRNGKey(0), (R, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, R, jnp.int32)

    def kernel(table_ref, idx_ref, out_ref):
        t = table_ref[:]
        acc = jnp.zeros((B, W), jnp.float32)
        ix = idx_ref[:]
        for i in range(LOOP):
            g = jnp.take(t, (ix + i) % R, axis=0)
            acc = acc + g
        out_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda: f(table, idx))
    t = timeit(g, number=3)
    per = t / (B * LOOP) * 1e9
    print(f'V1 take R={R} B={B}: {per:7.2f} ns/row ({W*4/per:.0f} GB/s)',
          flush=True)


def v2_onehot(R, B, W=128):
    table = jax.random.normal(jax.random.PRNGKey(0), (R, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, R, jnp.int32)

    def kernel(table_ref, idx_ref, out_ref):
        t = table_ref[:].astype(jnp.bfloat16)
        acc = jnp.zeros((B, W), jnp.float32)
        ix = idx_ref[:]
        rr = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
        for i in range(LOOP):
            oh = (rr == ((ix + i) % R)[:, None]).astype(jnp.bfloat16)
            g = jnp.dot(oh, t, preferred_element_type=jnp.float32)
            acc = acc + g
        out_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda: f(table, idx))
    t = timeit(g, number=3)
    per = t / (B * LOOP) * 1e9
    print(f'V2 onehot-matmul R={R} B={B}: {per:7.2f} ns/row',
          flush=True)


def v3_xla(R, B, W=128):
    table = jax.random.normal(jax.random.PRNGKey(0), (R, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, R, jnp.int32)

    @jax.jit
    def g():
        acc = jnp.zeros((B, W), jnp.float32)
        for i in range(LOOP):
            acc = acc + table[(idx + i) % R]
        return acc

    t = timeit(g, number=3)
    per = t / (B * LOOP) * 1e9
    print(f'V3 xla-gather R={R} B={B}: {per:7.2f} ns/row', flush=True)


def main():
    print(f'# devices: {jax.devices()}', flush=True)
    for R in (128, 512, 2048):
        for B in (4096, 32768):
            try:
                v1_take(R, B)
            except Exception as e:
                print(f'V1 R={R} B={B} FAILED: {type(e).__name__}: '
                      f'{str(e)[:300]}', flush=True)
            try:
                v2_onehot(R, B)
            except Exception as e:
                print(f'V2 R={R} B={B} FAILED: {type(e).__name__}: '
                      f'{str(e)[:200]}', flush=True)
            v3_xla(R, B)


if __name__ == '__main__':
    main()
