"""Profile the propagate step on the real TPU: where does time go?

Splits a full-demo propagate step into sort / traversal / physics,
sweeps the traversal iteration cap to expose the lock-step tail, and
microbenches gather cost vs working-set size over the real MBVH table.

Usage:  python tools/profile_step.py [tiny|full] [nphotons_log2]
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache_tpu')

import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu import gpu, demo
from chroma_tpu.cache import Cache
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.benchmark import _isotropic_photons, _sync
from chroma_tpu.ops import mbvh as mbvh_ops
from chroma_tpu.ops import photon as photon_ops
from chroma_tpu.ops.propagate import propagate_step


def timeit(fn, number=3, warm=1):
    for _ in range(warm):
        _sync(fn())
    ts = []
    for _ in range(number):
        t0 = time.time()
        _sync(fn())
        ts.append(time.time() - t0)
    return min(ts)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    nlog2 = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    n = 1 << nlog2

    if which == 'full':
        geo = create_geometry_from_obj(Cache().load_geometry('demo_full'))
    else:
        geo = create_geometry_from_obj(demo.tiny)
    gg = gpu.GPUDetector(geo)
    geom = gg.geom
    rows = geom.mbvh_rows
    print(f'# detector={which} rows={rows.shape} '
          f'({rows.nbytes/2**30:.2f} GiB) depth={geom.mbvh_depth} n={n}')

    # ---- realistic mid-flight state: photon bomb + a few steps -------
    photons = _isotropic_photons(n)
    gp = gpu.GPUPhotons(photons)
    state = gp.state
    key = jax.random.PRNGKey(7)
    wo = geom.world_origin
    inv_ext = 1.0 / (geom.world_scale * 65535.0)
    for i in range(3):
        key, sk = jax.random.split(key)
        state, _ = photon_ops.sort_photons(state, wo, inv_ext)
        state = propagate_step(state, geom, sk, 0)
    _sync(state['pos'])
    from chroma_tpu import event as ev
    alive = (np.asarray(state['flags']) & ev.TERMINAL_FLAGS) == 0
    print(f'# after 3 steps: alive={alive.sum()}/{n}')

    # ---- A. step split ------------------------------------------------
    t_sort = timeit(lambda: photon_ops.sort_photons(state, wo, inv_ext)[0])
    sstate, _ = photon_ops.sort_photons(state, wo, inv_ext)
    sstate = jax.tree_util.tree_map(lambda a: a.block_until_ready(), sstate)
    t_trav = timeit(lambda: mbvh_ops.intersect_mesh(
        sstate['pos'], sstate['dir'], geom, sstate['last_hit_triangle'],
        active=(sstate['flags'] & np.uint32(ev.TERMINAL_FLAGS)) == 0))
    t_step = timeit(lambda: propagate_step(sstate, geom,
                                           jax.random.PRNGKey(3), 0))
    print(f'A step-split (s): sort={t_sort:.4f} traversal={t_trav:.4f} '
          f'full_step={t_step:.4f} physics~={t_step - t_trav:.4f}')

    # ---- B. iteration-cap sweep ---------------------------------------
    act = (sstate['flags'] & np.uint32(ev.TERMINAL_FLAGS)) == 0
    for cap in (4, 8, 12, 16, 24, 32, 48, 64, 96, 65536):
        f = lambda cap=cap: mbvh_ops.intersect_mesh(
            sstate['pos'], sstate['dir'], geom,
            sstate['last_hit_triangle'], active=act, max_iters=cap)
        t = timeit(f, number=2)
        res = f()
        inc = int(np.asarray(res['incomplete'] & act).sum())
        print(f'B cap={cap:6d}: t={t:.4f}s incomplete={inc}'
              f' ({inc/max(int(np.asarray(act).sum()),1)*100:.2f}%)')

    # ---- C. gather cost vs working-set size over the real table ------
    R = rows.shape[0]
    kk = jax.random.PRNGKey(0)
    ng = 1 << 20

    @jax.jit
    def gbench(ptr):
        def body(i, acc):
            r = rows[(ptr + i) % R]
            return acc + jnp.sum(r[:, :4].astype(jnp.uint64))
        return jax.lax.fori_loop(0, 8, body, jnp.zeros((), jnp.uint64))

    for frac in (0.0001, 0.001, 0.01, 0.1, 0.5, 1.0):
        hi = max(int(R * frac), 1)
        ptr = jax.random.randint(kk, (ng,), 0, hi, dtype=jnp.int32)
        ptr = ptr.block_until_ready()
        t = timeit(lambda: gbench(ptr), number=2)
        per = t / (ng * 8) * 1e9
        print(f'C gather frac={frac:<7} ws={hi*rows.shape[1]*4/2**20:9.1f}'
              f' MiB: {per:.2f} ns/row')

    # sorted (coherent) indices over full table
    ptr = jnp.sort(jax.random.randint(kk, (ng,), 0, R, dtype=jnp.int32))
    ptr = ptr.block_until_ready()
    t = timeit(lambda: gbench(ptr), number=2)
    print(f'C gather sorted full-table: {t/(ng*8)*1e9:.2f} ns/row')


if __name__ == '__main__':
    main()
