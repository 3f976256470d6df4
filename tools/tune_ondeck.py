"""Sweep service_every / chains / width for the ondeck drain-restart
driver (and compare against ondeck=False at the same config).

With in-kernel restarts a drained lane no longer waits out the window,
so the optimal window is set by on-deck-slot exhaustion (one restart
per lane per window) and service amortization, not by the drain tail.
Usage:
  python tools/tune_ondeck.py [tiny|full] [log2_n]
"""
import os
import sys
import time

os.environ.setdefault('CHROMA_TPU_STATS', '1')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache_tpu')

import numpy as np
import jax

from chroma_tpu import gpu
from chroma_tpu.benchmark import _isotropic_photons, _sync
from chroma_tpu.ops.fused import propagate_fused


def run(state, geom, key, n, width, se, chains, ondeck, od_slots=None):
    f = lambda: propagate_fused(state, geom, key, max_steps=100,
                                width=width, service_every=se,
                                chains=chains, ondeck=ondeck,
                                od_slots=od_slots)
    out, stats = f()
    _sync(out['flags'])
    ts = []
    for _ in range(2):
        t0 = time.time()
        out, stats = f()
        _sync(out['flags'])
        ts.append(time.time() - t0)
    t = min(ts)
    sv, steps, li, ai = [int(x) for x in np.asarray(stats)]
    print(f'n={n} w={width:6d} se={se:2d} C={chains} od={int(ondeck)}'
          f'/{od_slots}: '
          f'{t:.3f}s {n/t/1e3:7.1f}k ph/s | util={ai/max(li,1):.2f} '
          f'rows/ph-step={ai/max(steps,1):.1f} sv={sv}', flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'full'
    nlog2 = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n = 1 << nlog2
    gg = gpu.GPUDetector.from_table_cache(which)
    geom = gg.geom
    key = jax.random.PRNGKey(1)
    state = gpu.GPUPhotons(_isotropic_photons(n)).state

    grid = os.environ.get('TUNE_GRID', 'se')
    if grid == 'se':
        ses = os.environ.get('SE_LIST')
        if ses:
            slots = [int(x) for x in
                     os.environ.get('SLOTS_LIST', '2').split(',')]
            for se in (int(x) for x in ses.split(',')):
                for sl in slots:
                    run(state, geom, key, n,
                        int(os.environ.get('W', 12288)), se,
                        int(os.environ.get('C', 3)), True, od_slots=sl)
        else:
            run(state, geom, key, n, 12288, 10, 3, False)
            for se in (8, 10, 12, 14, 18, 24):
                run(state, geom, key, n, 12288, se, 3, True)
    elif grid == 'chains':
        for C, w in ((2, 8192), (2, 12288), (3, 12288), (3, 18432),
                     (4, 16384)):
            run(state, geom, key, n, w, int(os.environ.get('SE', 12)),
                C, True)


if __name__ == '__main__':
    main()
