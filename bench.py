"""Driver benchmark: photons/s propagated through the demo detector.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: 2.5M photons/s, full physics, 29k-PMT-class demo detector on
one GPU (reference README.md:5).  Uses the full demo detector when its
cached geometry is available (see tools/build_full_demo.py), otherwise
the tiny demo variant, and says which in the metric name.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_PHOTONS_PER_S = 2.5e6


def main():
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                          '/tmp/chroma_tpu_jax_cache_tpu')
    import jax
    from chroma_tpu import demo, gpu
    from chroma_tpu.cache import Cache
    from chroma_tpu.loader import create_geometry_from_obj
    from chroma_tpu.benchmark import propagate, _isotropic_photons, _sync

    # prefer the cached full demo detector
    detector_name = 'demo_full'
    try:
        cache = Cache()
        geo = cache.load_geometry(detector_name)
        geo = create_geometry_from_obj(geo)
        tag = 'full-demo'
    except Exception:
        geo = create_geometry_from_obj(demo.tiny)
        tag = 'tiny-demo'

    gpu_geometry = gpu.GPUDetector(geo) \
        if hasattr(geo, 'num_channels') else gpu.GPUGeometry(geo)

    nphotons = int(os.environ.get('BENCH_NPHOTONS', 1 << 18))
    rates = propagate(gpu_geometry, number=4, nphotons=nphotons,
                      max_steps=100)
    value = float(np.mean(rates[1:]))

    print(json.dumps({
        'metric': 'photons propagated/sec (%s detector, full physics)'
                  % tag,
        'value': value,
        'unit': 'photons/s',
        'vs_baseline': value / BASELINE_PHOTONS_PER_S,
    }))


if __name__ == '__main__':
    main()
