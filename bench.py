"""Driver benchmark: photons/s propagated through the demo detector.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: 2.5M photons/s, full physics, on the reference's demo-class
detector on one GPU (reference README.md:5).  Our full demo carries
10,055 PMTs / 42M triangles (tools/build_full_demo.py).  Attempts the full cached demo
detector (42M triangles; see tools/build_full_demo.py) in an isolated
subprocess — the axon TPU worker can crash under the 7 GB table load —
and falls back to the tiny demo variant, labeling the metric with the
detector actually used.
"""
import json
import os
import subprocess
import sys

BASELINE_PHOTONS_PER_S = 2.5e6

_CHILD_CODE = r"""
import os, json, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache_tpu')
import numpy as np
import jax
from chroma_tpu import gpu, demo
from chroma_tpu.benchmark import propagate

which = os.environ.get('BENCH_DETECTOR', 'full')
gg = gpu.GPUDetector.from_table_cache(which)
if gg is None:
    # cold build: the instanced TLAS/BLAS pack needs only the
    # flattened scene (no legacy BVH), so even the 42M-triangle full
    # demo packs in minutes on one core
    geo = demo.detector() if which == 'full' else demo.tiny()
    geo.flatten()
    gg = gpu.GPUDetector(geo)
    gg.save_table_cache(which)

# preflight: the bit-integrity referee (chroma_tpu/referee.py).  The
# round-4 denormal-flush bug class silently corrupts history flags at
# some lane widths; a rate from a corrupting engine is worthless, so
# REFUSE to report one (skip on CPU backends / via CHROMA_TPU_REFEREE=0
# -- interpreted Pallas makes it pointless there).
if jax.default_backend() == 'tpu' \
        and os.environ.get('CHROMA_TPU_REFEREE', '1') != '0':
    from chroma_tpu.referee import run_referee
    failures = run_referee(gg.geom)
    if failures:
        print('RESULT ' + json.dumps(
            {'value': 0.0, 'referee_failures': failures}))
        raise SystemExit(1)

nphotons = int(os.environ.get('BENCH_NPHOTONS', 1 << 20))
# number=5, discard the first rep: same discard-first protocol as the
# reference benchmark (reference chroma/benchmark.py:70 uses
# number=10); more warm reps tighten the mean against the hour-scale
# device/tunnel drift this platform shows
rates = propagate(gg, number=int(os.environ.get('BENCH_NUMBER', 5)),
                  nphotons=nphotons, max_steps=100)
print('RESULT ' + json.dumps({'value': float(np.mean(rates[1:]))}))
"""


def _try(detector, nphotons, timeout):
    env = dict(os.environ, BENCH_DETECTOR=detector,
               BENCH_NPHOTONS=str(nphotons))
    try:
        out = subprocess.run([sys.executable, '-c', _CHILD_CODE], env=env,
                             capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith('RESULT '):
            res = json.loads(line[len('RESULT '):])
            if res.get('referee_failures'):
                # bit-integrity preflight failed: refuse to report a
                # rate (a number from a corrupting engine is garbage)
                print(json.dumps({
                    'metric': 'photons propagated/sec '
                              '(REFUSED: bit-integrity referee failed)',
                    'value': 0.0, 'unit': 'photons/s',
                    'vs_baseline': 0.0,
                    'referee_failures': res['referee_failures']}))
                sys.exit(1)
            return res['value']
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    return None


def main():
    attempts = [('full', 1 << 20, 3000, 'full demo'
                 ' (10,055 PMTs, 42M triangles)'),
                ('tiny', 1 << 20, 2400, 'tiny demo (300k triangles)')]
    if os.environ.get('BENCH_SKIP_FULL'):
        attempts = attempts[1:]
    for detector, nphotons, timeout, label in attempts:
        value = _try(detector, nphotons, timeout)
        if value is not None:
            print(json.dumps({
                'metric': 'photons propagated/sec, full physics, %s'
                          % label,
                'value': value,
                'unit': 'photons/s',
                'vs_baseline': value / BASELINE_PHOTONS_PER_S,
            }))
            return
    print(json.dumps({
        'metric': 'photons propagated/sec (benchmark failed to run)',
        'value': 0.0, 'unit': 'photons/s', 'vs_baseline': 0.0}))


if __name__ == '__main__':
    main()
