"""Bit-integrity referee for the propagation engine (bench preflight).

Round 4 found XLA:TPU flushing denormal f32 values inside fusions it
built around float-typed selects: history-flag words bitcast to f32
were zeroed at some lane widths (w=4096) but not others (w=2048) —
ARCHITECTURE.md, "uint32 packed photons".  The packed pool is unsigned
int now, which prevents that class structurally, but one silent
recurrence would invalidate every statistical test downstream.  This
module re-runs the checks that caught it, at the widths that bit, as a
first-class preflight: bench.py refuses to report a rate while any of
them fail (reference analog: the CUDA engine's propagate.cu asserts on
photon-state corruption rather than reporting a rate from garbage).

Checks, per lane width in ``WIDTHS``:

1. **terminal passthrough** — photons that are already terminal, with
   adversarial bit patterns (every flag bit exercised, denormal floats
   and NaN payloads in the float fields), must come out of the FULL
   fused driver bit-identical to how they went in.  The physics pass
   freezes non-alive photons, so the whole pack -> lane select ->
   retire scatter -> pool unpack plumbing must be bit-transparent;
   any backend flush/canonicalization shows up as flipped bits.

2. **pallas-vs-jnp** — the fused driver with the Pallas walker vs the
   jnp walker (same static cadence, ondeck off, identical RNG stream)
   must produce bit-identical pools.  The two walkers are tested
   bit-identical on the CPU backend (tests/test_mbvh_pallas.py), so a
   TPU-only divergence is a backend codegen bug, not physics.

Run directly:  python -m chroma_tpu.referee [tiny|full]
Skip knob:     CHROMA_TPU_REFEREE=0 (bench.py then reports unrefereed)
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu import event
from chroma_tpu.ops.fused import propagate_fused

WIDTHS = (2048, 4096, 8192)
# small unroll for the referee compiles (separate jit cache entries
# from the production cadence; the persistent compile cache keeps the
# cost to the first run on a host)
_SE = 4


def _adversarial_terminal_state(n, seed=3):
    """Photon state that is terminal on arrival, with bit patterns the
    round-4 bug class corrupts: denormal f32 in the payload floats,
    NaNs in pos/dir, and every flag bit set somewhere."""
    rng = np.random.RandomState(seed)
    bits = rng.randint(0, 1 << 31, size=(n, 16), dtype=np.int64) \
        .astype(np.uint32)
    bits = bits * np.uint32(2) + (np.arange(n)[:, None] & 1).astype(
        np.uint32)  # exercise the sign bit too
    pos = bits[:, 0:3].view(np.float32).copy()
    dirv = bits[:, 3:6].view(np.float32).copy()
    pol = bits[:, 6:9].view(np.float32).copy()
    # lace in exact denormals and NaN payloads
    pos[::7, 0] = np.float32(1.4e-45)            # min subnormal
    pos[1::7, 1] = np.uint32(0x007fffff).view(np.float32)  # max subnormal
    dirv[2::7, 2] = np.float32(np.nan)
    wavelength = bits[:, 9].view(np.float32).copy()
    t = bits[:, 10].view(np.float32).copy()
    weight = np.full(n, np.uint32(0x00000001)).view(np.float32).copy()
    # every photon terminal; history bits cycle through all 32
    flags = (bits[:, 12] | np.uint32(event.BULK_ABSORB)).astype(np.uint32)
    flags[::3] |= np.uint32(event.SURFACE_DETECT)
    return dict(
        pos=jnp.asarray(pos), dir=jnp.asarray(dirv), pol=jnp.asarray(pol),
        wavelength=jnp.asarray(wavelength), t=jnp.asarray(t),
        weight=jnp.asarray(weight), flags=jnp.asarray(flags),
        last_hit_triangle=jnp.asarray(
            bits[:, 13].view(np.int32).copy()),
        evidx=jnp.asarray(bits[:, 14] >> np.uint32(8)),
        index=jnp.arange(n, dtype=jnp.uint32),
    )


def _live_state(n, seed=5):
    rng = np.random.RandomState(seed)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1)[:, None]
    pol = np.cross(rng.normal(size=(n, 3)), dirs).astype(np.float32)
    pol /= np.linalg.norm(pol, axis=1)[:, None]
    return dict(
        pos=jnp.zeros((n, 3), jnp.float32), dir=jnp.asarray(dirs),
        pol=jnp.asarray(pol),
        wavelength=jnp.asarray(
            rng.uniform(300, 600, n).astype(np.float32)),
        t=jnp.zeros(n, jnp.float32), weight=jnp.ones(n, jnp.float32),
        flags=jnp.zeros(n, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        index=jnp.arange(n, dtype=jnp.uint32),
    )


def _diff_keys(a, b):
    bad = []
    for k in a:
        # ascontiguousarray: device arrays can come back as strided
        # views (e.g. a transposed lane layout), and ndarray.view
        # refuses non-contiguous reinterprets
        va = np.ascontiguousarray(np.asarray(a[k]))
        vb = np.ascontiguousarray(np.asarray(b[k]))
        if not (va.shape == vb.shape
                and np.array_equal(va.view(np.uint8),
                                   vb.view(np.uint8))):
            nd = int(np.sum(va.view(np.uint32) != vb.view(np.uint32))) \
                if va.shape == vb.shape else -1
            bad.append('%s (%d words differ)' % (k, nd))
    return bad


def run_referee(geom, widths=WIDTHS, verbose=True,
                checks=('terminal', 'crosswalk')):
    """Run the selected checks against packed geometry ``geom``;
    returns a list of failure strings (empty = pass)."""
    failures = []

    def log(msg):
        if verbose:
            print('[referee] ' + msg, flush=True)

    key = jax.random.PRNGKey(11)
    for w in widths if 'terminal' in checks else ():
        # ---- 1. terminal passthrough --------------------------------
        n = 2 * w
        state = _adversarial_terminal_state(n)
        ref = {k: np.asarray(v).copy() for k, v in state.items()}
        out, _ = propagate_fused(state, geom, key, max_steps=16,
                                 width=w, service_every=_SE, chains=1,
                                 ondeck=True)
        jax.block_until_ready(out['flags'])
        bad = _diff_keys(ref, out)
        if bad:
            failures.append('terminal passthrough w=%d: %s'
                            % (w, ', '.join(bad)))
        log('terminal passthrough w=%-5d %s'
            % (w, 'FAIL' if bad else 'ok'))

    for w in widths[:2] if 'crosswalk' in checks else ():
        # ---- 2. pallas-vs-jnp bit identity --------------------------
        n = 2 * w
        state = _live_state(n)
        # prune='off' in both: pruning changes which iteration a lane
        # drains on, which re-pairs RNG draws (see
        # tests/test_mbvh_pallas.py); with it off the cadences — and
        # so every draw — are exactly equal
        out_p, _ = propagate_fused(state, geom, key, max_steps=16,
                                   width=w, service_every=_SE,
                                   chains=1, ondeck=False,
                                   use_pallas=True, prune='off')
        out_j, _ = propagate_fused(state, geom, key, max_steps=16,
                                   width=w, service_every=_SE,
                                   chains=1, ondeck=False,
                                   use_pallas=False, prune='off')
        jax.block_until_ready(out_p['flags'])
        jax.block_until_ready(out_j['flags'])
        bad = _diff_keys(out_p, out_j)
        if bad:
            failures.append('pallas-vs-jnp w=%d: %s'
                            % (w, ', '.join(bad)))
        log('pallas-vs-jnp       w=%-5d %s'
            % (w, 'FAIL' if bad else 'ok'))
    return failures


def main():
    import sys
    # same persistent compile cache as the bench child, so standalone
    # referee runs share (and pre-warm) the preflight compiles
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                          '/tmp/chroma_tpu_jax_cache_tpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    from chroma_tpu import gpu, demo
    which = sys.argv[1] if len(sys.argv) > 1 else 'tiny'
    gg = gpu.GPUDetector.from_table_cache(which)
    if gg is None:
        geo = demo.detector() if which == 'full' else demo.tiny()
        geo.flatten()
        gg = gpu.GPUDetector(geo)
    failures = run_referee(gg.geom)
    if failures:
        print('[referee] FAILED:')
        for f in failures:
            print('  ' + f)
        sys.exit(1)
    print('[referee] all checks passed')


if __name__ == '__main__':
    main()
