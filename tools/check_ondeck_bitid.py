"""Bit-equivalence harness for refactors of the ondeck service pass.

Run once with ``save`` to capture the current driver's exact pool
output on a fixed seed (CPU backend, interpreted Pallas, tiny demo),
then after a refactor run with ``check`` — any non-bitcast change in
the service's data flow shows up as a mismatch.

Usage:
  JAX_PLATFORMS=cpu python tools/check_ondeck_bitid.py save
  JAX_PLATFORMS=cpu python tools/check_ondeck_bitid.py check

The baseline path defaults to a repo-local .cache/ (override with
CHROMA_TPU_BITID_PATH) so baselines don't collide across
users/workspaces on a shared machine.
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('CHROMA_TPU_PALLAS_INTERPRET', '1')

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from chroma_tpu.demo import tiny
from chroma_tpu.ops.geometry_pack import pack_geometry
from chroma_tpu.ops.fused import propagate_fused
from chroma_tpu.generator.photon import photon_bomb

PATH = os.environ.get(
    'CHROMA_TPU_BITID_PATH',
    os.path.join(os.path.dirname(__file__), '..', '.cache',
                 'ondeck_bitid.npz'))


def run(od_slots, chains):
    # the production MIN_CHAIN_WIDTH collapses multi-chain configs at
    # this test width to one chain, which would leave the multi-chain
    # service tail unexercised — drop it so `chains` means chains
    from chroma_tpu.ops import fused as F
    F.MIN_CHAIN_WIDTH = 128
    geo = tiny()
    geo.flatten()
    geom = pack_geometry(geo)
    n = 1536
    np.random.seed(13)
    ph = photon_bomb(n, 400.0, (0.0, 0.0, 0.0)).photons_beg
    state = dict(
        pos=jnp.asarray(ph.pos, jnp.float32),
        dir=jnp.asarray(ph.dir, jnp.float32),
        pol=jnp.asarray(ph.pol, jnp.float32),
        wavelength=jnp.asarray(ph.wavelengths, jnp.float32),
        t=jnp.asarray(ph.t, jnp.float32),
        weight=jnp.asarray(ph.weights, jnp.float32),
        flags=jnp.asarray(ph.flags, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        index=jnp.arange(n, dtype=jnp.uint32),
    )
    key = jax.random.PRNGKey(19)
    out, stats = propagate_fused(state, geom, key, max_steps=40,
                                 width=512, use_pallas=True,
                                 ondeck=True, od_slots=od_slots,
                                 service_every=8, chains=chains)
    return {k: np.asarray(v) for k, v in out.items()}, np.asarray(stats)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'check'
    blobs = {}
    for od_slots, chains in ((1, 1), (1, 2), (2, 1), (1, 3), (2, 2)):
        tag = f's{od_slots}c{chains}'
        out, stats = run(od_slots, chains)
        for k, v in out.items():
            blobs[f'{tag}.{k}'] = v
        blobs[f'{tag}.stats'] = stats
    if mode == 'save':
        os.makedirs(os.path.dirname(PATH), exist_ok=True)
        np.savez(PATH, **blobs)
        print('saved', PATH, len(blobs), 'arrays')
        return
    ref = np.load(PATH)
    bad = 0
    # diff key sets first: a missing baseline key (e.g. after editing
    # the (od_slots, chains) config list) is a mismatch, not a
    # traceback; stale extra baseline keys are reported too
    missing = sorted(set(blobs) - set(ref.files))
    extra = sorted(set(ref.files) - set(blobs))
    for k in missing:
        print('MISMATCH (missing from baseline)', k)
        bad += 1
    for k in extra:
        print('MISMATCH (stale baseline key)', k)
        bad += 1
    for k, v in blobs.items():
        if k in missing:
            continue
        r = ref[k]
        if not np.array_equal(r, v, equal_nan=True):
            nd = int(np.sum(r != v)) if r.shape == v.shape else -1
            print('MISMATCH', k, nd, '/', r.size)
            bad += 1
    print('OK: all bit-identical' if not bad else f'{bad} arrays differ')
    sys.exit(1 if bad else 0)


if __name__ == '__main__':
    main()
