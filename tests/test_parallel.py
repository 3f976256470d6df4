"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np

import tests.conftest  # noqa: F401
import jax

from chroma_tpu import event


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_matches_statistics():
    """Sharded propagation terminates photons with sane statistics and
    keeps the batch sharded."""
    import __graft_entry__ as g
    from chroma_tpu.parallel import (make_photon_mesh, pad_to_multiple,
                                     propagate_sharded)
    geom, det = g._tiny_detector_tables()
    state = g._photon_state(8192, seed=3)
    state, n = pad_to_multiple(state, 8)
    mesh = make_photon_mesh(jax.devices()[:8])
    out = propagate_sharded(state, geom, jax.random.PRNGKey(0), mesh,
                            max_steps=20)
    flags = np.asarray(out['flags'])[:n]
    terminal = (flags & event.TERMINAL_FLAGS) != 0
    assert terminal.mean() > 0.95
    detected = (flags & event.SURFACE_DETECT) > 0
    assert detected.sum() > 0
