"""Test configuration: force the CPU backend with a virtual 8-device
mesh so sharding tests run anywhere, before jax initializes.

Note: this environment's sitecustomize registers a TPU ('axon')
backend that wins over JAX_PLATFORMS env vars, so the platform is
forced through jax.config instead."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
# persistent XLA compilation cache: recompiling the traversal/propagate
# while-loops dominates test wall-clock on small hosts.  These env vars
# are only read at `import jax` time, so they MUST be set before the
# import — set after it, the cache dir stays empty and every session
# recompiles from scratch (round-4 bug); the jax.config.update calls
# below make the setting robust even if jax was imported earlier
# (e.g. by a sitecustomize).
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs',
                  float(os.environ[
                      'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS']))
# keep test caches out of the user's real cache
os.environ.setdefault('CHROMA_TPU_CACHE', '/tmp/chroma_tpu_test_cache')

# The fused driver unrolls its service window (SERVICE_EVERY walker
# iterations) inside one jitted while-loop body, so XLA:CPU compile
# time grows with it.  It's a TPU throughput knob, not semantics —
# pin the round-3 value for the tests so the tier stays fast.
os.environ.setdefault('CHROMA_TPU_SERVICE_EVERY', '10')
