"""Test configuration: force the CPU backend with a virtual 8-device
mesh so sharding tests run anywhere, before jax initializes."""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
# keep test caches out of the user's real cache
os.environ.setdefault('CHROMA_TPU_CACHE', '/tmp/chroma_tpu_test_cache')

# persistent XLA compilation cache: recompiling the traversal/propagate
# while-loops dominates test wall-clock on small hosts
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/chroma_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
