"""Test harness: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device CPU mesh, as the build
environment exposes a single real TPU chip.  Setting the flags before jax
import is mandatory.
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
# persistent compilation cache: this box has 2 CPUs and XLA compiles are the
# dominant test cost — cache them across runs.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/hawq_tpu_xla_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '0')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
