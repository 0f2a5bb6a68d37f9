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
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache: this box has 2 CPUs and XLA compiles are the
# dominant test cost — cache them across runs.  The env-var spellings are
# ignored by this jax version; the config API works.
import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend and
# sets jax_platforms='axon,cpu' regardless of JAX_PLATFORMS — tests must
# override via the config API or every compile goes through the TPU tunnel.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/hawq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
