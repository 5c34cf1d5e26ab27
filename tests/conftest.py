"""Test configuration: force a virtual 8-device CPU mesh and enable x64.

Sharding logic is exercised on CPU (no TPU needed), per the reference test
strategy adaptation in SURVEY.md §4: numerical-vs-analytic Jacobian harnesses
plus synthetic end-to-end fixtures.
"""

import os
import sys

# Force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU),
# but unit tests must run hermetically on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: x64 CPU jit compiles dominate test wall-time.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_emba_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
