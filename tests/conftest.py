"""Test configuration: CPU backend, float64, 8 virtual devices.

Conformance numerics match the float64 reference, so tests run on the CPU
backend with x64 enabled.

Environment gotcha: this container's ``sitecustomize.py`` imports jax and
registers the remote-TPU ("axon") PJRT plugin at *interpreter startup*, and
the env exports ``JAX_PLATFORMS=axon`` — initializing that backend blocks
for minutes.  Env-var edits here are too late (jax is already imported), but
``jax.config.update("jax_platforms", "cpu")`` before first use reliably
forces the CPU backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's cost is dominated by XLA CPU
# compiles of the big jitted programs (mpc_step variants); repeat runs and
# the subprocess-isolated tests hit the disk cache instead of recompiling.
jax.config.update("jax_compilation_cache_dir", "/tmp/mpcc_jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
