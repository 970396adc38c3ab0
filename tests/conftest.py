"""Test harness config.

Tests run on a virtual 8-device CPU mesh (the driver separately validates
the multi-chip path; real benches run on TPU). These env vars must be set
before jax initializes, hence this conftest is import-order critical.
"""
import os
import sys

# Force CPU: the shell may preset JAX_PLATFORMS to the real TPU ("axon").
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The machine's TPU boot shim (sitecustomize) force-updates
# jax_platforms to "axon,cpu" at interpreter start, overriding the env
# var. Point it back at CPU before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
