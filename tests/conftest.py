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


# ---------------------------------------------------------------------------
# Global-toggle hygiene: several opt-in performance modes are module-level
# flags (models/lxmert.serving_mode, serving/lxmert_int8.attention_impl /
# int8_attention, models/gan.render_mode / conv_pack_mode,
# models/detectron.group_conv_mode). In-process CLI invocations flip some
# of them (cli/serve.py enables serving_mode) and a leak silently changes
# the MATH of every later test — the NLVR2 trajectory-parity test failed
# only when run after test_cli_extra's serve run (round 5). Reset them all
# before every test so parity tests always start from the exact fp32
# defaults regardless of suite order.
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_global_perf_toggles():
    yield
    from xlxmert_tpu.models import gan as _gan
    from xlxmert_tpu.models import lxmert as _lxmert
    from xlxmert_tpu.models import detectron as _det
    from xlxmert_tpu.serving import lxmert_int8 as _engine

    _lxmert.serving_mode(False)
    if hasattr(_lxmert, "train_attention_mode"):
        _lxmert.train_attention_mode("xla")
    _engine.attention_impl("auto")
    _engine.int8_attention(False)
    _gan.render_mode(None)
    if hasattr(_gan, "conv_pack_mode"):
        _gan.conv_pack_mode(False)
    _det.group_conv_mode(False)
