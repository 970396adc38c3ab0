"""x-lxmert-tpu: TPU-native X-LXMERT framework (JAX/XLA/Pallas)."""
import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache — measured 405s -> 0.3s on repeat
    compiles through this machine's remote-compile tunnel. Opt out with
    XLXMERT_NO_COMPILE_CACHE=1; relocate with XLXMERT_COMPILE_CACHE."""
    if _os.environ.get("XLXMERT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("XLXMERT_COMPILE_CACHE",
                            _os.path.expanduser("~/.cache/xlxmert_jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
