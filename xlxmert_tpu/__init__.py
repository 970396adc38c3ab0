"""x-lxmert-tpu: TPU-native X-LXMERT framework (JAX/XLA/Pallas)."""
import os as _os


def _toolchain_stamp():
    """Version stamp for the persistent compile cache directory.

    A libtpu/jaxlib roll has produced stale-AOT crashes before
    (MULTICHIP_r01: 'AOT result was compiled for a different libtpu
    version'); keying the cache dir by toolchain versions makes a roll
    start a fresh cache instead of replaying incompatible artifacts."""
    parts = []
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", ""))
    except Exception:
        pass
    try:
        from importlib import metadata as _md

        for dist in ("libtpu", "libtpu-nightly"):
            try:
                parts.append(_md.version(dist))
                break
            except Exception:
                continue
    except Exception:
        pass
    return "-".join(p for p in parts if p) or "unversioned"


def _enable_compilation_cache():
    """Persistent XLA compilation cache — measured 405s -> 0.3s on repeat
    compiles through this machine's remote-compile tunnel. Opt out with
    XLXMERT_NO_COMPILE_CACHE=1; relocate with XLXMERT_COMPILE_CACHE
    (a toolchain-version subdirectory is appended either way)."""
    if _os.environ.get("XLXMERT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        base = _os.environ.get("XLXMERT_COMPILE_CACHE",
                               _os.path.expanduser("~/.cache/xlxmert_jax"))
        stamped = _os.path.join(base, _toolchain_stamp())
        # one-time migration: entries written before the cache was
        # version-stamped live directly under `base` and were produced
        # by the then-current (== current, at migration time) toolchain
        try:
            if _os.path.isdir(base) and not _os.path.isdir(stamped):
                entries = [e for e in _os.listdir(base)
                           if e.endswith("-cache")]
                if entries:
                    _os.makedirs(stamped, exist_ok=True)
                    for e in entries:
                        _os.rename(_os.path.join(base, e),
                                   _os.path.join(stamped, e))
        except OSError:
            pass
        jax.config.update("jax_compilation_cache_dir", stamped)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
