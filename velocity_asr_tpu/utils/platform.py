"""Platform selection helper.

Some environments pre-import jax and pin a platform during interpreter
startup (sitecustomize), which silently overrides the JAX_PLATFORMS
environment variable. Calling apply_platform_env() early re-applies the
user's explicit choice through jax.config so `JAX_PLATFORMS=cpu python
scripts/...` behaves as documented.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    enable_compilation_cache()


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache shared across processes.

    First compiles of the large jitted graphs take minutes on TPU (and tens
    of seconds on CPU); without a disk cache every CLI invocation pays them
    again. Opt out with VELOCITY_ASR_NO_CACHE=1; override the location with
    VELOCITY_ASR_CACHE_DIR.
    """
    if os.environ.get("VELOCITY_ASR_NO_CACHE"):
        return
    path = (
        path
        or os.environ.get("VELOCITY_ASR_CACHE_DIR")
        or os.path.expanduser("~/.cache/velocity_asr_tpu/xla")
    )
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default threshold skips small graphs; cache everything >1 s
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
