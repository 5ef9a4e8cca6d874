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
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
