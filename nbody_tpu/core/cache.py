"""Persistent XLA compilation cache setup.

The Barnes-Hut traversal compiles to a large scatter-heavy program; on the
tunneled TPU backend a cold compile can take minutes.  Enabling JAX's
persistent compilation cache makes every run after the first start in
seconds.  Called by the CLI and bench entry points; harmless if the config
is already set or unsupported.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("NBODY_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    if path is None:
        path = os.environ.get(
            "NBODY_TPU_COMPILE_CACHE",
            os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "nbody_tpu_xla",
            ),
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
