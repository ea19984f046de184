"""Persistent XLA compilation cache for the CLI entry points.

Cold compiles dominate startup in this stack: the EFTS train step is
~3 min and the HiFi-GAN GAN step ~25 min on a remote-compile TPU relay
(measured; the relay's IFRT sidechannel hooks DO support JAX's
persistent compilation cache, but JAX leaves the cache disabled unless
a directory is configured). Long-running trainers pay this once, but
every CLI invocation — resume, inference, a recipe stage — pays it
again for identical (jaxpr, compile options) keys.

`enable_persistent_compilation_cache()` points JAX's cache at a local
directory when the user hasn't configured one. Honors an existing
`JAX_COMPILATION_CACHE_DIR` env or already-set config value; set the
env var to an empty string to opt out entirely.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_DIR = "~/.cache/efficient_tts_tpu/xla"


def enable_persistent_compilation_cache(default_dir: str = DEFAULT_DIR):
    """Idempotent; call before the first jit compilation."""
    import jax

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env is not None:
        return env or None  # set (possibly "" = explicit opt-out) via env
    configured = getattr(jax.config, "jax_compilation_cache_dir", None)
    if configured:
        return configured
    path = os.path.expanduser(default_dir)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile that takes >=2s: at multi-minute remote
        # compiles the default (1s) would also be fine, but avoid
        # churning the cache with trivial host-side jits
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (OSError, AttributeError) as e:  # unwritable dir / old jax
        log.warning("persistent compilation cache disabled: %s", e)
        return None
    return path
