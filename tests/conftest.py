"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count` (SURVEY.md §4). Must run before
the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's boot shim (sitecustomize) registers a TPU plugin and calls
# jax.config.update("jax_platforms", ...) itself, overriding the env var —
# override it back before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
