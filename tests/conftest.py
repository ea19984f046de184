"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count` (SURVEY.md §4). Must run before
the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
