"""Test config: run everything on a virtual 8-device CPU mesh.

The environment registers a remote-tunnel TPU backend (axon) whose per-op
round trips make eager tests pathologically slow, so tests force the local
CPU platform.  Multi-chip sharding is validated on forced host-platform
devices; the driver separately dry-runs the real multi-chip path via
__graft_entry__.

Must run before any test module imports jax-heavy code: pytest imports
conftest first, and jax.config.update('jax_platforms') wins over the
already-registered plugin as long as no backend has been initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
