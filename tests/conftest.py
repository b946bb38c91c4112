"""Test fixtures: force the CPU backend with 8 virtual devices so sharding
tests run anywhere (SURVEY.md S4 item 4).

The environment's sitecustomize registers a remote-TPU PJRT plugin and
forces jax_platforms to prefer it; env vars alone don't undo that, so we
update the jax config in-process before any backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
