"""Test config: run on a virtual 8-device CPU mesh.

This is the standard way to test pjit/shard_map sharding + halo exchange
without a real TPU pod (SURVEY.md section 4). The axon sitecustomize forces
`jax_platforms=axon,cpu`, so we must override through jax.config (env vars
are ignored) before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, jax.devices()
