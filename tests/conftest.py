"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip hardware isn't available in CI; sharding tests run on a virtual
8-device CPU mesh (the driver separately dry-run-compiles the multi-chip
path via __graft_entry__.dryrun_multichip).

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin in
every interpreter *before* pytest starts, so setting JAX_PLATFORMS via
os.environ here is too late — jax snapshotted the env at import. Updating the
live config forces the CPU backend regardless.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
