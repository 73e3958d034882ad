"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device tests run on genuine multi-device XLA execution without real
chips — the JAX equivalent of "multi-node without a cluster" (SURVEY.md §4).

The ambient environment registers a remote-TPU PJRT plugin at interpreter
start and *forces* jax_platforms to it via jax.config (sitecustomize), which
would route every eager op through an RPC tunnel. We must both set the XLA
host-device flag before backends initialize and override the config after
importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
