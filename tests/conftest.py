"""Test configuration: run the whole suite on 8 virtual CPU devices.

This is the rebuild's fake-backend story (SURVEY.md §4 item 4): the same
pjit/Mesh code paths exercised in CI without TPU hardware.  Env vars must be set
before jax is imported anywhere.
"""

import os

# The image pins JAX_PLATFORMS=axon (the TPU tunnel) via sitecustomize, so this must
# be a hard override, not setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
