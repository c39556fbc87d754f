"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX analogue of a fake distributed backend (the reference has
none — SURVEY.md §4): every pjit sharding test runs on 8 virtual CPU
devices so DP/FSDP/TP axes are exercised without TPU hardware.
"""

import os

# NB: the environment presets JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize hook registers that backend at interpreter startup, so env
# vars alone are too late — force the platform through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
