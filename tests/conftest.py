"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (standard JAX fake-multi-device trick).

NB the axon TPU plugin (sitecustomize) force-selects jax_platforms=
"axon,cpu" via config update, which beats the JAX_PLATFORMS env var —
so we must override through jax.config *before* backends initialize.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
