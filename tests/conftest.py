"""Test configuration: force an 8-device CPU platform BEFORE jax initializes.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), mirroring the reference's
spawn-style single-host distributed tests
(``fairseq/tests/distributed/utils.py:12-41``).
"""
import os

# NOTE: this environment exports JAX_PLATFORMS=axon (the tunneled TPU) and the
# plugin wins over a plain env override — jax.config.update is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
