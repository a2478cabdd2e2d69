"""Test configuration: hermetic CPU execution with a virtual 8-device mesh.

The session's default JAX platform is a tunneled TPU ('axon'); tests must not
touch it (latency + shared resource). The axon plugin overrides JAX_PLATFORMS,
so we force the platform through jax.config, which wins.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    return REFERENCE
