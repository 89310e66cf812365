import os
import sys

# TPU-engine tests run on a virtual 8-device CPU mesh; must be set before
# jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# The container's sitecustomize pins JAX_PLATFORMS=axon (tunneled TPU);
# tests must run on the virtual CPU mesh regardless.
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture
def data_dir():
    return DATA


@pytest.fixture
def golden_dir():
    return GOLDEN
