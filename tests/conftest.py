"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test
process, hence this lives in conftest at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The env var alone does not beat a preinstalled platform plugin (the axon
# TPU tunnel registers itself regardless); the config update does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite's cost is dominated by XLA CPU
# compiles of the big train/eval/backbone programs (the shapes are tiny);
# warm reruns skip them (>10 min -> minutes on this 1-CPU box).
from dvmatcher_tpu.utils.config import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/dvm_jax_cache_tests")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
