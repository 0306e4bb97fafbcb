"""Test rig: force an 8-device virtual CPU mesh (the JAX 'fake backend') so
sharding/pjit paths are exercised without TPU hardware, and pin matmuls to
float32 for numerical parity tests."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (must come after the env setup above)

# The sandbox site hook may pre-import jax with the TPU platform pinned;
# config.update overrides it as long as no backend has been initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu"
assert jax.device_count() >= 8, "virtual 8-device CPU mesh required for tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="session")
def vit_golden():
    path = os.path.join(GOLDEN_DIR, "vit_d2_w192_p8.npz")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="session")
def heads_golden():
    path = os.path.join(GOLDEN_DIR, "heads.npz")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def golden_state_dict(golden, prefix="sd::"):
    return {k[len(prefix):]: v for k, v in golden.items() if k.startswith(prefix)}
