"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-device tests use jax's host-platform device-count trick as the
fake-cluster mechanism (SURVEY.md §4); kernels run in Pallas interpret
mode on CPU.
"""

import os
import sys

# Force CPU even when the ambient environment selects a TPU platform
# (JAX_PLATFORMS=axon): unit tests must be hermetic, fast, and fp32-exact.
# jax may already be imported (sitecustomize), so set both the env vars and
# the live config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import enable_compilation_cache  # noqa: E402

# The suite's wall time is dominated by jit compiles (the assertions are
# fast); a persistent cache makes re-runs take minutes instead of ~15.
enable_compilation_cache()

import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "velocity_asr"))


@pytest.fixture(scope="session")
def torch_reference():
    """Import the reference PyTorch package as a numerical oracle."""
    if not reference_available():
        pytest.skip("reference implementation not available")
    if REFERENCE_PATH not in sys.path:
        # append (not prepend): the reference also has a `scripts/` package
        # that must not shadow ours
        sys.path.append(REFERENCE_PATH)
    import velocity_asr

    return velocity_asr
