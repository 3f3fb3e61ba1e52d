"""Test configuration: force an 8-virtual-device CPU platform so sharding /
multi-chip paths are exercised without TPU hardware, and enable x64 so parity
tests can match the reference's numpy-float64 arithmetic bit-for-bit."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the TPU backend unconditionally;
# jax.config (not the env var) is what reliably forces CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402
import sys  # noqa: E402

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402

REFERENCE_ROOT = pathlib.Path("/root/reference")

CHOPIN_REF = REFERENCE_ROOT / "Songs/chopin/chopin_rubinstein_20b.wav"
CHOPIN_LIVE = REFERENCE_ROOT / "Songs/chopin/chopin_rachmaninoff_20b.wav"


@pytest.fixture(scope="session")
def chopin_pair():
    """The only audio pair present in the reference mount (SURVEY.md §2 C16)."""
    if not (CHOPIN_REF.exists() and CHOPIN_LIVE.exists()):
        pytest.skip("reference Chopin 20-bar wavs not available")
    return str(CHOPIN_REF), str(CHOPIN_LIVE)
