"""Test configuration.

* Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding logic is
  exercised without TPU hardware (SURVEY.md §4).
* Provides a ``ref_utils`` fixture that imports the *reference*
  implementation's pure-Python modules (with unavailable binary deps stubbed
  out) so behavioral parity can be golden-tested function-by-function.
"""

import os
import sys


os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize (TPU plugin) force-sets jax_platforms="axon,cpu"
# programmatically, overriding the JAX_PLATFORMS env var — undo that so the
# test suite really runs on the virtual 8-device CPU mesh.
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest  # noqa: E402

from tests.ref_stubs import import_reference_utils  # noqa: E402


@pytest.fixture(scope="session")
def ref_utils():
    """Import the reference ``ocrfa.utils`` module for golden comparisons."""
    try:
        return import_reference_utils()
    except FileNotFoundError:
        pytest.skip("reference tree not available")
