"""Test configuration.

* Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding logic is
  exercised without TPU hardware (SURVEY.md §4).
* Provides a ``ref_utils`` fixture that imports the *reference*
  implementation's pure-Python modules (with unavailable binary deps stubbed
  out) so behavioral parity can be golden-tested function-by-function.
"""

import os
import sys
import types

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


def _install_reference_stubs():
    """Stub binary modules the reference imports but never uses at import time."""
    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")
        # attributes referenced at call time only; tests exercising them
        # must not hit the stub
        sys.modules["cv2"] = cv2
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        skimage.io = types.ModuleType("skimage.io")
        sys.modules["skimage"] = skimage
        sys.modules["skimage.io"] = skimage.io
    if "bidi" not in sys.modules:
        bidi = types.ModuleType("bidi")
        algorithm = types.ModuleType("bidi.algorithm")
        algorithm.get_display = lambda s: s  # stub; never exercised in goldens
        bidi.algorithm = algorithm
        sys.modules["bidi"] = bidi
        sys.modules["bidi.algorithm"] = algorithm
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.0.0"
        models = types.ModuleType("torchvision.models")
        transforms = types.ModuleType("torchvision.transforms")

        class _ToTensor:
            def __call__(self, img):
                import numpy as np
                import torch

                arr = np.asarray(img, dtype=np.float32) / 255.0
                if arr.ndim == 2:
                    arr = arr[None]
                else:
                    arr = arr.transpose(2, 0, 1)
                return torch.from_numpy(arr)

        transforms.ToTensor = _ToTensor
        tv.models = models
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.transforms"] = transforms


@pytest.fixture(scope="session")
def ref_utils():
    """Import the reference ``ocrfa.utils`` module for golden comparisons."""
    _install_reference_stubs()
    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        pytest.skip("reference tree not available")
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    import importlib

    return importlib.import_module("ocrfa.utils")
