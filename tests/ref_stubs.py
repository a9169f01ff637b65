"""Importable stub installer for running the reference's pure-Python code.

The reference imports binary modules (cv2, skimage, bidi, torchvision) at
module scope that this image doesn't ship; these stubs satisfy the imports
so golden tests and the cross-framework eval harness can execute the
reference's pure-Python functions.  Only attributes actually exercised by
pure-Python paths are provided.
"""

import sys
import types

REF_SRC = "/root/reference/src"


def install_reference_stubs():
    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")
        # attributes referenced at call time only; tests exercising them
        # must not hit the stub (or they shim real implementations on top)
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


def import_reference_utils():
    """Install stubs and import the reference ``ocrfa.utils`` module."""
    import importlib
    import os

    install_reference_stubs()
    if not os.path.isdir(REF_SRC):
        raise FileNotFoundError(REF_SRC)
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    return importlib.import_module("ocrfa.utils")
