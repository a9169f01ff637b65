"""OCR-FA TPU: a TPU-native (JAX/XLA/Pallas) Farsi OCR framework.

A from-scratch rebuild of the capabilities of ``erfanzar/OCR-FA`` (a
PyTorch/OpenCV EasyOCR fork) designed TPU-first: static-shape width-bucketed
batching, on-device CTC decode, Pallas kernels for the hot preprocessing and
deformable-convolution paths, and ``shard_map`` fan-out across chips.

Public API mirrors the reference: ``from ocrfa_tpu import OCR``.
"""

__version__ = "0.1.0"

_LAZY = {
    "OCR": "ocrfa_tpu.api",
    "Recognizer": "ocrfa_tpu.pipeline",
    "CraftDetector": "ocrfa_tpu.detector",
    "DBNetDetector": "ocrfa_tpu.detector_db",
    "ServingPipeline": "ocrfa_tpu.serving",
    "CTCLabelConverter": "ocrfa_tpu.decode.converter",
}


def __getattr__(name):
    # Lazy import keeps `import ocrfa_tpu` cheap (no jax import) for tools
    # that only need the registry or geometry helpers.
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = list(_LAZY) + ["__version__"]
