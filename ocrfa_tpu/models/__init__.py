"""Model zoo: CRNN recognizers (gen1/gen2), CRAFT and DBNet detectors.

All models are pure functions over explicit parameter pytrees (NHWC layout,
inference-ready batch norm) — jit/shard_map-friendly and directly loadable
from converted reference checkpoints (:mod:`ocrfa_tpu.checkpoints`).
"""
