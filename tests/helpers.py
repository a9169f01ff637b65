"""Shared test helpers."""

import numpy as np

from ocrfa_tpu.detector import CraftDetector


class OracleCraftDetector(CraftDetector):
    """A CRAFT detector whose heatmaps are derived from page darkness.

    Facade tests with a random-init CRAFT find zero boxes (random conv
    towers emit sub-threshold score maps), which silently turns every
    readtext assertion into a no-op.  This oracle keeps the whole host
    pipeline (resize -> normalize -> box extraction -> grouping -> crop ->
    recognize) honest by scoring exactly the dark regions of the canvas:
    after ``normalize_mean_variance`` dark ink is negative, paper is
    positive, so ``mean(channel) < 0`` is a clean text mask at any
    canvas scale.
    """

    def __init__(self):
        self.compute_dtype = np.float32
        self.mesh = None
        self.canvas_bucket = None

    def heatmaps(self, batch: np.ndarray) -> np.ndarray:
        g = np.asarray(batch).mean(axis=-1)
        half = g[:, ::2, ::2]
        score_text = (half < 0).astype(np.float32) * 0.95
        score_link = np.zeros_like(score_text)
        return np.stack([score_text, score_link], axis=-1)
