"""Pallas fused crop kernel vs the XLA gather implementation."""

import numpy as np
import pytest

from ocrfa_tpu.preproc.device import crop_resize_normalize
from ocrfa_tpu.preproc.pallas_kernel import SLAB_H, crop_resize_normalize_pallas


class TestPallasCropKernel:
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_xla_gather(self, seed):
        rng = np.random.default_rng(seed)
        page = rng.integers(0, 255, (SLAB_H + 64, 384), dtype=np.uint8)
        boxes = np.array(
            [
                [10, 200, 20, 60],
                [0, 384, 100, 160],
                [50, 120, 200, 280],
            ],
            dtype=np.int32,
        )
        ours = np.asarray(
            crop_resize_normalize_pallas(page, boxes, out_h=64, out_w=256,
                                         interpret=True)
        )
        ref = np.asarray(crop_resize_normalize(page, boxes, out_h=64, out_w=256)[0])
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_replicate_pad(self):
        rng = np.random.default_rng(5)
        page = rng.integers(0, 255, (SLAB_H + 10, 256), dtype=np.uint8)
        boxes = np.array([[0, 64, 0, 64]], dtype=np.int32)
        out = np.asarray(
            crop_resize_normalize_pallas(page, boxes, out_h=64, out_w=128,
                                         interpret=True)
        )[0, :, :, 0]
        np.testing.assert_allclose(out[:, 64:], out[:, 63:64].repeat(64, axis=1),
                                   atol=1e-5)
