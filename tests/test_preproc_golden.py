"""Golden parity: preproc + vectorised decode vs reference implementations."""

import numpy as np
import pytest

from ocrfa_tpu.decode import CTCLabelConverter
from ocrfa_tpu.decode.device import decode_greedy_batch
from ocrfa_tpu.preproc.host import align_collate, align_collate_u8


class TestAlignCollateGolden:
    @pytest.mark.parametrize("adjust_contrast", [0.0, 0.5])
    def test_matches_reference(self, ref_utils, adjust_contrast):
        """Our batch collate must reproduce the reference AlignCollate's
        tensor values exactly (same PIL bicubic, same pad) — the stubbed
        torchvision.ToTensor in conftest matches the real one."""
        rng = np.random.default_rng(0)
        crops = [
            rng.integers(0, 255, (64, int(w)), dtype=np.uint8)
            for w in (90, 200, 37, 256)
        ]
        img_w = 256

        ref_collate = ref_utils.AlignCollate(
            imgH=64, imgW=img_w, keep_ratio_with_pad=True,
            adjust_contrast=adjust_contrast,
        )
        from PIL import Image

        ref_batch = ref_collate([Image.fromarray(c, "L") for c in crops])
        ref_np = ref_batch.numpy()  # (N, 1, H, W)

        ours = align_collate(crops, 64, img_w, adjust_contrast=adjust_contrast)
        np.testing.assert_allclose(
            ours.transpose(0, 3, 1, 2), ref_np, atol=1e-6
        )

    def test_u8_twin_consistent(self):
        rng = np.random.default_rng(1)
        crops = [rng.integers(0, 255, (64, 120), dtype=np.uint8)]
        f32 = align_collate(crops, 64, 192)
        u8 = align_collate_u8(crops, 64, 192)
        np.testing.assert_allclose(
            f32, (u8.astype(np.float32) / 255.0 - 0.5) / 0.5, atol=1e-7
        )


class TestGreedyBatchGolden:
    def test_matches_reference_decode_greedy(self, ref_utils):
        """The vectorised (N, T) fast path must equal the reference's
        flat decode_greedy for equal-length rows."""
        charset = "ابتثج"
        ours_conv = CTCLabelConverter(charset)
        ref_conv = ref_utils.CTCLabelConverter(charset)

        rng = np.random.default_rng(2)
        for _ in range(20):
            n, t = int(rng.integers(1, 6)), int(rng.integers(1, 30))
            indices = rng.integers(0, len(charset) + 1, size=(n, t))
            ours = decode_greedy_batch(indices, ours_conv.character,
                                       ours_conv.ignore_idx)
            ref = ref_conv.decode_greedy(indices.reshape(-1), [t] * n)
            assert ours == ref


class TestContrastGolden:
    def test_contrast_grey(self, ref_utils):
        rng = np.random.default_rng(0)
        for _ in range(20):
            img = rng.integers(0, 255, (32, 48), dtype=np.uint8)
            ours = __import__("ocrfa_tpu.preproc.host", fromlist=["contrast_grey"])
            c1, h1, l1 = ours.contrast_grey(img)
            c2, h2, l2 = ref_utils.contrast_grey(img)
            assert np.isclose(c1, c2) and h1 == h2 and l1 == l2

    def test_adjust_contrast_grey(self, ref_utils):
        from ocrfa_tpu.preproc.host import adjust_contrast_grey

        rng = np.random.default_rng(1)
        for _ in range(20):
            # low-contrast image to exercise the stretch branch
            img = rng.integers(100, 140, (32, 48)).astype(np.uint8)
            np.testing.assert_array_equal(
                adjust_contrast_grey(img, 0.4), ref_utils.adjust_contrast_grey(img, 0.4)
            )
        # high-contrast passthrough
        img = rng.integers(0, 255, (32, 48), dtype=np.uint8)
        np.testing.assert_array_equal(
            adjust_contrast_grey(img, 0.1), ref_utils.adjust_contrast_grey(img, 0.1)
        )

    def test_normalize_roundtrip(self, ref_utils):
        from ocrfa_tpu.preproc.host import denormalize_mean_variance, normalize_mean_variance

        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ours = normalize_mean_variance(img)
        ref = ref_utils.normalize_mean_variance(img)
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        back = denormalize_mean_variance(ours)
        np.testing.assert_allclose(back, img, atol=1)
