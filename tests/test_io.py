"""IO input-normalisation edge cases (reformat_input parity surface)."""

import io as _io

import numpy as np
import pytest
from PIL import Image

from ocrfa_tpu.io import (
    calculate_md5,
    reformat_input,
    reformat_input_batched,
    rgb2grey,
    set_result_with_confidence,
)


class TestReformatInput:
    def test_grey_2d(self):
        grey = np.random.default_rng(0).integers(0, 255, (10, 12), dtype=np.uint8)
        img, out_grey = reformat_input(grey)
        assert img.shape == (10, 12, 3)
        np.testing.assert_array_equal(out_grey, grey)

    def test_grey_3d_single_channel(self):
        grey = np.random.default_rng(1).integers(0, 255, (10, 12, 1), dtype=np.uint8)
        img, out_grey = reformat_input(grey)
        assert img.shape == (10, 12, 3)
        assert out_grey.shape == (10, 12)

    def test_rgb(self):
        rgb = np.random.default_rng(2).integers(0, 255, (8, 9, 3), dtype=np.uint8)
        img, grey = reformat_input(rgb)
        np.testing.assert_array_equal(img, rgb)
        assert grey.shape == (8, 9)

    def test_rgba_drops_alpha(self):
        rgba = np.random.default_rng(3).integers(0, 255, (8, 9, 4), dtype=np.uint8)
        img, grey = reformat_input(rgba)
        assert img.shape == (8, 9, 3)

    def test_bytes(self):
        rgb = np.random.default_rng(4).integers(0, 255, (16, 16, 3), dtype=np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        img, grey = reformat_input(buf.getvalue())
        np.testing.assert_array_equal(img, rgb)  # png is lossless

    def test_pil(self):
        rgb = np.random.default_rng(5).integers(0, 255, (8, 8, 3), dtype=np.uint8)
        img, grey = reformat_input(Image.fromarray(rgb))
        np.testing.assert_array_equal(img, rgb)

    def test_path(self, tmp_path):
        rgb = np.random.default_rng(6).integers(0, 255, (8, 8, 3), dtype=np.uint8)
        p = str(tmp_path / "x.png")
        Image.fromarray(rgb).save(p)
        img, grey = reformat_input(p)
        np.testing.assert_array_equal(img, rgb)

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            reformat_input(12345)
        with pytest.raises(ValueError):
            reformat_input(np.zeros((4, 4, 7), dtype=np.uint8))

    def test_grey_weights_bt601(self):
        px = np.array([[[100, 150, 200]]], dtype=np.uint8)
        expected = round(0.299 * 100 + 0.587 * 150 + 0.114 * 200)
        assert rgb2grey(px)[0, 0] == expected


class TestBatched:
    def test_list_with_resize(self):
        rng = np.random.default_rng(7)
        imgs = [rng.integers(0, 255, (10 + i, 20, 3), dtype=np.uint8) for i in range(3)]
        img, grey = reformat_input_batched(imgs, n_width=16, n_height=12)
        assert img.shape == (3, 12, 16, 3)
        assert grey.shape == (3, 12, 16)

    def test_ragged_without_resize_raises(self):
        rng = np.random.default_rng(8)
        imgs = [rng.integers(0, 255, (10 + i, 20, 3), dtype=np.uint8) for i in range(2)]
        with pytest.raises(ValueError):
            reformat_input_batched(imgs)

    def test_4d_array(self):
        batch = np.zeros((2, 8, 8, 3), dtype=np.uint8)
        img, grey = reformat_input_batched(batch)
        assert img.shape == (2, 8, 8, 3)


class TestHelpers:
    def test_md5(self, tmp_path):
        p = tmp_path / "f.bin"
        p.write_bytes(b"hello")
        assert calculate_md5(str(p)) == "5d41402abc4b2a76b9719d911017c592"

    def test_set_result_with_confidence(self):
        results = [
            [("b1", "t1", 0.3), ("b2", "t2", 0.9)],
            [("b1", "t1r", 0.8), ("b2", "t2r", 0.1)],
        ]
        best = set_result_with_confidence(results)
        assert best == [("b1", "t1r", 0.8), ("b2", "t2", 0.9)]
