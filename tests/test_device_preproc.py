"""On-device crop-resize-normalise vs host reference behavior."""

import numpy as np
import pytest

from ocrfa_tpu.preproc.device import DevicePagePipeline, crop_resize_normalize


class TestCropResize:
    def test_identity_height_crop(self):
        # crop already out_h tall and out_w wide -> values pass through
        rng = np.random.default_rng(0)
        page = rng.integers(0, 255, (128, 256), dtype=np.uint8)
        boxes = np.array([[10, 10 + 128, 20, 20 + 64]], dtype=np.int32)
        out, new_w = crop_resize_normalize(page, boxes, out_h=64, out_w=128)
        out = np.asarray(out)
        assert out.shape == (1, 64, 128, 1)
        assert int(new_w[0]) == 128
        expected = (page[20:84, 10:138].astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(out[0, :, :, 0], expected, atol=1e-5)

    def test_replicate_pad_region(self):
        rng = np.random.default_rng(1)
        page = rng.integers(0, 255, (100, 200), dtype=np.uint8)
        # 64x64 crop -> new_w 64, padded out to 128
        boxes = np.array([[0, 64, 0, 64]], dtype=np.int32)
        out, new_w = crop_resize_normalize(page, boxes, out_h=64, out_w=128)
        out = np.asarray(out)[0, :, :, 0]
        assert int(new_w[0]) == 64
        # pad region replicates the last valid column
        np.testing.assert_allclose(out[:, 64:], out[:, 63:64].repeat(64, axis=1))

    def test_downscale_mean_preserved(self):
        page = np.full((100, 200), 128, dtype=np.uint8)
        boxes = np.array([[5, 163, 3, 82]], dtype=np.int32)
        out, _ = crop_resize_normalize(page, boxes, out_h=64, out_w=256)
        np.testing.assert_allclose(
            np.asarray(out), (128 / 255.0 - 0.5) / 0.5, atol=1e-4
        )

    def test_batch_of_boxes(self):
        rng = np.random.default_rng(2)
        page = rng.integers(0, 255, (300, 400), dtype=np.uint8)
        boxes = np.array(
            [[0, 100, 0, 30], [50, 350, 40, 90], [10, 70, 100, 160]],
            dtype=np.int32,
        )
        out, new_w = crop_resize_normalize(page, boxes, out_h=64, out_w=512)
        assert out.shape == (3, 64, 512, 1)
        assert np.asarray(new_w).tolist() == [
            int(np.ceil(64 * 100 / 30)), int(np.ceil(64 * 300 / 50)),
            int(np.ceil(64 * 60 / 60)),
        ]


class TestDevicePagePipeline:
    def test_recognize_boxes(self):
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer

        chars = "ابتثج"
        conv = CTCLabelConverter(chars)
        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                                output_channel=64, hidden_size=64)
        rec = Recognizer(params, conv)
        pipe = DevicePagePipeline(rec)

        rng = np.random.default_rng(3)
        page = rng.integers(0, 255, (200, 300), dtype=np.uint8)
        page_dev = pipe.put_page(page)
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        boxes = [[10, 200, 20, 60], [5, 290, 80, 120], [0, 150, 140, 180]]
        out = pipe.recognize_boxes(page_dev, boxes, keep)
        assert len(out) == 3
        for text, conf in out:
            assert isinstance(text, str)

    def test_empty(self):
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer

        conv = CTCLabelConverter("اب")
        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                                output_channel=64, hidden_size=64)
        pipe = DevicePagePipeline(Recognizer(params, conv))
        page_dev = pipe.put_page(np.zeros((50, 50), dtype=np.uint8))
        assert pipe.recognize_boxes(page_dev, [], np.ones(3, np.float32)) == []
