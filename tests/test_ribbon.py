"""Ribbon wire format: packing, device unpack, fused recognition path."""

import numpy as np
import pytest

import jax

from ocrfa_tpu.preproc.ribbon import pack_crops, ribbon_to_batch, stride_bucket


class TestStrideBucket:
    def test_covers_and_clamps(self):
        assert stride_bucket(1) == 64
        assert stride_bucket(64) == 64
        assert stride_bucket(65) == 96
        assert stride_bucket(99999) == 2560


class TestPackCrops:
    def test_roundtrip_bytes(self):
        rng = np.random.default_rng(0)
        crops = [rng.integers(0, 255, (h, w), dtype=np.uint8)
                 for h, w in [(24, 100), (37, 310), (64, 64)]]
        rows, meta = pack_crops(crops)
        assert rows.shape[1] == stride_bucket(310)
        for crop, (off, h, w) in zip(crops, meta):
            np.testing.assert_array_equal(rows[off:off + h, :w], crop)

    def test_row_count_bucketed(self):
        crops = [np.zeros((30, 50), np.uint8)] * 5
        rows, meta = pack_crops(crops)
        assert rows.shape[0] % 512 == 0

    def test_padded_meta_aliases_first_crop(self):
        crops = [np.zeros((10, 10), np.uint8)] * 3
        rows, meta = pack_crops(crops)
        assert meta.shape[0] == 4  # batch bucket
        np.testing.assert_array_equal(meta[3], meta[0])

    def test_width_over_stride_rejected(self):
        with pytest.raises(ValueError):
            pack_crops([np.zeros((10, 100), np.uint8)], stride=64)


class TestRibbonToBatch:
    def test_matches_page_crop_kernel(self):
        """Ribbon unpack == the page-based device crop kernel on the same
        pixels (identical bilinear formula, different addressing)."""
        from ocrfa_tpu.preproc.device import crop_resize_normalize

        rng = np.random.default_rng(1)
        page = rng.integers(0, 255, (200, 400), dtype=np.uint8)
        boxes = np.array([
            [10, 210, 20, 52],
            [0, 400, 60, 92],
            [100, 180, 100, 140],
            [5, 45, 150, 190],
        ], dtype=np.int32)

        ref, ref_w = crop_resize_normalize(page, boxes, out_h=64, out_w=256)
        crops = [page[y0:y1, x0:x1] for x0, x1, y0, y1 in boxes]
        flat, meta = pack_crops(crops)
        got, got_w = ribbon_to_batch(flat, meta, out_h=64, out_w=256)

        np.testing.assert_array_equal(np.asarray(got_w), np.asarray(ref_w))
        np.testing.assert_allclose(np.asarray(got)[: len(boxes)],
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_replicate_edge_padding(self):
        crop = np.full((32, 32), 200, np.uint8)
        crop[:, -1] = 10  # distinctive last column
        flat, meta = pack_crops([crop])
        out, new_w = ribbon_to_batch(flat, meta, out_h=64, out_w=256)
        out = np.asarray(out)[0, :, :, 0]
        assert int(new_w[0]) == 64
        # beyond the valid width every column replicates the crop's edge
        edge = np.broadcast_to(out[:, 100:101], out[:, 101:].shape)
        np.testing.assert_allclose(out[:, 101:], edge, atol=1e-6)


class TestFusedRibbonRecognition:
    def _recognizer(self, mesh=None):
        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer

        conv = CTCLabelConverter("ابتث")
        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                                output_channel=64, hidden_size=64)
        return Recognizer(params, conv, mesh=mesh), conv

    def test_matches_dense_path_on_presized_crops(self):
        """Crops already at (64, bucket) pass through the ribbon resize as
        identity, so results must equal the dense uint8 path exactly."""
        from ocrfa_tpu.decode.device import keep_mask_for

        rec, conv = self._recognizer()
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        rng = np.random.default_rng(2)
        crops = [rng.integers(0, 255, (64, 64), dtype=np.uint8) for _ in range(5)]

        dense = rec.predict(
            np.stack(crops)[..., None], keep
        )
        ribbon = rec.collect(rec.predict_ribbon_async(crops, keep, out_w=64))
        assert [r[0] for r in dense] == [r[0] for r in ribbon]
        np.testing.assert_allclose([r[1] for r in dense], [r[1] for r in ribbon],
                                   rtol=1e-4)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
    def test_mesh_sharded_ribbon_matches_single(self):
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.parallel.mesh import create_mesh

        rec, conv = self._recognizer()
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        rng = np.random.default_rng(3)
        crops = [rng.integers(0, 255, (32, rng.integers(20, 60)), dtype=np.uint8)
                 for _ in range(11)]

        single = rec.collect(rec.predict_ribbon_async(crops, keep, out_w=128))
        rec_mesh, _ = self._recognizer(mesh=create_mesh())
        sharded = rec_mesh.collect(
            rec_mesh.predict_ribbon_async(crops, keep, out_w=128)
        )
        assert len(sharded) == 11
        assert [r[0] for r in single] == [r[0] for r in sharded]


class TestU4Wire:
    def test_u4_roundtrip_quantization(self):
        rng = np.random.default_rng(4)
        crop = rng.integers(0, 255, (32, 40), dtype=np.uint8)
        rows8, meta8 = pack_crops([crop], wire="u8")
        rows4, meta4 = pack_crops([crop], wire="u4")
        assert rows4.shape[1] == rows8.shape[1] // 2
        np.testing.assert_array_equal(np.asarray(meta4), np.asarray(meta8))

        out8, w8 = ribbon_to_batch(rows8, meta8, out_w=128, wire="u8")
        out4, w4 = ribbon_to_batch(rows4, meta4, out_w=128, wire="u4")
        assert int(w4[0]) == int(w8[0])
        # 4-bit pixels: max reconstruction error 15/255 pre-normalisation
        err = np.abs(np.asarray(out4) - np.asarray(out8)).max()
        assert err <= 2 * 15 / 255 + 1e-6, err

    def test_u4_exact_for_4bit_content(self):
        """Content that is already 16-level survives the u4 wire exactly."""
        rng = np.random.default_rng(5)
        crop = (rng.integers(0, 16, (32, 64), dtype=np.uint8) * 17).astype(np.uint8)
        out8, _ = ribbon_to_batch(*pack_crops([crop], wire="u8"), out_w=128, wire="u8")
        out4, _ = ribbon_to_batch(*pack_crops([crop], wire="u4"), out_w=128, wire="u4")
        np.testing.assert_allclose(np.asarray(out4), np.asarray(out8), atol=1e-6)

    def test_fused_u4_recognition_runs(self):
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer

        conv = CTCLabelConverter("ابتث")
        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                                output_channel=64, hidden_size=64)
        rec = Recognizer(params, conv)
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        rng = np.random.default_rng(6)
        crops = [rng.integers(0, 255, (32, 48), dtype=np.uint8) for _ in range(3)]
        out = rec.collect(rec.predict_ribbon_async(crops, keep, out_w=128, wire="u4"))
        assert len(out) == 3 and all(isinstance(t, str) for t, _ in out)


class TestSubByteWires:
    def _roundtrip(self, wire, px_per_byte, max_err):
        rng = np.random.default_rng(8)
        crop = rng.integers(0, 255, (32, 40), dtype=np.uint8)
        rows8, meta8 = pack_crops([crop], wire="u8")
        rowsN, metaN = pack_crops([crop], wire=wire)
        assert rowsN.shape[1] * px_per_byte >= rows8.shape[1]
        np.testing.assert_array_equal(np.asarray(metaN), np.asarray(meta8))
        out8, _ = ribbon_to_batch(rows8, meta8, out_w=128, wire="u8")
        outN, _ = ribbon_to_batch(rowsN, metaN, out_w=128, wire=wire)
        err = np.abs(np.asarray(outN) - np.asarray(out8)).max()
        assert err <= max_err + 1e-6, err

    def test_u2_roundtrip(self):
        # 2-bit pixels: max quantization error 63/255 pre-normalisation
        self._roundtrip("u2", 4, 2 * 63 / 255)

    def test_u1_roundtrip(self):
        self._roundtrip("u1", 8, 2.0)  # binary: only gross shape survives

    def test_u1_exact_for_binary_content(self):
        rng = np.random.default_rng(9)
        crop = (rng.random((32, 64)) > 0.5).astype(np.uint8) * 255
        out8, _ = ribbon_to_batch(*pack_crops([crop], wire="u8"), out_w=128, wire="u8")
        out1, _ = ribbon_to_batch(*pack_crops([crop], wire="u1"), out_w=128, wire="u1")
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out8), atol=1e-6)

    def test_u1_threshold_calibration(self):
        """u1_threshold moves the binarisation cut: a 150-grey pixel is
        white at the default 128 cut, black at a 200 cut."""
        crop = np.full((8, 16), 150, np.uint8)
        crop[:, 8:] = 250
        lo, _ = pack_crops([crop], wire="u1")  # default: 150 >= 128 -> 1
        hi, _m = pack_crops([crop], wire="u1", u1_threshold=200)
        out_lo, _ = ribbon_to_batch(lo, _m, out_w=64, wire="u1")
        out_hi, _ = ribbon_to_batch(hi, _m, out_w=64, wire="u1")
        a = np.asarray(out_lo)[0, 0, 0, 0]   # left half, default cut
        b = np.asarray(out_hi)[0, 0, 0, 0]   # left half, 200 cut
        assert abs(a - 1.0) < 1e-5    # normalised white
        assert abs(b + 1.0) < 1e-5    # normalised black
        # right half (250) is white under both cuts
        assert abs(np.asarray(out_hi)[0, 0, 40, 0] - 1.0) < 1e-5

    def test_u2_exact_for_4level_content(self):
        rng = np.random.default_rng(10)
        crop = (rng.integers(0, 4, (32, 64), dtype=np.uint8) * 85).astype(np.uint8)
        out8, _ = ribbon_to_batch(*pack_crops([crop], wire="u8"), out_w=128, wire="u8")
        out2, _ = ribbon_to_batch(*pack_crops([crop], wire="u2"), out_w=128, wire="u2")
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out8), atol=1e-6)


class TestChunkByWidth:
    """Width-sorted full-chunk corpus batching (bench/serving pump)."""

    def test_full_chunks_cover_all_indices(self):
        from ocrfa_tpu.preproc.buckets import (SERVING_WIDTH_BUCKETS,
                                               chunk_by_width)

        rng = np.random.default_rng(0)
        widths = rng.integers(80, 520, 1000).tolist()
        chunks = chunk_by_width(widths, 256, SERVING_WIDTH_BUCKETS)
        # all but the last chunk are FULL
        assert [len(ix) for ix, _ in chunks[:-1]] == [256, 256, 256]
        assert len(chunks[-1][0]) == 1000 - 3 * 256
        seen = sorted(i for ix, _ in chunks for i in ix)
        assert seen == list(range(1000))

    def test_bucket_covers_widest_line_and_is_monotone(self):
        from ocrfa_tpu.preproc.buckets import (SERVING_WIDTH_BUCKETS,
                                               chunk_by_width)

        rng = np.random.default_rng(1)
        widths = rng.integers(80, 2000, 500).tolist()
        chunks = chunk_by_width(widths, 64, SERVING_WIDTH_BUCKETS)
        prev = 0
        for idxs, out_w in chunks:
            assert max(widths[i] for i in idxs) <= out_w
            assert out_w >= prev  # sorted corpus -> non-decreasing buckets
            prev = out_w
