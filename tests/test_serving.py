"""Serving pipeline: full-page stream through device-resident staging."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline():
    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.serving import ServingPipeline

    conv = CTCLabelConverter("ابتثج")
    rec = Recognizer(
        init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                       output_channel=64, hidden_size=64),
        conv,
    )
    det = init_craft(jax.random.PRNGKey(1))
    return ServingPipeline(det, rec, canvas_size=128)


def synthetic_page(seed, h=96, w=128):
    rng = np.random.default_rng(seed)
    page = np.full((h, w), 235, dtype=np.uint8)
    page[20:40, 10:110] = rng.integers(0, 90, (20, 100))
    page[60:80, 30:100] = rng.integers(0, 90, (20, 70))
    return page


class TestServingPipeline:
    def test_stream(self, pipeline):
        pages = [synthetic_page(i) for i in range(3)]
        results = list(pipeline.process(pages, depth=2))
        assert len(results) == 3
        for page_result in results:
            for quad, text, conf in page_result:
                assert len(quad) == 4
                assert isinstance(text, str)

    def test_empty_page(self, pipeline):
        # uniform page: detector output below thresholds -> no boxes
        page = np.full((96, 128), 255, dtype=np.uint8)
        result = pipeline.finish_page(pipeline.submit_page(page))
        assert isinstance(result, list)

    def test_wave_matches_per_page(self, pipeline):
        # the corpus wave path (cross-page batched recognition from the
        # resident page stack) must produce the per-page path's results
        pages = [synthetic_page(i) for i in range(5)]
        per_page = list(pipeline.process(iter(pages), depth=2))
        waves = list(pipeline.process_waves(iter(pages), wave=2, depth=1))
        assert len(waves) == len(per_page)
        for a, b in zip(waves, per_page):
            assert len(a) == len(b)
            for (qa, ta, ca), (qb, tb, cb) in zip(a, b):
                assert qa == qb
                assert ta == tb
                assert abs(ca - cb) < 5e-3  # f32 vs page-stack gather order

    def test_wave_overlap_matches_serial(self, pipeline):
        pages = [synthetic_page(i + 20) for i in range(5)]
        ser = list(pipeline.process_waves(iter(pages), wave=2, depth=1,
                                          overlap=False))
        par = list(pipeline.process_waves(iter(pages), wave=2, depth=1,
                                          overlap=True))
        assert [[t for _, t, _ in p] for p in ser] == \
               [[t for _, t, _ in p] for p in par]

    def test_wave_with_empty_pages(self, pipeline):
        pages = [np.full((96, 128), 255, dtype=np.uint8),
                 synthetic_page(1),
                 np.full((96, 128), 255, dtype=np.uint8)]
        out = list(pipeline.process_waves(iter(pages), wave=4, depth=1))
        assert len(out) == 3
        assert out[0] == [] and out[2] == []

    def test_wave_stage_timers_populate(self, pipeline):
        pipeline.stage_seconds.clear()
        list(pipeline.process_waves([synthetic_page(7)], wave=1, depth=1))
        for stage in ("upload_pack", "detect_dispatch", "seed_fetch",
                      "host_geometry", "rec_dispatch", "rec_collect"):
            assert stage in pipeline.stage_seconds


class TestServingMesh:
    def test_sharded_page_batch(self):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.craft import init_craft
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.parallel.mesh import create_mesh
        from ocrfa_tpu.pipeline import Recognizer
        from ocrfa_tpu.serving import ServingPipeline

        mesh = create_mesh()
        conv = CTCLabelConverter("ابت")
        rec = Recognizer(
            init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                           output_channel=64, hidden_size=64),
            conv, mesh=mesh,
        )
        pipe = ServingPipeline(init_craft(jax.random.PRNGKey(1)), rec,
                               canvas_size=128, mesh=mesh)
        pages = [synthetic_page(i) for i in range(8)]
        handles = pipe.submit_page_batch(pages)
        assert len(handles) == 8
        results = [pipe.finish_page(h) for h in handles]
        assert len(results) == 8


class TestDetectionSeeding:
    def test_packbits_roundtrip(self):
        import jax.numpy as jnp

        from ocrfa_tpu.serving import _packbits

        rng = np.random.default_rng(0)
        mask = rng.random((3, 16, 64)) > 0.5
        packed = np.asarray(_packbits(jnp.asarray(mask)))
        np.testing.assert_array_equal(
            np.unpackbits(packed, axis=-1).astype(bool), mask
        )

    def test_seeded_boxes_match_f32_path(self):
        """The three bit-packed device masks reproduce the host component
        loop bit-exactly (the comparisons happen in f32 on device)."""
        import jax.numpy as jnp

        from ocrfa_tpu.geometry.craft_post import (
            get_det_boxes,
            get_det_boxes_from_masks,
        )
        from ocrfa_tpu.serving import _seed_detection

        rng = np.random.default_rng(1)
        text = rng.random((64, 96), dtype=np.float32)
        link = rng.random((64, 96), dtype=np.float32)

        ref_boxes, _, _ = get_det_boxes(text, link, 0.7, 0.4, 0.4)

        comb_p, link_p, over_p = np.asarray(_seed_detection(
            jnp.stack([jnp.asarray(text), jnp.asarray(link)], axis=-1),
            0.7, 0.4, 0.4))
        comb = np.unpackbits(comb_p, axis=-1).astype(bool)
        link_only = np.unpackbits(link_p, axis=-1).astype(bool)
        text_over = np.unpackbits(over_p, axis=-1).astype(bool)
        got_boxes, _, _ = get_det_boxes_from_masks(comb, link_only, text_over)

        assert len(got_boxes) == len(ref_boxes)
        for a, b in zip(got_boxes, ref_boxes):
            np.testing.assert_allclose(a, b)


class TestPageWire:
    def test_pack_unpack_u8_is_identity(self):
        from ocrfa_tpu.preproc.device import pack_page, unpack_page

        page = np.random.default_rng(0).integers(
            0, 256, (32, 41), dtype=np.uint8)
        out = np.asarray(unpack_page(pack_page(page, "u8"), "u8", 41))
        np.testing.assert_array_equal(out, page)

    @pytest.mark.parametrize("wire,max_err", [("u4", 15), ("u2", 63)])
    def test_pack_unpack_quantization_bound(self, wire, max_err):
        from ocrfa_tpu.preproc.device import pack_page, unpack_page

        page = np.random.default_rng(1).integers(
            0, 256, (16, 37), dtype=np.uint8)  # ragged width
        out = np.asarray(unpack_page(
            pack_page(page, wire), wire, page.shape[1]))
        assert out.shape == page.shape
        assert np.abs(out.astype(int) - page.astype(int)).max() <= max_err
        # quantization is floor + rescale, so quantized values round-trip
        out2 = np.asarray(unpack_page(pack_page(out, wire), wire, 37))
        np.testing.assert_array_equal(out2, out)

    def test_unpack_batched(self):
        from ocrfa_tpu.preproc.device import pack_page, unpack_page

        pages = np.random.default_rng(2).integers(
            0, 256, (3, 8, 24), dtype=np.uint8)
        packed = np.stack([pack_page(p, "u4") for p in pages])
        out = np.asarray(unpack_page(packed, "u4", 24))
        ref = np.stack(
            [np.asarray(unpack_page(pack_page(p, "u4"), "u4", 24))
             for p in pages])
        np.testing.assert_array_equal(out, ref)

    def test_serving_pipeline_u4_page_wire(self, pipeline):
        """u4 page wire produces the same detection count on clean pages
        (16 grey levels are plenty for the heatmap thresholds)."""
        from ocrfa_tpu.serving import ServingPipeline

        pipe4 = ServingPipeline(
            pipeline.det_params, pipeline.recognizer, canvas_size=128,
            page_wire="u4")
        page = synthetic_page(7)
        r8 = pipeline.finish_page(pipeline.submit_page(page))
        r4 = pipe4.finish_page(pipe4.submit_page(page))
        assert len(r4) == len(r8)


@pytest.mark.slow
class TestMultichipServeScript:
    def test_runs_on_virtual_mesh(self, tmp_path):
        import json
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
        import serve_multichip

        out = tmp_path / "m.json"
        rc = serve_multichip.main([
            "--pages", "8", "--page-size", "128", "--batch", "8",
            "--out", str(out)])
        assert rc == 0
        m = json.loads(out.read_text())
        assert m["pages"] == 8 and m["devices"] == 8
        assert m["pages_per_sec"] > 0


class TestDBNetServing:
    @pytest.fixture(scope="class")
    def pipe(self):
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.models.dbnet import init_dbnet
        from ocrfa_tpu.pipeline import Recognizer
        from ocrfa_tpu.serving import ServingPipeline

        conv = CTCLabelConverter("ابتث")
        rec = Recognizer(
            init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                           output_channel=64, hidden_size=64), conv)
        params = init_dbnet(jax.random.PRNGKey(1), backbone="resnet18")
        return ServingPipeline(params, rec, canvas_size=96,
                               detector_family="dbnet", db_min_size=64,
                               db_threshold=0.0, db_bbox_min_score=0.0)

    def test_end_to_end_page(self, pipe):
        page = np.full((80, 96), 240, dtype=np.uint8)
        page[30:44, 10:80] = 15
        results = pipe.finish_page(pipe.submit_page(page))
        assert isinstance(results, list)
        for quad, text, conf in results:
            assert len(quad) == 4 and isinstance(text, str)

    def test_boxes_within_page(self, pipe):
        page = np.full((80, 96), 220, dtype=np.uint8)
        boxes = pipe.detect_boxes(pipe.submit_page(page))
        for b in boxes:
            arr = np.asarray(b, np.float64)
            assert arr.shape == (4, 2)
            assert (arr[:, 0] >= 0).all() and (arr[:, 0] <= 96).all()
            assert (arr[:, 1] >= 0).all() and (arr[:, 1] <= 80).all()

    def test_seed_mask_matches_quantized_hmap(self, pipe):
        page = np.random.default_rng(3).integers(
            0, 255, (64, 64), dtype=np.uint8)
        _page_dev, payload, _ = pipe.submit_page(page)
        payload = np.asarray(payload)
        cw = payload.shape[-1] * 8 // 9  # packed W/8 cols + u8 W cols
        mask = np.unpackbits(payload[:, :cw // 8], axis=-1).astype(bool)
        hmap = payload[:, cw // 8:].astype(np.float32) / 255.0
        # mask came from the f32 prob; outside the quantization step of the
        # threshold the u8 map must agree with it
        margin = np.abs(hmap - pipe.db_threshold) > 1.0 / 255.0
        np.testing.assert_array_equal(
            mask[margin], (hmap > pipe.db_threshold)[margin])

    def test_batch_matches_single(self, pipe):
        pages = [np.random.default_rng(i).integers(0, 255, (64, 64), np.uint8)
                 for i in range(2)]
        singles = [pipe.detect_boxes(pipe.submit_page(p)) for p in pages]
        batched = [pipe.detect_boxes(h)
                   for h in pipe.submit_page_batch(pages)]
        for s, b in zip(singles, batched):
            assert len(s) == len(b)
            for sa, ba in zip(s, b):
                np.testing.assert_allclose(np.asarray(sa), np.asarray(ba))

    def test_rejects_quantized_combo(self):
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.models.dbnet import init_dbnet
        from ocrfa_tpu.pipeline import Recognizer
        from ocrfa_tpu.serving import ServingPipeline

        conv = CTCLabelConverter("اب")
        rec = Recognizer(
            init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                           output_channel=64, hidden_size=64), conv)
        params = init_dbnet(jax.random.PRNGKey(1), backbone="resnet18")
        with pytest.raises(ValueError):
            ServingPipeline(params, rec, detector_family="dbnet",
                            detector_quantized="static")
        with pytest.raises(ValueError):
            ServingPipeline(params, rec, detector_family="nope")
