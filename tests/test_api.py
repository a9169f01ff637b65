"""Integration tests: the full OCR facade (detect -> group -> recognize)."""

import numpy as np
import pytest

from ocrfa_tpu.api import OCR
from ocrfa_tpu.decode import CTCLabelConverter
from ocrfa_tpu.models.crnn import init_crnn_gen1
from ocrfa_tpu.pipeline import Recognizer
from ocrfa_tpu.registry import RECOGNITION_MODELS


@pytest.fixture(scope="module")
def ocr(tmp_path_factory):
    import jax

    from helpers import OracleCraftDetector

    storage = str(tmp_path_factory.mktemp("models"))
    reader = OCR(
        gpu=False, detector=False, recognizer=False,
        model_storage_directory=storage, user_network_directory=storage,
        verbose=False,
    )
    # recognizer is random-weight (no network access in CI); the detector
    # is an oracle scoring the dark page regions — a random CRAFT finds
    # ZERO boxes, which would turn every readtext test into a no-op
    reader.detect_network = "craft"
    reader.detector = OracleCraftDetector()
    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    converter = CTCLabelConverter(chars)
    params = init_crnn_gen1(jax.random.PRNGKey(1), num_class=converter.num_classes,
                            output_channel=64, hidden_size=64)
    reader.recognizer = Recognizer(params, converter)
    reader.converter = converter
    return reader


def synthetic_page(seed=0, h=96, w=128):
    rng = np.random.default_rng(seed)
    page = np.full((h, w, 3), 235, dtype=np.uint8)
    page[20:40, 10:110] = rng.integers(0, 90, (20, 100, 3))
    page[60:80, 30:100] = rng.integers(0, 90, (20, 70, 3))
    return page


class TestReadtext:
    def test_standard_output(self, ocr):
        result = ocr.readtext(synthetic_page(), canvas_size=128)
        assert len(result) == 2  # both dark strips detected and recognized
        for box, text, conf in result:
            assert len(box) == 4 and len(box[0]) == 2
            assert isinstance(text, str)
            assert 0.0 <= conf <= 1.0 or np.isclose(conf, 0.0)

    def test_detail_zero(self, ocr):
        result = ocr.readtext(synthetic_page(), canvas_size=128, detail=0)
        assert len(result) == 2
        assert all(isinstance(t, str) for t in result)

    def test_dict_output(self, ocr):
        result = ocr.readtext(synthetic_page(), canvas_size=128, output_format="dict")
        for item in result:
            assert set(item) == {"boxes", "text", "confident"}

    def test_json_output(self, ocr):
        import json

        result = ocr.readtext(synthetic_page(), canvas_size=128, output_format="json")
        for item in result:
            parsed = json.loads(item)
            assert "boxes" in parsed and "text" in parsed

    def test_paragraph(self, ocr):
        result = ocr.readtext(synthetic_page(), canvas_size=128, paragraph=True)
        for box, text in result:
            assert isinstance(text, str)

    def test_allowlist(self, ocr):
        result = ocr.readtext(synthetic_page(), canvas_size=128, allowlist="ابت")
        for _, text, _ in result:
            assert set(text) <= set("ابت")

    def test_recognize_whole_image(self, ocr):
        grey = np.asarray(synthetic_page())[:, :, 0]
        result = ocr.recognize(grey, reformat=False)
        assert len(result) == 1

    def test_readtext_batched(self, ocr):
        pages = [synthetic_page(1), synthetic_page(2)]
        results = ocr.readtext_batched(pages, n_width=128, n_height=96, canvas_size=128)
        assert len(results) == 2
        assert all(len(page_results) >= 1 for page_results in results)

    def test_transform_ua_shape(self, ocr):
        h_list, f_list = ocr.transform_ua(synthetic_page(), canvas_size=128)
        assert isinstance(h_list, list) and isinstance(f_list, list)
        assert len(h_list) == 1
        assert len(h_list[0]) == 2  # oracle detector: one box per strip

    def test_repr(self, ocr):
        assert "OCR" in repr(ocr)

    def test_batch_size_gt1_path(self, ocr):
        result = ocr.readtext(synthetic_page(), canvas_size=128, batch_size=4)
        assert isinstance(result, list)


@pytest.mark.slow
class TestReadtextDBNet:
    def test_dbnet_path(self, ocr):
        """Full readtext through the DBNet detector branch."""
        from ocrfa_tpu.detector_db import DBNetDetector

        old_net, old_det = ocr.detect_network, ocr.detector
        try:
            ocr.detect_network = "dbnet18"
            ocr.detector = DBNetDetector.random_init(0)
            result = ocr.readtext(synthetic_page(), canvas_size=96)
            assert isinstance(result, list)
            for box, text, conf in result:
                assert len(box) == 4 and isinstance(text, str)
        finally:
            ocr.detect_network, ocr.detector = old_net, old_det


class TestRotationTTA:
    def test_rotation_info(self, ocr):
        result = ocr.readtext(
            synthetic_page(), canvas_size=128, batch_size=2,
            rotation_info=[90, 180, 270],
        )
        assert isinstance(result, list)
        for box, text, conf in result:
            assert isinstance(text, str)


class TestReadtextLang:
    def test_language_tagging(self, ocr):
        tagged = ocr.readtextlang(synthetic_page(), canvas_size=128)
        for item in tagged:
            assert item[-1] in ("en", "fa")


class TestSignatureParity:
    @pytest.mark.parametrize("method", ["readtext", "recognize", "transform_ua",
                                        "readtext_batched"])
    def test_kwargs_match_reference(self, ref_utils, method):
        """Parameter names, order, and defaults must match the reference's
        30-kwarg surface (ocr.py:299-776)."""
        import importlib
        import inspect

        ref_ocr = importlib.import_module("ocrfa.ocr")
        ours = inspect.signature(getattr(OCR, method))
        ref = inspect.signature(getattr(ref_ocr.OCR, method))
        our_params = list(ours.parameters.values())
        ref_params = list(ref.parameters.values())
        assert [p.name for p in our_params] == [p.name for p in ref_params]
        for op, rp in zip(our_params, ref_params):
            assert op.default == rp.default, f"{method}.{op.name}"

    def test_init_kwargs_match_reference(self, ref_utils):
        import importlib
        import inspect

        ref_ocr = importlib.import_module("ocrfa.ocr")
        ours = inspect.signature(OCR.__init__)
        ref = inspect.signature(ref_ocr.OCR.__init__)
        assert list(ours.parameters) == list(ref.parameters)
        for name in ours.parameters:
            assert ours.parameters[name].default == ref.parameters[name].default, name


class TestDcnImplKnob:
    """The beyond-parity dbnet_dcn_impl attribute threads into the
    detector factory (the ctor kwarg surface must stay reference-identical,
    so the TPU fast path hangs off an attribute + setDetector rebuild)."""

    def test_attribute_threads_to_build_detector(self, ocr, monkeypatch):
        import ocrfa_tpu.api as api

        captured = {}

        def fake_build(detect_network, model_path, **kw):
            captured.update(kw, network=detect_network)
            return object()

        monkeypatch.setattr(api, "build_detector", fake_build)
        assert ocr.dbnet_dcn_impl == "gather"
        prev_net = ocr.detect_network
        ocr.detect_network = "dbnet18"
        ocr.dbnet_dcn_impl = "bounded1"
        try:
            ocr.initDetector("unused.pth")
        finally:
            ocr.dbnet_dcn_impl = "gather"
            ocr.detect_network = prev_net
        assert captured["network"] == "dbnet18"
        assert captured["dbnet_dcn_impl"] == "bounded1"
