"""Full-chain golden: our ``OCR.readtext`` vs the REFERENCE ``Reader.readtext``.

Closes the detect -> group -> crop -> recognize chain as ONE comparison
(reference ``ocr.py:504-582``), not per-stage.  The reference ``Reader`` is
instantiated without ``__init__`` (no downloads) and driven with:

* the torch CRAFT / gen1-CRNN replicas (tests/torch_replicas.py) as its
  ``detector`` / ``recognizer`` — the same weights feed our pipeline
  through the production checkpoint converters, and
* cv2 shimmed onto the SAME primitives our production code uses (PIL
  resize, scipy CC + max-filter dilate, calipers min-rect, numpy
  homography), so every piece of chain logic — canvas prep, thresholds,
  component loop, grouping, crop warp, contrast retry, decode, RTL
  display, paragraph/merge — is compared end to end while the pixel
  primitives are held identical on both sides.
"""

import sys

import numpy as np
import pytest

pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# cv2 shim: reference calls -> our production primitives


_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8)


def _install_chain_shims():
    from PIL import Image

    # dbnet shims bring the base stubs plus pyclipper/shapely fakes the
    # reference DBNet module needs at import time (detectors.py imports it)
    from test_dbnet_golden import _install_dbnet_shims

    _install_dbnet_shims()
    cv2 = sys.modules["cv2"]

    # distinct sentinel for INTER_LINEAR: the reference passes
    # Image.Resampling.LANCZOS (IntEnum == 1) straight to cv2.resize in
    # compute_ratio_and_resize (utils.py:1369), so 1 must mean LANCZOS here
    # while resize_aspect_ratio's INTER_LINEAR maps to BILINEAR — matching
    # our production preproc/host.py resample choices exactly.
    cv2.INTER_LINEAR = 77
    cv2.INTER_NEAREST = 78
    cv2.MORPH_RECT = 0
    cv2.CC_STAT_LEFT, cv2.CC_STAT_TOP = 0, 1
    cv2.CC_STAT_WIDTH, cv2.CC_STAT_HEIGHT, cv2.CC_STAT_AREA = 2, 3, 4
    _RESAMPLE = {77: Image.BILINEAR, 78: Image.NEAREST, 1: Image.LANCZOS}

    def resize(img, size, interpolation=77):
        from ocrfa_tpu.preproc.host import _pil_resize

        return _pil_resize(np.asarray(img), tuple(size), _RESAMPLE[int(interpolation)])

    def threshold(src, thresh, maxval, type_):
        src = np.asarray(src)
        return thresh, ((src > thresh) * maxval).astype(src.dtype)

    def connectedComponentsWithStats(img, connectivity=4):
        from scipy.ndimage import find_objects
        from scipy.ndimage import label as cc_label

        assert connectivity == 4
        labels, n = cc_label(np.asarray(img) > 0, structure=_CROSS)
        stats = np.zeros((n + 1, 5), dtype=np.int32)
        cents = np.zeros((n + 1, 2), dtype=np.float64)
        for k, sl in enumerate(find_objects(labels), start=1):
            if sl is None:
                continue
            local = labels[sl] == k
            stats[k] = (sl[1].start, sl[0].start,
                        sl[1].stop - sl[1].start, sl[0].stop - sl[0].start,
                        int(local.sum()))
            ys, xs = np.nonzero(local)
            cents[k] = (xs.mean() + sl[1].start, ys.mean() + sl[0].start)
        return n + 1, labels, stats, cents

    def getStructuringElement(shape, ksize):
        return np.ones((ksize[1], ksize[0]), dtype=np.uint8)

    def dilate(img, kernel):
        from scipy.ndimage import maximum_filter

        return maximum_filter(np.asarray(img), size=kernel.shape)

    def minAreaRect(points):
        from ocrfa_tpu.geometry.minrect import min_area_rect

        corners, wh = min_area_rect(np.asarray(points, np.float64).reshape(-1, 2))
        return corners.astype(np.float32), wh

    def boxPoints(rect):
        return np.asarray(rect[0], dtype=np.float32)

    def getPerspectiveTransform(src, dst):
        from ocrfa_tpu.geometry.transform import perspective_transform

        return perspective_transform(src, dst)

    def warpPerspective(src, m, size, flags=None):
        from ocrfa_tpu.geometry.transform import warp_perspective

        interp = "nearest" if flags == cv2.INTER_NEAREST else "bilinear"
        return warp_perspective(src, m, size, interpolation=interp)

    cv2.COLOR_GRAY2BGR = 100
    cv2.COLOR_GRAY2RGB = 101
    cv2.COLOR_BGR2GRAY = 102
    cv2.COLOR_RGB2GRAY = 103
    cv2.COLOR_RGB2BGR = 104
    cv2.COLOR_BGR2RGB = 105

    def cvtColor(img, code):
        from ocrfa_tpu.io import rgb2grey

        img = np.asarray(img)
        if code in (cv2.COLOR_GRAY2BGR, cv2.COLOR_GRAY2RGB):
            return np.stack([img] * 3, axis=-1)
        if code in (cv2.COLOR_BGR2GRAY, cv2.COLOR_RGB2GRAY):
            return rgb2grey(img[..., ::-1] if code == cv2.COLOR_BGR2GRAY else img)
        if code in (cv2.COLOR_RGB2BGR, cv2.COLOR_BGR2RGB):
            return img[..., ::-1]
        raise ValueError(code)

    cv2.cvtColor = cvtColor
    cv2.resize = resize
    cv2.threshold = threshold
    cv2.connectedComponentsWithStats = connectedComponentsWithStats
    cv2.getStructuringElement = getStructuringElement
    cv2.dilate = dilate
    cv2.minAreaRect = minAreaRect
    cv2.boxPoints = boxPoints
    cv2.getPerspectiveTransform = getPerspectiveTransform
    cv2.warpPerspective = warpPerspective

    # reference ocr.py binds bidi get_display at import; route it to our
    # production UAX#9 implementation so RTL display logic is compared too
    from ocrfa_tpu.utils.bidi import get_display

    sys.modules["bidi.algorithm"].get_display = get_display


# ---------------------------------------------------------------------------
# paired pipelines over the same weights


CHARS = "0123456789ابپتثجچحخ"


def _build_reference_reader():
    import torch

    from tests.torch_replicas import CraftModel, Gen1Model

    _install_chain_shims()
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    import ocrfa.ocr as ref_ocr
    from ocrfa.detectors import get_textbox as ref_get_textbox
    from ocrfa.utils import CTCLabelConverter as RefConverter

    torch.manual_seed(7)
    detector = CraftModel().eval()
    recognizer = Gen1Model(
        input_channel=1, output_channel=64, hidden_size=64,
        num_class=len(CHARS) + 1,
    ).eval()

    reader = object.__new__(ref_ocr.OCR)
    reader.device = "cpu"
    reader.detector = detector
    reader.get_textbox = ref_get_textbox
    reader.recognizer = recognizer
    reader.converter = RefConverter(CHARS)
    reader.character = CHARS
    reader.lang_char = CHARS
    reader.model_lang = "arabic"
    return reader, detector, recognizer


def _build_our_reader(detector_t, recognizer_t, tmp_path):
    import jax  # noqa: F401  (backend init before converts)

    from ocrfa_tpu import checkpoints
    from ocrfa_tpu.api import OCR
    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.detector import CraftDetector
    from ocrfa_tpu.pipeline import Recognizer

    det_sd = {k: v.detach().numpy() for k, v in detector_t.state_dict().items()}
    rec_sd = {k: v.detach().numpy() for k, v in recognizer_t.state_dict().items()}

    storage = str(tmp_path)
    reader = OCR(
        gpu=False, detector=False, recognizer=False,
        model_storage_directory=storage, user_network_directory=storage,
        verbose=False,
    )
    reader.detect_network = "craft"
    reader.detector = CraftDetector(checkpoints.convert_craft(det_sd))
    converter = CTCLabelConverter(CHARS)
    reader.recognizer = Recognizer(
        checkpoints.convert_crnn_gen1(rec_sd), converter)
    reader.converter = converter
    reader.character = CHARS
    reader.lang_char = CHARS
    reader.model_lang = "arabic"
    return reader


def _synthetic_grey_page(seed=0, h=120, w=180):
    """Light page with dark word-like bars (greyscale: both reformat_input
    variants agree bit-exactly on 2-D input)."""
    rng = np.random.default_rng(seed)
    page = np.full((h, w), 235, dtype=np.uint8)
    for y0, x0, bh, bw in ((18, 12, 14, 70), (52, 40, 16, 90), (88, 20, 12, 50)):
        page[y0:y0 + bh, x0:x0 + bw] = rng.integers(10, 70, (bh, bw))
    return page


def _pick_thresholds(our_reader, page):
    """Random-init CRAFT emits arbitrary-scale heatmaps; derive thresholds
    from its response quantiles so a handful of components survive."""
    from ocrfa_tpu.preproc.host import normalize_mean_variance, resize_aspect_ratio

    img = np.stack([page] * 3, axis=-1)
    canvas, _, _ = resize_aspect_ratio(img, 256, mag_ratio=1.0)
    maps = our_reader.detector.heatmaps(normalize_mean_variance(canvas)[None])
    text = maps[0][..., 0]
    low_text = float(np.quantile(text, 0.92))
    text_threshold = float(np.quantile(text, 0.97))
    link_threshold = float(np.quantile(maps[0][..., 1], 0.97))
    return text_threshold, link_threshold, low_text


@pytest.fixture(scope="module")
def paired_readers(tmp_path_factory):
    ref_reader, det_t, rec_t = _build_reference_reader()
    ours = _build_our_reader(det_t, rec_t, tmp_path_factory.mktemp("models"))
    return ref_reader, ours


class TestReadtextGolden:
    def _run_both(self, paired_readers, **kw):
        ref_reader, ours = paired_readers
        page = _synthetic_grey_page()
        tt, lt, low = _pick_thresholds(ours, page)
        kw.setdefault("canvas_size", 256)
        kw.update(text_threshold=tt, link_threshold=lt, low_text=low,
                  min_size=5)
        theirs = ref_reader.readtext(page.copy(), **kw)
        got = ours.readtext(page.copy(), **kw)
        return theirs, got

    def test_standard_chain_identical(self, paired_readers):
        theirs, got = self._run_both(paired_readers)
        assert len(theirs) > 0, "synthetic page produced no boxes"
        assert len(got) == len(theirs)
        for (b_ref, t_ref, c_ref), (b_got, t_got, c_got) in zip(theirs, got):
            np.testing.assert_allclose(
                np.asarray(b_got, np.float64), np.asarray(b_ref, np.float64))
            assert t_got == t_ref
            np.testing.assert_allclose(float(c_got), float(c_ref), atol=1e-5)

    def test_paragraph_chain_identical(self, paired_readers):
        theirs, got = self._run_both(paired_readers, paragraph=True, detail=0)
        assert got == theirs

    def test_dict_output_chain_identical(self, paired_readers):
        theirs, got = self._run_both(paired_readers, output_format="dict")
        assert len(got) == len(theirs)
        for d_ref, d_got in zip(theirs, got):
            assert d_got["text"] == d_ref["text"]
            np.testing.assert_allclose(
                np.asarray(d_got["boxes"], np.float64),
                np.asarray(d_ref["boxes"], np.float64))

    def test_free_merge_recognize_identical(self, paired_readers):
        """free_merge golden through recognize() with constructed lists —
        detection on this page yields only free boxes, which is outside the
        reference merge_to_free's working domain (it indexes
        merge_result_buf[-1] with no merged lines, utils.py:1200)."""
        ref_reader, ours = paired_readers
        page = _synthetic_grey_page()
        # the reference needs >= 2 merged rows AND a free box that sorts
        # before row 1, else merge_result_buf[y_pos] walks off the end —
        # three horizontal lines split into two rows (x0 of line 2 < x0 of
        # line 1 breaks the run) and a free quad near the top stay inside
        # its working domain
        horizontal = [[50, 110, 30, 50], [10, 80, 60, 80], [15, 105, 90, 110]]
        free = [[[20.0, 8.0], [100.0, 10.0], [98.0, 24.0], [18.0, 22.0]]]
        kw = dict(decoder="greedy", batch_size=1, output_format="free_merge")
        theirs = ref_reader.recognize(page.copy(), horizontal, free, **kw)
        got = ours.recognize(page.copy(), horizontal, free, **kw)
        assert len(got) == len(theirs) > 0
        for r_ref, r_got in zip(theirs, got):
            assert r_got[1] == r_ref[1]
            np.testing.assert_allclose(
                np.asarray(r_got[0], np.float64), np.asarray(r_ref[0], np.float64))

    def test_readtext_batched_chain_identical(self, paired_readers):
        ref_reader, ours = paired_readers
        # a LIST of 2-D greys: a stacked (2, H, W) ndarray would read as one
        # 3-channel image in the reference's reformat_input_batched
        pages = [_synthetic_grey_page(), _synthetic_grey_page(1)]
        tt, lt, low = _pick_thresholds(ours, pages[0])
        kw = dict(canvas_size=256, text_threshold=tt, link_threshold=lt,
                  low_text=low, min_size=5)
        theirs = ref_reader.readtext_batched([p.copy() for p in pages], **kw)
        got = ours.readtext_batched([p.copy() for p in pages], **kw)
        assert len(got) == len(theirs) == 2
        total = 0
        for page_ref, page_got in zip(theirs, got):
            assert len(page_got) == len(page_ref)
            total += len(page_ref)
            for (b_ref, t_ref, c_ref), (b_got, t_got, c_got) in zip(
                    page_ref, page_got):
                assert t_got == t_ref
                np.testing.assert_allclose(
                    np.asarray(b_got, np.float64), np.asarray(b_ref, np.float64))
        assert total > 0
