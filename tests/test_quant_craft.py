"""Static-int8 CRAFT detector tower: calibration, fold parity, box equality."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trainer/compile-heavy suite

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.craft import craft_apply, init_craft
from ocrfa_tpu.models.quant_craft import (
    calibrate_craft,
    craft_apply_int8_static,
    quantize_craft_static,
)


def _perturb_bn(params):
    """Non-trivial BN running stats so folding is actually exercised.

    The fold-in key must NOT use ``hash(str(path))``: str hashing is
    salted per process (PYTHONHASHSEED), which made the toy model — and
    the int8-vs-f32 error this suite asserts on — a per-run lottery
    (observed 0.145 vs the 0.12 gate on an unlucky draw)."""
    import zlib

    def perturb(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name in ("mean", "var", "scale"):
            k = jax.random.fold_in(jax.random.PRNGKey(7),
                                   zlib.crc32(str(path).encode()) % 2**31)
            jitter = 0.2 * jax.random.normal(k, leaf.shape)
            return leaf + (jnp.abs(jitter) if name == "var" else jitter)
        return leaf
    return jax.tree_util.tree_map_with_path(perturb, params)


@pytest.fixture(scope="module")
def toy():
    params = _perturb_bn(init_craft(jax.random.PRNGKey(0), base=16))
    rng = np.random.default_rng(0)
    # structured "page": light background with dark bars -> smooth activations
    page = np.full((2, 64, 96, 3), 0.8, dtype=np.float32)
    page[:, 20:30, 10:80] = -1.2
    page[:, 40:46, 20:60] = -1.0
    page += 0.05 * rng.standard_normal(page.shape).astype(np.float32)
    return params, page


class TestStaticInt8Craft:
    def test_calibration_covers_every_conv(self, toy):
        params, x = toy
        amax = calibrate_craft(params, [x])
        # 12 vgg conv+bn, fc6/fc7, 4 upconv x2, 5 cls
        assert len(amax) == 12 + 2 + 8 + 5
        assert all(v > 0 for v in amax.values())

    def test_heatmaps_close_to_f32(self, toy):
        params, x = toy
        amax = calibrate_craft(params, [x])
        q = quantize_craft_static(params, amax)
        ref, _ = craft_apply(params, jnp.asarray(x))
        got, _ = craft_apply_int8_static(q, jnp.asarray(x))
        ref = np.asarray(ref, np.float32)
        got = np.asarray(got, np.float32)
        scale = np.abs(ref).max()
        err = np.abs(got - ref).max() / (scale + 1e-9)
        assert err < 0.12, f"relative heatmap error {err:.4f}"
        # mean error much tighter than max
        mean_err = np.abs(got - ref).mean() / (scale + 1e-9)
        assert mean_err < 0.02, f"mean heatmap error {mean_err:.4f}"

    def test_threshold_masks_agree(self, toy):
        """Detection consumes the heatmaps only through threshold masks;
        int8 and f32 masks must agree except at component edges (a trained
        net has threshold margin a random-init one lacks, so the bar here
        is pixel agreement, not box-coordinate equality)."""
        params, x = toy
        amax = calibrate_craft(params, [x])
        q = quantize_craft_static(params, amax)
        ref = np.asarray(craft_apply(params, jnp.asarray(x))[0], np.float32)
        got = np.asarray(craft_apply_int8_static(q, jnp.asarray(x))[0],
                         np.float32)
        # flips can only happen within the int8 error band around the
        # threshold: outside max|got-ref| the masks agree BY CONSTRUCTION —
        # an exact, flake-free invariant (a random-init net has heatmap
        # noise near any quantile threshold, so raw agreement only gets a
        # loose floor)
        err = float(np.abs(got[..., 0] - ref[..., 0]).max())
        for quant in (0.5, 0.7, 0.9):
            th = float(np.quantile(ref[..., 0], quant))
            same = (ref[..., 0] > th) == (got[..., 0] > th)
            assert same.mean() > 0.90, (
                f"mask agreement {same.mean():.4f} at q={quant}")
            off_band = np.abs(ref[..., 0] - th) > err * (1 + 1e-6) + 1e-7
            assert same[off_band].all(), f"off-band flip at q={quant}"

    def test_detector_int8_end_to_end(self, toy):
        from ocrfa_tpu.detector import CraftDetector

        params, x = toy
        ref_maps, _ = craft_apply(params, jnp.asarray(x))
        lo = float(np.quantile(np.asarray(ref_maps)[..., 0], 0.7))
        hi = float(np.quantile(np.asarray(ref_maps)[..., 0], 0.9))
        page = ((np.asarray(x)[0, :, :, 0] * 0.2 + 0.5) * 255).astype(np.uint8)
        rgb = np.repeat(page[:, :, None], 3, axis=-1)

        det_int8 = CraftDetector(params, quantized="static",
                                 calibration_batches=[x])
        boxes, polys = det_int8(rgb, canvas_size=96, text_threshold=hi,
                                low_text=lo, link_threshold=hi)
        assert len(boxes) == 1 and len(polys) == 1
        for b in boxes[0]:
            arr = np.asarray(b, dtype=np.float64)
            assert arr.shape == (4, 2)
            assert np.isfinite(arr).all()

    def test_static_requires_calibration(self, toy):
        from ocrfa_tpu.detector import CraftDetector

        params, _ = toy
        with pytest.raises(ValueError):
            CraftDetector(params, quantized="static")
        with pytest.raises(ValueError):
            CraftDetector(params, quantized="nope")

    def test_serving_pipeline_int8_runs(self, toy):
        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer
        from ocrfa_tpu.serving import ServingPipeline

        params, x = toy
        conv = CTCLabelConverter("ابتث")
        rec = Recognizer(
            init_crnn_gen1(jax.random.PRNGKey(1), num_class=conv.num_classes,
                           output_channel=64, hidden_size=64), conv)
        pipe = ServingPipeline(params, rec, canvas_size=96,
                               detector_quantized="static",
                               detector_calibration=[x])
        page = np.full((80, 96), 240, dtype=np.uint8)
        page[30:44, 10:80] = 15
        results = pipe.finish_page(pipe.submit_page(page))
        assert isinstance(results, list)
