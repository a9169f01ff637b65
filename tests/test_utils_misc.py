"""Coverage for small utility modules (viz, cache, progress hook)."""

import numpy as np


class TestViz:
    def test_jet_heatmap(self):
        from ocrfa_tpu.utils.viz import heatmap_to_image

        img = heatmap_to_image(np.linspace(0, 1, 256).reshape(16, 16))
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        # JET: low values blue-ish, high values red-ish
        low, high = img.reshape(-1, 3)[0], img.reshape(-1, 3)[-1]
        assert low[2] > low[0] and high[0] > high[2]
        # out-of-range inputs clip instead of wrapping
        clipped = heatmap_to_image(np.array([[-1.0, 2.0]]))
        np.testing.assert_array_equal(clipped[0, 0], heatmap_to_image(np.array([[0.0]]))[0, 0])

    def test_draw_boxes(self):
        from ocrfa_tpu.utils.viz import draw_boxes

        canvas = np.zeros((20, 20, 3), dtype=np.uint8)
        out = draw_boxes(canvas, [[[2, 2], [10, 2], [10, 10], [2, 10]]])
        assert (out[2, 2] == [255, 0, 0]).all()
        assert (canvas == 0).all()  # input untouched


class TestCompilationCache:
    def test_enable_idempotent(self, tmp_path):
        from ocrfa_tpu.utils.cache import enable_compilation_cache

        d = str(tmp_path / "cache")
        assert enable_compilation_cache(d) == d
        assert enable_compilation_cache(d) == d  # no error on re-enable
        import os

        assert os.path.isdir(d)


class TestProgressHook:
    def test_prints_percent(self, capsys):
        from ocrfa_tpu.io import progress_hook

        hook = progress_hook(prefix="P", length=10)
        hook(5, 10, 100)  # 50%
        out = capsys.readouterr().out
        assert "50.0%" in out and "#####" in out
        hook(20, 10, 100)  # clamps at 100
        assert "100.0%" in capsys.readouterr().out


class TestDeviceDecodeEdges:
    def test_all_blank_confidence_zero(self):
        import jax.numpy as jnp

        from ocrfa_tpu.decode.device import ctc_confidences, decode_greedy_batch

        indices = np.zeros((2, 5), dtype=np.int32)
        values = np.full((2, 5), 0.9, dtype=np.float32)
        confs = np.asarray(ctc_confidences(jnp.asarray(indices), jnp.asarray(values)))
        np.testing.assert_allclose(confs, 0.0)
        assert decode_greedy_batch(indices, ["[blank]", "a"]) == ["", ""]

    def test_single_step(self):
        from ocrfa_tpu.decode.device import decode_greedy_batch

        indices = np.array([[1], [0]], dtype=np.int32)
        assert decode_greedy_batch(indices, ["[blank]", "ب"]) == ["ب", ""]

    def test_confidence_matches_host_custom_mean(self):
        import jax.numpy as jnp

        from ocrfa_tpu.decode.device import ctc_confidences
        from ocrfa_tpu.preproc.host import custom_mean

        rng = np.random.default_rng(0)
        indices = rng.integers(0, 3, (4, 12)).astype(np.int32)
        values = rng.random((4, 12)).astype(np.float32)
        confs = np.asarray(ctc_confidences(jnp.asarray(indices), jnp.asarray(values)))
        for i in range(4):
            mp = values[i][indices[i] != 0]
            expected = custom_mean(mp) if len(mp) else 0.0
            assert np.isclose(confs[i], expected, rtol=1e-5, atol=1e-7)
