"""Native C++ kernels vs the Python/scipy/XLA implementations."""

import numpy as np
import pytest

from ocrfa_tpu.runtime import (
    available,
    cc_label_native,
    dcn_forward_native,
    find_contours_native,
    min_area_rect_native,
)

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


class TestNativeDCN:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_numpy_spec(self, stride):
        from tests.dcn_numpy import modulated_deform_conv_np

        rng = np.random.default_rng(stride)
        h, w, cin, cout, padding = 6, 7, 3, 4, 1
        ho = (h + 2 * padding - 3) // stride + 1
        wo = (w + 2 * padding - 3) // stride + 1
        x = rng.standard_normal((2, h, w, cin)).astype(np.float32)
        offset = (rng.standard_normal((2, ho, wo, 18)) * 1.5).astype(np.float32)
        mask = rng.random((2, ho, wo, 9)).astype(np.float32)
        wgt = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.3

        ours = dcn_forward_native(x, offset, mask, wgt, stride=stride)
        ref = modulated_deform_conv_np(x, offset, mask, wgt, stride=stride)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_matches_xla_op(self):
        from ocrfa_tpu.ops.deform_conv import modulated_deform_conv

        rng = np.random.default_rng(9)
        x = rng.standard_normal((1, 10, 12, 8)).astype(np.float32)
        offset = (rng.standard_normal((1, 10, 12, 18))).astype(np.float32)
        mask = rng.random((1, 10, 12, 9)).astype(np.float32)
        wgt = rng.standard_normal((3, 3, 8, 16)).astype(np.float32) * 0.2
        native = dcn_forward_native(x, offset, mask, wgt)
        xla = np.asarray(modulated_deform_conv(x, offset, mask, wgt))
        np.testing.assert_allclose(native, xla, atol=2e-4, rtol=1e-3)


class TestNativeCC:
    @pytest.mark.parametrize("connectivity", [4, 8])
    def test_matches_scipy(self, connectivity):
        from scipy.ndimage import label as cc_scipy

        rng = np.random.default_rng(0)
        for _ in range(10):
            img = (rng.random((40, 50)) > 0.6).astype(np.uint8)
            structure = (
                np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
                if connectivity == 4 else np.ones((3, 3))
            )
            ref_labels, ref_n = cc_scipy(img, structure=structure)
            labels, n = cc_label_native(img, connectivity)
            assert n == ref_n
            # same partition (label ids may differ): compare canonical maps
            for k in range(1, n + 1):
                mask = labels == k
                ref_ids = np.unique(ref_labels[mask])
                assert len(ref_ids) == 1

    def test_contours_match_python(self):
        from ocrfa_tpu.geometry.contours import find_contours

        bmp = np.zeros((30, 40), dtype=np.uint8)
        bmp[5:15, 10:30] = 1
        bmp[20:25, 2:8] = 1
        ours = find_contours_native(bmp)
        ref = find_contours(bmp)
        assert len(ours) == len(ref)
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(a, b)


class TestNativeMinRect:
    def test_matches_python(self):
        from ocrfa_tpu.geometry.minrect import min_area_rect

        rng = np.random.default_rng(1)
        for _ in range(20):
            pts = rng.random((rng.integers(3, 40), 2)) * 100
            nb, (nw, nh) = min_area_rect_native(pts)
            pb, (pw, ph) = min_area_rect(pts)
            assert np.isclose(nw * nh, pw * ph, rtol=1e-5)
            # same corner set (order may rotate)
            na = sorted(map(tuple, np.round(nb, 3)))
            pa = sorted(map(tuple, np.round(pb, 3)))
            np.testing.assert_allclose(na, pa, atol=1e-2)


class TestDeformPSRoIPoolNative:
    """C++ twin vs the XLA op (ops/deform_pool.py) — same NHWC semantics."""

    def _compare(self, no_trans, group_size, trans_std=0.1):
        import jax

        from ocrfa_tpu.ops.deform_pool import deform_roi_pool
        from ocrfa_tpu.runtime.native import available, deform_psroi_pool_native

        if not available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(3)
        n, h, w, c = 2, 24, 32, 16
        x = rng.standard_normal((n, h, w, c), dtype=np.float32)
        rois = np.array([
            [0, 2.0, 3.0, 20.0, 18.0],
            [1, 0.0, 0.0, 30.0, 22.0],
            [0, 5.0, 5.0, 9.0, 9.0],
        ], dtype=np.float32)
        p = 4
        trans = rng.standard_normal((3, p, p, 2), dtype=np.float32)
        kw = dict(spatial_scale=0.5, pooled_size=p, output_dim=4,
                  sample_per_part=2, trans_std=trans_std,
                  no_trans=no_trans, group_size=group_size)
        ours = np.asarray(deform_roi_pool(x, rois, trans, **kw))
        native = deform_psroi_pool_native(x, rois, trans, **kw)
        np.testing.assert_allclose(native, ours, atol=1e-5, rtol=1e-5)

    def test_plain_average(self):
        self._compare(no_trans=True, group_size=1)

    def test_with_trans_offsets(self):
        self._compare(no_trans=False, group_size=1)

    def test_position_sensitive_groups(self):
        self._compare(no_trans=False, group_size=2)
