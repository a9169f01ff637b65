"""Deformable conv: XLA op vs independent numpy spec; zero-offset == conv."""

import numpy as np
import pytest

from ocrfa_tpu.ops.deform_conv import modulated_deform_conv
from tests.dcn_numpy import modulated_deform_conv_np


def _rand_case(rng, n=1, h=6, w=7, cin=3, cout=4, stride=1, padding=1):
    ho = (h + 2 * padding - 3) // stride + 1
    wo = (w + 2 * padding - 3) // stride + 1
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((n, ho, wo, 18)) * 1.5).astype(np.float32)
    mask = rng.random((n, ho, wo, 9)).astype(np.float32)
    wgt = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.3
    return x, offset, mask, wgt


class TestModulatedDeformConv:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_numpy_spec(self, stride):
        rng = np.random.default_rng(stride)
        x, offset, mask, w = _rand_case(rng, stride=stride)
        ours = np.asarray(
            modulated_deform_conv(x, offset, mask, w, stride=stride, padding=1)
        )
        ref = modulated_deform_conv_np(x, offset, mask, w, stride=stride, padding=1)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_zero_offset_unit_mask_equals_conv(self):
        import jax.numpy as jnp

        from ocrfa_tpu.models.layers import conv2d

        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 8, 9, 4)).astype(np.float32)
        w = rng.standard_normal((3, 3, 4, 5)).astype(np.float32) * 0.2
        offset = np.zeros((2, 8, 9, 18), dtype=np.float32)
        mask = np.ones((2, 8, 9, 9), dtype=np.float32)
        ours = np.asarray(modulated_deform_conv(x, offset, mask, w))
        plain = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding=1))
        np.testing.assert_allclose(ours, plain, atol=1e-4, rtol=1e-4)

    def test_mask_zero_kills_output(self):
        rng = np.random.default_rng(4)
        x, offset, mask, w = _rand_case(rng)
        out = np.asarray(
            modulated_deform_conv(x, offset, np.zeros_like(mask), w)
        )
        np.testing.assert_allclose(out, 0.0, atol=1e-6)


class TestBoundedDeformConv:
    """Dense-shift formulation == gather formulation once offsets fit ±R."""

    @pytest.mark.parametrize("stride,radius", [(1, 2), (2, 2), (1, 1)])
    def test_matches_gather_when_bounded(self, stride, radius):
        from ocrfa_tpu.ops.deform_conv import modulated_deform_conv_bounded

        rng = np.random.default_rng(10 * stride + radius)
        x, offset, mask, w = _rand_case(rng, h=8, w=9, stride=stride)
        offset = np.clip(offset, -radius, radius)
        ref = np.asarray(modulated_deform_conv(
            x, offset, mask, w, stride=stride, padding=1))
        ours = np.asarray(modulated_deform_conv_bounded(
            x, offset, mask, w, stride=stride, padding=1, radius=radius))
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_clamps_oversized_offsets(self):
        from ocrfa_tpu.ops.deform_conv import modulated_deform_conv_bounded

        rng = np.random.default_rng(7)
        x, offset, mask, w = _rand_case(rng)
        offset = offset * 4.0  # well past the radius
        ref = np.asarray(modulated_deform_conv(
            x, np.clip(offset, -2, 2), mask, w, padding=1))
        ours = np.asarray(modulated_deform_conv_bounded(
            x, offset, mask, w, padding=1, radius=2))
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    @pytest.mark.slow  # autodiff through the shifted-slice sum is a big
    # CPU compile even at tiny shapes (radius=1 keeps it ~2 min; radius=2
    # measured ~10 min on the 1-core host)
    def test_bias_and_grads(self):
        import jax
        import jax.numpy as jnp

        from ocrfa_tpu.ops.deform_conv import modulated_deform_conv_bounded

        rng = np.random.default_rng(8)
        x, offset, mask, w = _rand_case(rng)
        b = rng.standard_normal(4).astype(np.float32)

        def loss(w_, off_):
            return jnp.sum(modulated_deform_conv_bounded(
                x, off_, mask, w_, b=b, padding=1, radius=1) ** 2)

        gw, goff = jax.grad(loss, argnums=(0, 1))(jnp.asarray(w),
                                                  jnp.asarray(offset))
        assert np.isfinite(np.asarray(gw)).all()
        assert np.isfinite(np.asarray(goff)).all()
        assert float(jnp.abs(goff).sum()) > 0  # offsets get gradient


class TestDeformConvV1:
    """Plain (non-modulated) DCNv1 — the reference's second exported op."""

    def test_unit_mask_equivalence(self):
        from ocrfa_tpu.ops.deform_conv import deform_conv

        rng = np.random.default_rng(7)
        x, offset, _m, wgt = _rand_case(rng)
        ones = np.ones((1, offset.shape[1], offset.shape[2], 9), np.float32)
        got = np.asarray(deform_conv(x, offset, wgt))
        want = modulated_deform_conv_np(x, offset, ones, wgt)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_zero_offset_equals_conv(self):
        import jax

        from ocrfa_tpu.ops.deform_conv import deform_conv

        rng = np.random.default_rng(8)
        x, offset, _m, wgt = _rand_case(rng)
        offset = np.zeros_like(offset)
        got = np.asarray(deform_conv(x, offset, wgt))
        want = np.asarray(jax.lax.conv_general_dilated(
            x, wgt, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
