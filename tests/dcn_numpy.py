"""Naive numpy modulated deformable conv — independent spec implementation.

Written directly from the DCNv2 definition (sample at
``p + p_k + dp_k``, bilinear, zero outside, mask-modulated) to cross-check
the XLA op and the C++ parity kernel.  Deliberately loop-based and simple.
"""

import numpy as np


def bilinear(img, y, x):
    """img: (H, W, C); zero outside."""
    h, w, c = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    fy, fx = y - y0, x - x0
    out = np.zeros(c, dtype=np.float64)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < h and 0 <= xx < w:
                out += wy * wx * img[yy, xx]
    return out


def modulated_deform_conv_np(x, offset, mask, w, stride=1, padding=1, dilation=1):
    """x: (N,H,W,Cin); offset: (N,Ho,Wo,2K) [dy,dx] interleaved;
    mask: (N,Ho,Wo,K); w: (Kh,Kw,Cin,Cout)."""
    n, h, width, cin = x.shape
    kh, kw, _, cout = w.shape
    _, ho, wo, _ = offset.shape
    out = np.zeros((n, ho, wo, cout), dtype=np.float64)
    for b in range(n):
        for oy in range(ho):
            for ox in range(wo):
                acc = np.zeros(cout, dtype=np.float64)
                for i in range(kh):
                    for j in range(kw):
                        k = i * kw + j
                        dy = offset[b, oy, ox, 2 * k]
                        dx = offset[b, oy, ox, 2 * k + 1]
                        sy = oy * stride - padding + i * dilation + dy
                        sx = ox * stride - padding + j * dilation + dx
                        val = bilinear(x[b], sy, sx) * mask[b, oy, ox, k]
                        acc += val @ w[i, j]
                out[b, oy, ox] = acc
    return out
