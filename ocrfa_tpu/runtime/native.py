"""ctypes bindings over the native kernel library.

Every entry point has a pure-Python fallback elsewhere in the package
(``ocrfa_tpu.geometry``); callers use these when ``available()`` is true.
The library is compiled on first import if needed (g++, ~2s).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ocrfa_tpu.runtime.build import build

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build()
    if path is None:
        _lib = False
        return _lib
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    ci = ctypes.c_int

    lib.dcn_forward.argtypes = [f32p] * 4 + [f32p] + [ci] * 12
    lib.dcn_forward.restype = None
    lib.cc_label.argtypes = [u8p, ci, ci, ci, i32p]
    lib.cc_label.restype = ci
    lib.trace_boundary.argtypes = [i32p, ci, ci, ci, ci, ci, i32p, ci]
    lib.trace_boundary.restype = ci
    lib.min_area_rect.argtypes = [f64p, ci, f64p, f64p]
    lib.min_area_rect.restype = None
    lib.deform_psroi_pool.argtypes = (
        [f32p, f32p, ctypes.c_void_p, f32p]
        + [ci] * 5 + [ctypes.c_float] + [ci] * 3
        + [ctypes.c_float] + [ci] * 3)
    lib.deform_psroi_pool.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def dcn_forward_native(x, offset, mask, w, stride=1, padding=1, dilation=1):
    """Modulated deform conv v2 forward on host (parity kernel)."""
    lib = _load()
    n, h, wid, cin = x.shape
    kh, kw, _, cout = w.shape
    _, ho, wo, _ = offset.shape
    out = np.zeros((n, ho, wo, cout), dtype=np.float32)
    lib.dcn_forward(
        np.ascontiguousarray(x, np.float32),
        np.ascontiguousarray(offset, np.float32),
        np.ascontiguousarray(mask, np.float32),
        np.ascontiguousarray(w, np.float32),
        out, n, h, wid, cin, ho, wo, kh, kw, cout, stride, padding, dilation,
    )
    return out


def deform_psroi_pool_native(x, rois, trans=None, *, spatial_scale=1.0,
                             pooled_size=7, output_dim=None,
                             sample_per_part=2, trans_std=0.0, no_trans=True,
                             part_size=None, group_size=1):
    """Deformable PS-RoI pooling on host — C++ twin of
    :func:`ocrfa_tpu.ops.deform_pool.deform_roi_pool` (same NHWC semantics;
    reference native kernel: dcn/src/deform_pool_cpu_kernel.cpp:52-131)."""
    lib = _load()
    n, h, w, c = x.shape
    r = rois.shape[0]
    output_dim = output_dim or c
    part_size = part_size or pooled_size
    p = pooled_size
    out = np.zeros((r, p, p, output_dim), dtype=np.float32)
    if trans is None or no_trans:
        trans_ptr = None
    else:
        trans_arr = np.ascontiguousarray(trans, np.float32)
        trans_ptr = trans_arr.ctypes.data_as(ctypes.c_void_p)
    lib.deform_psroi_pool(
        np.ascontiguousarray(x, np.float32),
        np.ascontiguousarray(rois, np.float32),
        trans_ptr, out, n, h, w, c, r, float(spatial_scale), p, output_dim,
        sample_per_part, float(trans_std), int(no_trans or trans is None),
        part_size, group_size,
    )
    return out


def cc_label_native(img: np.ndarray, connectivity: int = 4):
    """Connected components; returns (labels int32, count)."""
    lib = _load()
    h, w = img.shape
    labels = np.zeros((h, w), dtype=np.int32)
    n = lib.cc_label(np.ascontiguousarray(img, np.uint8), h, w, connectivity, labels)
    return labels, int(n)


def find_contours_native(bitmap: np.ndarray):
    """Outer contours of all 8-connected components ((x, y) int arrays)."""
    lib = _load()
    labels, n = cc_label_native(bitmap, connectivity=8)
    h, w = labels.shape
    contours = []
    for k in range(1, n + 1):
        ys, xs = np.nonzero(labels == k)
        top = ys.min()
        left = xs[ys == top].min()
        buf = np.zeros((4 * len(ys) + 8, 2), dtype=np.int32)
        npts = lib.trace_boundary(labels, h, w, k, int(top), int(left),
                                  buf, buf.shape[0])
        contours.append(buf[:npts].astype(np.int64))
    return contours


def min_area_rect_native(points: np.ndarray):
    """Min-area rect corners (4, 2) float32 + (w, h)."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float64).reshape(-1, 2)
    out = np.zeros(8, dtype=np.float64)
    wh = np.zeros(2, dtype=np.float64)
    lib.min_area_rect(pts, pts.shape[0], out, wh)
    return out.reshape(4, 2).astype(np.float32), (float(wh[0]), float(wh[1]))
