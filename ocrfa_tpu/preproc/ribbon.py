"""Row-ribbon wire format: native-resolution crops over the host->device link.

The round-1 serving bench shipped fixed 64x256 uint8 crop batches — 16 KiB
per line regardless of content — and the host->device relay's ~20-45 MB/s
made that a hard few-k lines/s ceiling.  Real text lines are far smaller at
their NATIVE resolution (a 28px-high, 300px-wide scan line is ~8 KiB); the
reference upsamples on the host only because its model wants h=64 input
(utils.py:567-602).  The wire format here ships native pixels and resizes
on device:

* ``pack_crops``: stack raw (h_k, w_k) uint8 grey crops row-by-row into one
  (R, stride) byte matrix plus an (N, 3) int32 ``[row_offset, h, w]`` table,
  both padded onto bucket ladders so XLA compiles a bounded set of shapes.
  ``stride`` is the width bucket of the widest crop in the group; callers
  group crops by (output bucket, stride bucket) for dense packing.
* ``ribbon_to_batch``: on-device resize of every crop to the (64, out_w)
  recognition bucket.  Vertical pass = axis-0 row gather + 2-tap blend
  (rows are contiguous ``stride``-byte lines, so the gather moves whole
  rows, not scattered elements); horizontal pass = a batched matmul against
  a per-crop bilinear hat matrix built from iota arithmetic — it runs on
  the MXU instead of a 33M-element gather, which measured ~5x faster than
  the flat-byte-ribbon formulation on v5e.

Columns beyond a crop's aspect-preserved width clamp to its last source
column — replicate-edge padding, the reference's ``NormalizePAD``
convention.  Bytes per line scale with native crop area (+ stride padding),
2-4x less relay traffic than padded h=64 batches.  The resize kernel is
bilinear (serving semantics, like :mod:`ocrfa_tpu.preproc.device`); the
host PIL path in ``preproc.host`` remains the bit-parity route.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ocrfa_tpu.preproc.buckets import bucket_for_batch

# native-width (stride) ladder; also used to bucket the row count
STRIDE_LADDER = (64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 2560)
_ROW_BUCKET = 512  # row-count granularity (R is padded to a multiple)


def stride_bucket(width: int) -> int:
    for s in STRIDE_LADDER:
        if width <= s:
            return s
    return STRIDE_LADDER[-1]


def pack_crops(crops, stride: int | None = None, wire: str = "u8",
               u1_threshold: int | None = None):
    """Pack grey uint8 crops into ``(rows, meta)`` device-upload arrays.

    ``rows`` is (R, stride) uint8 — crop k occupies rows
    ``row_off_k : row_off_k + h_k``, columns ``0 : w_k`` (the rest is
    zero; the unpack gives padding columns zero weight).  ``meta`` is
    (N_padded, 3) int32 ``[row_offset, height, width]``; padded meta rows
    alias crop 0 so gathers stay in bounds — callers slice results to
    ``len(crops)``.

    Sub-byte wires trade pixel depth for relay bytes (the serving wall —
    CLAUDE.md); CER impact per mode is measured in ``scripts/eval_farsi.py``:

    * ``"u4"`` — 16 grey levels, 2 px/byte.  Negligible CER impact.
    * ``"u2"`` — 4 levels, 4 px/byte.
    * ``"u1"`` — binary, 8 px/byte; 8x fewer bytes than u8.  NOT
      accuracy-free on anti-aliased renders: measured +0.040 CER on the
      gen1t384 thin tower and +0.037 on gen1w8 at the default threshold
      (EVAL_SHAPED_T384_r3/W8_r3) vs u4's +0.001 — binarisation erases the
      stroke-weight shading thin towers lean on.  ``u1_threshold`` (default
      128) calibrates the cut per tower/corpus; qualify on a sample before
      shipping u1, or stay on u4.

    Use ``"u8"`` when wire exactness matters.
    """
    n = len(crops)
    shapes = []
    for k, crop in enumerate(crops):
        a = np.asarray(crop)
        if a.ndim != 2:
            raise ValueError(f"crop {k}: expected 2-D grey image, got {a.shape}")
        shapes.append(a.shape)
    if stride is None:
        stride = stride_bucket(max((w for _, w in shapes), default=1))
    px_per_byte = _WIRE_PX_PER_BYTE.get(wire)
    if px_per_byte is None:
        raise ValueError(f"unknown wire format {wire!r}")
    if stride % px_per_byte:
        stride += px_per_byte - stride % px_per_byte

    meta = np.zeros((bucket_for_batch(max(n, 1)), 3), dtype=np.int32)
    total_rows = sum(h for h, _ in shapes)
    r_bucket = -(-max(total_rows, 1) // _ROW_BUCKET) * _ROW_BUCKET
    rows = np.zeros((r_bucket, stride), dtype=np.uint8)
    off = 0
    for k, crop in enumerate(crops):
        h, w = shapes[k]
        if w > stride:
            raise ValueError(f"crop {k}: width {w} exceeds stride {stride}")
        rows[off:off + h, :w] = crop
        meta[k] = off, h, w
        off += h
    meta[n:] = meta[0]
    if wire != "u8":
        bits = 8 // px_per_byte
        if wire == "u1" and u1_threshold is not None:
            q = (rows >= u1_threshold).astype(np.uint8)
        else:
            q = rows >> (8 - bits)  # quantize to `bits` bits
        # pixel i of each byte sits at bit position i*bits (LSB first)
        packed = np.zeros((rows.shape[0], stride // px_per_byte), dtype=np.uint8)
        for i in range(px_per_byte):
            packed |= q[:, i::px_per_byte] << (i * bits)
        rows = packed
    return rows, meta


_WIRE_PX_PER_BYTE = {"u8": 1, "u4": 2, "u2": 4, "u1": 8}


@partial(jax.jit, static_argnames=("out_h", "out_w", "wire"))
def ribbon_to_batch(rows_u8, meta, out_h: int = 64, out_w: int = 256,
                    wire: str = "u8"):
    """(row ribbon, meta) -> (N, out_h, out_w, 1) float32 in [-1, 1].

    Per crop: aspect-preserved bilinear resize to height ``out_h`` with
    width clamped to the ``out_w`` bucket; replicate-edge right padding via
    coordinate clamping.  Also returns (N,) int32 valid widths.
    """
    if wire != "u8":
        # unpack px-per-byte sub-byte pixels (LSB-first); the scale maps the
        # quantized range back onto 0..255 (17 for u4, 85 for u2, 255 for u1)
        px = _WIRE_PX_PER_BYTE[wire]
        bits = 8 // px
        mask = (1 << bits) - 1
        scale = jnp.uint8(255 // mask)
        parts = [((rows_u8 >> (i * bits)) & mask) * scale for i in range(px)]
        rows_u8 = jnp.stack(parts, axis=-1).reshape(rows_u8.shape[0], -1)
    stride = rows_u8.shape[1]
    row_off = meta[:, 0]
    src_h = meta[:, 1]
    src_w = meta[:, 2]
    h_f = src_h.astype(jnp.float32)
    w_f = src_w.astype(jnp.float32)

    new_w = jnp.clip(jnp.ceil(out_h * w_f / h_f), 1, out_w)

    # vertical: gather the two source rows bracketing each output row and
    # blend — whole (stride,)-byte rows move per gather element
    oy = jnp.arange(out_h, dtype=jnp.float32)
    sy = (oy[None, :] + 0.5) * (h_f[:, None] / out_h) - 0.5
    sy = jnp.clip(sy, 0.0, h_f[:, None] - 1.0)                      # (N, H)
    y_lo = jnp.floor(sy).astype(jnp.int32)
    fy = (sy - y_lo)[:, :, None]
    y0 = row_off[:, None] + jnp.clip(y_lo, 0, src_h[:, None] - 1)
    y1 = row_off[:, None] + jnp.clip(y_lo + 1, 0, src_h[:, None] - 1)
    g0 = rows_u8[y0].astype(jnp.float32)                            # (N, H, S)
    g1 = rows_u8[y1].astype(jnp.float32)
    vert = g0 * (1 - fy) + g1 * fy

    # horizontal: batched matmul against a per-crop bilinear hat matrix —
    # hat(sx - i) reproduces the 2-tap blend exactly, clamped columns give
    # replicate-edge padding, and columns beyond src_w get zero weight
    ox = jnp.arange(out_w, dtype=jnp.float32)
    sx = (ox[None, :] + 0.5) * (w_f[:, None] / new_w[:, None]) - 0.5
    sx = jnp.clip(sx, 0.0, w_f[:, None] - 1.0)                      # (N, W)
    cols = jnp.arange(stride, dtype=jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, None, :] - cols[None, :, None]))

    out = jnp.einsum("nhs,nsw->nhw", vert, hat,
                     preferred_element_type=jnp.float32)
    out = (out / 255.0 - 0.5) / 0.5
    return out[..., None], new_w.astype(jnp.int32)
