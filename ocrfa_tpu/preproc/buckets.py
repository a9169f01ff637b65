"""Width bucketing for static-shape batched recognition.

Under XLA every distinct input shape triggers a recompile; the reference's
per-call dynamic ``max_width`` (utils.py:1412-1414) would recompile on nearly
every page.  Crops are padded up to a fixed ladder of widths so the
recognizer compiles once per (width, batch) bucket and is reused forever
(SURVEY.md §5.7; BASELINE.json north star).

Two ladders:

* **Parity ladder** (default): every multiple of 64 up to the 2560 canvas.
  The reference's per-call ``max_width = ceil(max aspect ratio) * 64`` is
  always a multiple of 64, so rounding up to this ladder reproduces the
  reference's padding *exactly* (replicate-edge pad is part of the model
  input there too) while bounding the compile count at 40.
* **Serving ladder**: coarse power-of-two-ish steps for maximum batch
  packing in corpus-scale serving, where cross-width exactness is waived.
"""

from __future__ import annotations

from collections import defaultdict

MODEL_HEIGHT = 64
MAX_WIDTH = 2560

# Parity ladder: multiples of 64 (matches reference max_width exactly).
WIDTH_BUCKETS = tuple(range(MODEL_HEIGHT, MAX_WIDTH + 1, MODEL_HEIGHT))

# Serving ladder: ~64px steps through the common text-line range (padding
# waste is pure conv compute at these widths), coarser above.
SERVING_WIDTH_BUCKETS = (128, 192, 256, 320, 384, 448, 512, 640, 768, 1024,
                         1536, 2048, 2560)

# Batch sizes are also bucketed (next power of two) to bound compile count.
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def bucket_for_width(width: int, ladder=WIDTH_BUCKETS) -> int:
    """Smallest ladder width >= ``width`` (last bucket clamps)."""
    for b in ladder:
        if width <= b:
            return b
    return ladder[-1]


def bucket_for_batch(n: int) -> int:
    for b in BATCH_BUCKETS:
        if n <= b:
            return b
    # beyond the ladder: next power of two (never truncate the batch)
    return 1 << (n - 1).bit_length()


def bucketize(widths, ladder=WIDTH_BUCKETS) -> dict:
    """Group crop indices by pad-width bucket.

    Returns ``{bucket_width: [crop indices]}`` preserving original order
    within each bucket, so results can be scattered back by index.
    """
    groups = defaultdict(list)
    for i, w in enumerate(widths):
        groups[bucket_for_width(w, ladder)].append(i)
    return dict(groups)


def chunk_by_width(widths, chunk: int, ladder=SERVING_WIDTH_BUCKETS):
    """Width-sorted FULL chunks for corpus-scale serving.

    Per-bucket chunking leaves one partial dispatch per occupied bucket
    (7 ragged dispatches on a 4k-line aspect-2-8 corpus) — each pays full
    dispatch overhead for a fraction of the lines.  Sorting the whole
    corpus by needed width and cutting every ``chunk`` lines instead makes
    every dispatch full (only the global tail is ragged); each chunk pads
    to the bucket of its WIDEST line, so the compute cost of promotion is
    bounded by one ladder step for the chunk-boundary lines.

    Returns ``[(indices, bucket_width), ...]``.
    """
    order = sorted(range(len(widths)), key=lambda i: widths[i])
    out = []
    for s in range(0, len(order), chunk):
        idxs = order[s:s + chunk]
        out.append((idxs, bucket_for_width(widths[idxs[-1]], ladder)))
    return out
