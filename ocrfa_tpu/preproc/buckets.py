"""Width bucketing for static-shape batched recognition.

Under XLA every distinct input shape triggers a recompile; the reference's
per-call dynamic ``max_width`` (utils.py:1412-1414) would recompile on nearly
every page.  Instead, crops are padded up to a fixed ladder of widths so the
recognizer compiles once per (bucket, batch-size) pair and is reused forever
(SURVEY.md §5.7; BASELINE.json north star).
"""

from __future__ import annotations

from collections import defaultdict

# Pad-width ladder in pixels for 64-px-high line crops.  4x feature
# downsample => sequence lengths {31, 63, 127, 255, 383, 511, 639}.
WIDTH_BUCKETS = (128, 256, 512, 1024, 1536, 2048, 2560)

# Batch sizes are also bucketed (next power of two) to bound compile count.
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def bucket_for_width(width: int) -> int:
    """Smallest ladder width >= ``width`` (last bucket clamps)."""
    for b in WIDTH_BUCKETS:
        if width <= b:
            return b
    return WIDTH_BUCKETS[-1]


def bucket_for_batch(n: int) -> int:
    for b in BATCH_BUCKETS:
        if n <= b:
            return b
    return BATCH_BUCKETS[-1]


def bucketize(widths) -> dict:
    """Group crop indices by pad-width bucket.

    Returns ``{bucket_width: [crop indices]}`` preserving original order
    within each bucket, so results can be scattered back by index.
    """
    groups = defaultdict(list)
    for i, w in enumerate(widths):
        groups[bucket_for_width(w)].append(i)
    return dict(groups)
