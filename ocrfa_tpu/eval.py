"""Evaluation: character/word error rates and pipeline comparison.

The BASELINE.md metrics are Farsi CER vs the CPU reference and p50
per-page latency; this module provides the measurement machinery.
"""

from __future__ import annotations

import time


def levenshtein(a, b) -> int:
    """Edit distance over two sequences (chars or words)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        curr = [i]
        for j, cb in enumerate(b, 1):
            curr.append(min(
                prev[j] + 1,          # deletion
                curr[j - 1] + 1,      # insertion
                prev[j - 1] + (ca != cb),  # substitution
            ))
        prev = curr
    return prev[-1]


def cer(hypotheses, references) -> float:
    """Character error rate: sum(edit) / sum(len(ref))."""
    edits = sum(levenshtein(h, r) for h, r in zip(hypotheses, references))
    total = sum(len(r) for r in references)
    return edits / max(total, 1)


def wer(hypotheses, references) -> float:
    """Word error rate (whitespace tokenisation)."""
    edits = sum(
        levenshtein(h.split(), r.split()) for h, r in zip(hypotheses, references)
    )
    total = sum(len(r.split()) for r in references)
    return edits / max(total, 1)


def exact_match_rate(hypotheses, references) -> float:
    if not references:
        return 1.0
    return sum(h == r for h, r in zip(hypotheses, references)) / len(references)


def latency_percentiles(fn, inputs, warmup: int = 2, percentiles=(50, 90, 99)) -> dict:
    """Run ``fn`` over ``inputs`` and report per-call latency percentiles
    in milliseconds (the BASELINE p50 per-page metric)."""
    import numpy as np

    for x in inputs[:warmup]:
        fn(x)
    times = []
    for x in inputs:
        t0 = time.perf_counter()
        fn(x)
        times.append((time.perf_counter() - t0) * 1000)
    times = np.asarray(times)
    return {f"p{p}_ms": float(np.percentile(times, p)) for p in percentiles} | {
        "mean_ms": float(times.mean()),
        "n": len(times),
    }
