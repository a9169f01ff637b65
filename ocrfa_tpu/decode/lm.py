"""Character bigram language model for beam-search rescoring.

The reference carries a dormant LM slot — ``ctcBeamSearch(mat, classes,
ignore_idx, lm, ...)`` threads an ``lm`` object through to a commented-out
``applyLM`` call (``/root/reference/src/ocrfa/utils.py:875-883, 1020``)
whose contract is ``lm.getCharBigram(c1, c2) ** 0.01`` multiplied into the
beam's text score.  This module makes that slot functional:

* :class:`CharBigramLM` — Laplace-smoothed bigram fit from any text
  iterable (e.g. a Farsi corpus or the synthetic ``data.py`` renders),
  exposing the reference-named ``getCharBigram`` plus a dense
  ``log_matrix`` for the on-device decoder.
* host hook: ``ctc_beam_search(..., lm=...)`` applies the reference
  ``applyLM`` semantics exactly (once per extension, length-normalised).
* device hook: ``ctc_beam_search_device(..., lm_log=..., lm_factor=...)``
  adds ``lm_factor * log P(c | prev)`` to every beam extension inside the
  scan — a (C, C) gather, FlexCTC-style shallow fusion.
"""

from __future__ import annotations

import numpy as np


class CharBigramLM:
    """Laplace-smoothed character bigram model over a recognizer charset.

    Index space matches the CTC class list: index 0 is blank and doubles as
    the start-of-text context (an empty beam has no previous character).
    """

    def __init__(self, classes, alpha: float = 1.0):
        self.classes = list(classes)
        self.index = {c: i for i, c in enumerate(self.classes)}
        self.alpha = float(alpha)
        n = len(self.classes)
        self._counts = np.zeros((n, n), dtype=np.float64)

    @classmethod
    def fit(cls, texts, classes, alpha: float = 1.0) -> "CharBigramLM":
        lm = cls(classes, alpha=alpha)
        lm.update(texts)
        return lm

    def update(self, texts) -> "CharBigramLM":
        for text in texts:
            prev = 0  # start context
            for ch in text:
                idx = self.index.get(ch)
                if idx is None:
                    prev = 0
                    continue
                self._counts[prev, idx] += 1.0
                prev = idx
        return self

    def prob(self, c1: int, c2: int) -> float:
        """P(class c2 | class c1), Laplace smoothed."""
        row = self._counts[c1]
        return (row[c2] + self.alpha) / (row.sum() + self.alpha * len(row))

    def getCharBigram(self, c1: str, c2: str) -> float:
        """Reference-named surface (utils.py:881): character arguments; an
        empty/unknown ``c1`` means start-of-text."""
        i = self.index.get(c1, 0) if c1 else 0
        j = self.index.get(c2)
        if j is None:
            return self.alpha / (self._counts[0].sum() + self.alpha * len(self.classes))
        return self.prob(i, j)

    def log_matrix(self) -> np.ndarray:
        """(C, C) float32 ``log P(col | row)`` for the device decoder; row 0
        (blank) is the start-of-text context."""
        rows = self._counts + self.alpha
        return np.log(rows / rows.sum(axis=1, keepdims=True)).astype(np.float32)
