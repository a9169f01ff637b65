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


class WordNGramLM:
    """Backoff word n-gram model over a fixed vocabulary.

    Goes beyond the reference's dictionary machinery (``wordsearch`` edit-
    distance re-ranking and per-word dictionary beams,
    ``/root/reference/src/ocrfa/utils.py:853-872, 1124-1173``): instead of
    treating every dictionary word as equally likely, completed words are
    scored in context, ``log P(w_i | w_{i-n+1..i-1})``, with stupid-backoff
    (Brants et al. 2007 — no normalisation across orders, which is standard
    for decode-time fusion) down through shorter contexts to a Laplace
    unigram.

    Two consumption paths:

    * :meth:`bigram_log_matrix` — dense ``(V+2, V+2)`` float32 table for
      the on-device beam (shallow fusion at word separators inside the
      scan; see :func:`~ocrfa_tpu.decode.beam_device.ctc_beam_search_device`
      ``word_lm_log``).  Row/col layout: ``0..V-1`` vocabulary words in
      ``vocab`` order, ``V`` = start-of-line context ``<s>`` (row only),
      ``V+1`` = ``<unk>``.
    * :meth:`logprob` / :meth:`score` / :meth:`rescore` — host-side scoring
      of finished beams at arbitrary order ``n``.

    Vocabulary order matters for the device path: build the LM with
    ``vocab=trie.words`` so word ids line up with
    :attr:`~ocrfa_tpu.decode.lexicon.LexiconTrie.word_id`.
    """

    BOS = "<s>"
    UNK = "<unk>"

    def __init__(self, vocab, order: int = 2, alpha: float = 0.5,
                 backoff: float = 0.4):
        if order < 1:
            raise ValueError("order must be >= 1")
        self.vocab = list(vocab)
        self.order = int(order)
        self.alpha = float(alpha)
        self.backoff = float(backoff)
        self.index = {w: i for i, w in enumerate(self.vocab)}
        v = len(self.vocab)
        self.bos_idx = v
        self.unk_idx = v + 1
        # counts[k] maps a length-k context tuple -> {word_id: count};
        # k=0 holds the unigram counts under the empty tuple
        self._counts: list[dict] = [dict() for _ in range(self.order)]
        self._totals: list[dict] = [dict() for _ in range(self.order)]

    def _wid(self, w: str) -> int:
        return self.index.get(w, self.unk_idx)

    @classmethod
    def fit(cls, texts, vocab, order: int = 2, alpha: float = 0.5,
            backoff: float = 0.4) -> "WordNGramLM":
        return cls(vocab, order=order, alpha=alpha, backoff=backoff).update(texts)

    def update(self, texts) -> "WordNGramLM":
        for text in texts:
            ids = [self._wid(w) for w in text.split()]
            if not ids:
                continue
            for i, wid in enumerate(ids):
                for k in range(self.order):
                    if k > i:
                        # line start: pad the deepest context with BOS once
                        # (standard sentence-start convention)
                        ctx = (self.bos_idx,) * (k - i) + tuple(ids[:i])
                    else:
                        ctx = tuple(ids[i - k:i])
                    bucket = self._counts[k].setdefault(ctx, {})
                    bucket[wid] = bucket.get(wid, 0) + 1
                    self._totals[k][ctx] = self._totals[k].get(ctx, 0) + 1
        return self

    def logprob(self, wid: int, ctx: tuple) -> float:
        """Stupid-backoff ``log P(wid | ctx)`` over word ids; ``ctx`` is the
        preceding word-id tuple (longest first, trimmed to order-1)."""
        ctx = tuple(ctx)[-(self.order - 1):] if self.order > 1 else ()
        penalty = 0.0
        for k in range(len(ctx), 0, -1):
            c = ctx[len(ctx) - k:]
            bucket = self._counts[k].get(c)
            if bucket and wid in bucket:
                return penalty + float(
                    np.log(bucket[wid] / self._totals[k][c]))
            penalty += float(np.log(self.backoff))
        uni = self._counts[0].get((), {})
        total = self._totals[0].get((), 0)
        v = len(self.vocab) + 1  # + <unk>
        return penalty + float(np.log(
            (uni.get(wid, 0) + self.alpha) / (total + self.alpha * v)))

    def score(self, text: str) -> float:
        """Total stupid-backoff log probability of a whitespace-tokenized
        line (BOS-padded, no end-of-sentence token)."""
        ids = [self._wid(w) for w in text.split()]
        ctx = (self.bos_idx,) * (self.order - 1)
        total = 0.0
        for wid in ids:
            total += self.logprob(wid, ctx)
            ctx = (ctx + (wid,))[-(self.order - 1):] if self.order > 1 else ()
        return total

    def rescore(self, candidates, lm_weight: float = 0.5,
                length_bonus: float = 0.0):
        """Re-rank finished beams: ``(text, acoustic_logp)`` pairs ->
        best-first list of ``(text, fused_score)`` with
        ``fused = acoustic + lm_weight * lm + length_bonus * n_words``
        (the length bonus counters the LM's per-word cost, standard
        shallow-fusion practice)."""
        fused = [
            (t, a + lm_weight * self.score(t) + length_bonus * len(t.split()))
            for t, a in candidates
        ]
        return sorted(fused, key=lambda p: -p[1])

    def bigram_log_matrix(self) -> np.ndarray:
        """Dense ``(V+2, V+2)`` float32 ``log P(col | row)`` for device
        fusion (order clamped to 2 — deeper contexts would need a per-beam
        tuple, which the host :meth:`rescore` path covers).  Rows ``V``
        (``<s>``) and ``V+1`` (``<unk>``) are contexts; column ``V`` is
        never predicted and holds the unigram floor."""
        v = len(self.vocab)
        uni = self._counts[0].get((), {})
        total = self._totals[0].get((), 0)
        uni_row = np.array(
            [uni.get(w, 0) for w in range(v + 2)], dtype=np.float64)
        uni_row[self.bos_idx] = 0.0
        uni_log = np.log((uni_row + self.alpha)
                         / (total + self.alpha * (v + 1)))
        out = np.tile(np.log(self.backoff) + uni_log, (v + 2, 1))
        if self.order >= 2:
            for ctx, bucket in self._counts[1].items():
                row = ctx[0]
                t = self._totals[1][ctx]
                for wid, c in bucket.items():
                    out[row, wid] = np.log(c / t)
        return out.astype(np.float32)
