"""CTC prefix beam search (host implementation).

Behavioral parity target: ``ctcBeamSearch`` and its helpers in the reference
(``/root/reference/src/ocrfa/utils.py:824-1038``).  Key semantics that must be
preserved for character-identical output:

* Beams are keyed by a *simplified* labeling in which redundant blanks are
  collapsed incrementally (``fast_simplify_label``, utils.py:904-940).
* At each step only characters with ``p[t, c] >= 0.5 / num_classes`` are
  expanded (utils.py:997).
* Beams are ranked by ``p_total * p_text`` where ``p_text`` is a (currently
  inert) LM score, length-normalised at the end (utils.py:841-851).
* Final text drops ignored indices and collapses *adjacent equal labels* in
  the winning labeling (utils.py:1032-1035).

The host implementation exists for parity testing and for the
word-beam-search dictionary re-ranking path; the high-throughput path is the
on-device decoder in :mod:`ocrfa_tpu.decode.device`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

BLANK = 0


@dataclass
class _Beam:
    """Probability state for one labeling at the current time step."""

    p_blank: float = 0.0
    p_non_blank: float = 0.0
    p_total: float = 0.0
    p_text: float = 1.0
    labeling: tuple = ()
    lm_applied: bool = False


def simplify_label(labeling: tuple, blank: int = BLANK) -> tuple:
    """Collapse redundant blanks in a labeling (utils.py:886-901 semantics).

    Repeated blanks collapse to one; a blank *between two different
    characters* is dropped; a trailing element is always kept.
    """
    lab = np.asarray(labeling)
    if lab.size == 0:
        return ()

    keep = ~((np.roll(lab, 1) == lab) & (lab == blank))
    lab = lab[keep]

    keep = ~((np.roll(lab, 1) != np.roll(lab, -1)) & (lab == blank))
    idx = np.where(keep)[0]
    if lab.size > 0:
        last = lab.size - 1
        if last not in idx:
            idx = np.append(idx, [last])
    return tuple(lab[idx])


def fast_simplify_label(labeling: tuple, c: int, blank: int = BLANK) -> tuple:
    """Incrementally extend a simplified labeling by one symbol.

    Mirrors the case analysis of the reference ``fast_simplify_label``
    (utils.py:904-940): appending a blank after a non-blank keeps it; a
    character after a blank keeps the blank only if it separates a repeat of
    the same character; consecutive blanks are dropped; a leading blank is
    dropped.
    """
    if labeling:
        tail = labeling[-1]
        if c == blank:
            return labeling + (c,) if tail != blank else labeling
        if tail == blank:
            # blank separates a repeat -> keep it; otherwise drop the blank
            return labeling + (c,) if labeling[-2] == c else labeling[:-1] + (c,)
        return labeling + (c,)
    return () if c == blank else (c,)


def _ranked(beams: dict) -> list:
    return sorted(beams.values(), reverse=True, key=lambda b: b.p_total * b.p_text)


def _collapse_text(labeling, classes, ignore_idx) -> str:
    out = []
    prev = None
    for i, l in enumerate(labeling):
        if l not in ignore_idx and not (i > 0 and prev == l):
            out.append(classes[l])
        prev = l
    return "".join(out)


def ctc_beam_search(
    mat: np.ndarray,
    classes: list,
    ignore_idx,
    beam_width: int = 25,
    dict_list=(),
    max_candidates: int = 20,
    lm=None,
    lm_factor: float = 0.01,
) -> str:
    """Decode a ``(T, C)`` probability matrix to text via prefix beam search.

    Parity with ``ctcBeamSearch`` (utils.py:949-1038); ``dict_list`` enables
    the dictionary re-ranking used by word-beam-search (utils.py:853-872).

    ``lm`` activates the reference's dormant ``applyLM`` slot
    (utils.py:875-883): each beam extension multiplies ``p_text`` by
    ``lm.getCharBigram(prev_char, new_char) ** lm_factor`` once, and scores
    are length-normalised at the end.  Any object with that method works —
    see :class:`ocrfa_tpu.decode.lm.CharBigramLM`.
    """
    max_t, max_c = mat.shape
    prune = 0.5 / max_c

    last: dict = {(): _Beam(p_blank=1.0, p_total=1.0)}

    for t in range(max_t):
        curr: dict = {}
        row = mat[t]
        candidates = np.where(row >= prune)[0]

        for beam in _ranked(last)[:beam_width]:
            labeling = beam.labeling

            # paths ending in a repeat of the last char
            p_non_blank = beam.p_non_blank * row[labeling[-1]] if labeling else 0.0
            # paths ending in a blank
            p_blank = beam.p_total * row[BLANK]

            entry = curr.get(labeling)
            if entry is None:
                entry = curr[labeling] = _Beam(labeling=labeling)
            entry.p_non_blank += p_non_blank
            entry.p_blank += p_blank
            entry.p_total += p_blank + p_non_blank
            entry.p_text = beam.p_text

            for c in candidates:
                new_labeling = fast_simplify_label(labeling, int(c))
                if labeling and labeling[-1] == c:
                    p_nb = row[c] * beam.p_blank
                else:
                    p_nb = row[c] * beam.p_total

                new_entry = curr.get(new_labeling)
                if new_entry is None:
                    new_entry = curr[new_labeling] = _Beam(labeling=new_labeling)
                new_entry.p_non_blank += p_nb
                new_entry.p_total += p_nb
                if lm is not None and not new_entry.lm_applied:
                    # applyLM contract (utils.py:875-883): child inherits the
                    # parent text score times the bigram prob of the new char;
                    # blank extensions just carry the parent score forward
                    if c != BLANK:
                        prev_c = (classes[labeling[-1]]
                                  if labeling and labeling[-1] != BLANK else "")
                        new_entry.p_text = (
                            beam.p_text
                            * lm.getCharBigram(prev_c, classes[int(c)]) ** lm_factor)
                    else:
                        new_entry.p_text = beam.p_text
                    new_entry.lm_applied = True

        last = curr

    # length-normalise LM scores (utils.py:841-845)
    for beam in last.values():
        n = len(beam.labeling)
        beam.p_text = beam.p_text ** (1.0 / (n if n else 1.0))

    ranked = _ranked(last)
    if not len(dict_list):
        return _collapse_text(ranked[0].labeling, classes, ignore_idx)

    # dictionary re-ranking: first in-dictionary candidate wins, else top-1
    best_text = None
    for j, beam in enumerate(ranked[:max_candidates]):
        text = _collapse_text(beam.labeling, classes, ignore_idx)
        if j == 0:
            best_text = text
        if text in dict_list:
            return text
    return best_text
