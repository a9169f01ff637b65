"""Dense-array lexicon trie for on-device beam-search word fusion.

The reference constrains beams with a dictionary in two host-side ways:
``wordsearch`` re-ranks finished beams against ``dict_list``
(``/root/reference/src/ocrfa/utils.py:853-872``) and
``decode_wordbeamsearch`` runs a per-word beam over space-split segments
(``utils.py:1124-1173``).  Both are Python loops over strings.  The
TPU-native equivalent walks the dictionary *inside* the decode scan: the
lexicon is compiled once into two dense arrays

* ``trans``: (nodes, C) int32 — trie transition table over CTC class
  indices, ``-1`` where no dictionary word continues with that character;
* ``is_word``: (nodes,) bool — whether the node completes a word;
* ``word_id``: (nodes,) int32 — index into :attr:`words` at word-completing
  nodes (``-1`` elsewhere), the hook a word-level LM scores through
  (:meth:`ocrfa_tpu.decode.lm.WordNGramLM.bigram_log_matrix`);

and every beam tracks its current node, so scoring an extension is one
(B, K) gather — no strings, no host sync.  See
:func:`ocrfa_tpu.decode.beam_device.ctc_beam_search_device`'s ``lexicon``
argument for the fusion semantics (soft OOV penalty / word bonus).
"""

from __future__ import annotations

import numpy as np


class LexiconTrie:
    """Trie over CTC class indices, stored as dense numpy arrays.

    Args:
      words: iterable of dictionary words.
      classes: the converter's class list (index 0 = CTC blank); characters
        of ``words`` are mapped through it, words containing characters
        outside the charset are skipped (the reference's dictionary load
        silently tolerates mismatches too, utils.py:1066-1073).
      sep: the in-word separator handling — words are stored as written;
        split multi-word dictionary entries upstream if needed.
    """

    def __init__(self, words, classes):
        index = {c: i for i, c in enumerate(classes)}
        children: list[dict[int, int]] = [{}]
        terminal = [False]
        word_ids = [-1]
        self.words: list[str] = []
        for word in words:
            ids = [index.get(ch) for ch in word]
            if not ids or any(i is None or i == 0 for i in ids):
                continue
            node = 0
            for cid in ids:
                nxt = children[node].get(cid)
                if nxt is None:
                    nxt = len(children)
                    children[node][cid] = nxt
                    children.append({})
                    terminal.append(False)
                    word_ids.append(-1)
                node = nxt
            if not terminal[node]:  # first sighting names the id
                terminal[node] = True
                word_ids[node] = len(self.words)
                self.words.append(word)

        n, c = len(children), len(classes)
        self.trans = np.full((n, c), -1, dtype=np.int32)
        for node, kids in enumerate(children):
            for cid, nxt in kids.items():
                self.trans[node, cid] = nxt
        self.is_word = np.asarray(terminal, dtype=bool)
        self.word_id = np.asarray(word_ids, dtype=np.int32)
        self.num_words = len(self.words)
        self.num_nodes = n

    @classmethod
    def from_texts(cls, texts, classes, min_count: int = 1) -> "LexiconTrie":
        """Build from running text: whitespace-tokenize and keep words seen
        at least ``min_count`` times."""
        from collections import Counter

        counts = Counter(w for t in texts for w in t.split())
        return cls((w for w, k in counts.items() if k >= min_count), classes)

    def lookup(self, ids) -> tuple[int, bool]:
        """Walk class-index sequence ``ids``; returns (node, is_word) with
        node ``-1`` once the walk leaves the trie.  Host-side helper for
        tests and re-ranking."""
        node = 0
        for cid in ids:
            if node < 0:
                return -1, False
            node = int(self.trans[node, cid])
        return node, bool(node >= 0 and self.is_word[node])
