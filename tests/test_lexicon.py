"""Lexicon trie + device-beam dictionary fusion."""

import numpy as np
import pytest

from ocrfa_tpu.decode.beam_device import ctc_beam_search_device
from ocrfa_tpu.decode.lexicon import LexiconTrie

CLASSES = ["[blank]", "a", "b", "c", " "]
SEP = 4


def ids_of(text):
    return [CLASSES.index(ch) for ch in text]


def peaked_logprobs(text, t_per_char=2, eps=0.04):
    """Near-deterministic (T, C) log-probs whose greedy collapse is `text`
    (blank-separated so repeats survive collapsing)."""
    rows = []
    for cid in ids_of(text):
        for _ in range(t_per_char):
            rows.append(cid)
        rows.append(0)
    mat = np.full((len(rows), len(CLASSES)), eps / (len(CLASSES) - 1))
    for t, cid in enumerate(rows):
        mat[t, cid] = 1.0 - eps
    return np.log(mat / mat.sum(axis=1, keepdims=True))[None]


def top1(result):
    prefixes, lengths, _ = result
    ids = np.asarray(prefixes)[0, 0, : int(lengths[0, 0])]
    return "".join(CLASSES[i] for i in ids)


class TestLexiconTrie:
    def test_build_and_lookup(self):
        trie = LexiconTrie(["ab", "abc", "ca"], CLASSES)
        assert trie.num_words == 3
        assert trie.lookup(ids_of("ab")) == (trie.lookup(ids_of("ab"))[0], True)
        assert trie.lookup(ids_of("abc"))[1] is True
        assert trie.lookup(ids_of("a"))[1] is False
        assert trie.lookup(ids_of("b"))[0] == -1      # no word starts with b
        assert trie.lookup(ids_of("abca"))[0] == -1   # walked off

    def test_words_outside_charset_skipped(self):
        trie = LexiconTrie(["ab", "xyz", ""], CLASSES)
        assert trie.num_words == 1

    def test_from_texts_min_count(self):
        trie = LexiconTrie.from_texts(["ab ca ab", "ca b"], CLASSES,
                                      min_count=2)
        assert trie.num_words == 2  # 'ab' and 'ca'; 'b' seen once

    def test_transition_table_shape(self):
        trie = LexiconTrie(["abc"], CLASSES)
        assert trie.trans.shape == (trie.num_nodes, len(CLASSES))
        assert trie.is_word.shape == (trie.num_nodes,)
        # root -> a -> b -> c chain, only the last terminal
        node = 0
        for cid in ids_of("abc"):
            node = trie.trans[node, cid]
            assert node >= 0
        assert trie.is_word[node]


class TestDeviceLexiconFusion:
    def test_penalty_flips_near_tie_to_dictionary_word(self):
        # acoustics slightly prefer the OOV "ac"; lexicon knows only "ab"
        mat = np.full((3, len(CLASSES)), 1e-3)
        mat[0, 1] = 0.95                       # 'a'
        mat[1, 0] = 0.9
        mat[2, 2], mat[2, 3] = 0.47, 0.53      # 'b' vs 'c' near-tie
        logp = np.log(mat / mat.sum(axis=1, keepdims=True))[None]
        trie = LexiconTrie(["ab"], CLASSES)

        free = top1(ctc_beam_search_device(logp, beam_width=8, topk=4))
        assert free == "ac"
        fused = top1(ctc_beam_search_device(
            logp, beam_width=8, topk=4,
            trie_trans=trie.trans, trie_word=trie.is_word, sep_idx=SEP,
            oov_penalty=-2.0))
        assert fused == "ab"

    def test_penalty_does_not_override_clear_acoustics(self):
        logp = peaked_logprobs("ac")
        trie = LexiconTrie(["ab"], CLASSES)
        fused = top1(ctc_beam_search_device(
            logp, beam_width=8, topk=4,
            trie_trans=trie.trans, trie_word=trie.is_word, sep_idx=SEP,
            oov_penalty=-2.0))
        assert fused == "ac"

    def test_zero_penalty_is_noop(self):
        rng = np.random.default_rng(0)
        mat = rng.random((6, len(CLASSES)))
        logp = np.log(mat / mat.sum(axis=1, keepdims=True))[None]
        trie = LexiconTrie(["ab", "ca"], CLASSES)
        free = ctc_beam_search_device(logp, beam_width=8, topk=4)
        fused = ctc_beam_search_device(
            logp, beam_width=8, topk=4,
            trie_trans=trie.trans, trie_word=trie.is_word, sep_idx=SEP,
            oov_penalty=0.0, word_bonus=0.0)
        np.testing.assert_array_equal(np.asarray(free[0]), np.asarray(fused[0]))
        np.testing.assert_allclose(np.asarray(free[2]), np.asarray(fused[2]),
                                   rtol=1e-5)

    def test_separator_restarts_walk(self):
        # "ab ab" with both words in the lexicon scores clean; the same
        # acoustics with lexicon ["ac"] pay OOV at both words
        logp = peaked_logprobs("ab ab")
        good = LexiconTrie(["ab"], CLASSES)
        bad = LexiconTrie(["ac"], CLASSES)
        kw = dict(beam_width=8, topk=4, sep_idx=SEP, oov_penalty=-1.0)
        _, _, s_good = ctc_beam_search_device(
            logp, trie_trans=good.trans, trie_word=good.is_word, **kw)
        _, _, s_bad = ctc_beam_search_device(
            logp, trie_trans=bad.trans, trie_word=bad.is_word, **kw)
        # same top-1 text (clear acoustics) but the in-lexicon score is
        # higher by ~ the per-word penalties
        assert float(s_good[0, 0]) > float(s_bad[0, 0]) + 1.5

    def test_word_bonus_rewards_completed_words(self):
        logp = peaked_logprobs("ab ")
        trie = LexiconTrie(["ab"], CLASSES)
        kw = dict(beam_width=8, topk=4, sep_idx=SEP, oov_penalty=-1.0)
        _, _, s_plain = ctc_beam_search_device(
            logp, trie_trans=trie.trans, trie_word=trie.is_word,
            word_bonus=0.0, **kw)
        _, _, s_bonus = ctc_beam_search_device(
            logp, trie_trans=trie.trans, trie_word=trie.is_word,
            word_bonus=0.5, **kw)
        assert float(s_bonus[0, 0]) == pytest.approx(
            float(s_plain[0, 0]) + 0.5, abs=1e-4)
