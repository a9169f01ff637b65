"""Word n-gram LM: stupid-backoff math, host rescoring, device fusion.

Extends the reference's dictionary machinery (equal-weight words,
utils.py:853-872/1124-1173) with in-context word probabilities; no
reference counterpart exists, so these are spec tests.
"""

import numpy as np
import pytest

from ocrfa_tpu.decode.beam_device import ctc_beam_search_device
from ocrfa_tpu.decode.lexicon import LexiconTrie
from ocrfa_tpu.decode.lm import WordNGramLM

CLASSES = ["[blank]", "a", "b", "c", " "]
SEP = 4


def ids_of(text):
    return [CLASSES.index(ch) for ch in text]


def peaked_logprobs(rows_spec):
    """(1, T, C) log-probs from a list of {class_id: prob} rows (remaining
    mass spread over the other classes)."""
    mat = np.zeros((len(rows_spec), len(CLASSES)))
    for t, spec in enumerate(rows_spec):
        rest = (1.0 - sum(spec.values())) / (len(CLASSES) - len(spec))
        mat[t] = rest
        for cid, p in spec.items():
            mat[t, cid] = p
    return np.log(np.maximum(mat, 1e-9))[None]


def top1(result):
    prefixes, lengths, _ = result
    ids = np.asarray(prefixes)[0, 0, : int(lengths[0, 0])]
    return "".join(CLASSES[i] for i in ids)


class TestWordNGramLM:
    def test_bigram_probability_is_count_ratio(self):
        lm = WordNGramLM.fit(["ab ac", "ab ac", "ab ab"],
                             vocab=["ab", "ac"], order=2)
        i_ab, i_ac = 0, 1
        # after 'ab': ac twice, ab once (the bigram 'ab ab' once)
        assert lm.logprob(i_ac, (i_ab,)) == pytest.approx(np.log(2 / 3))
        assert lm.logprob(i_ab, (i_ab,)) == pytest.approx(np.log(1 / 3))

    def test_backoff_to_unigram(self):
        lm = WordNGramLM.fit(["ab ac"], vocab=["ab", "ac"], order=2,
                             alpha=0.5, backoff=0.4)
        # context 'ac' never precedes anything -> backoff * Laplace unigram
        uni_ab = (1 + 0.5) / (2 + 0.5 * 3)  # counts: ab=1, ac=1; V+unk=3
        assert lm.logprob(0, (1,)) == pytest.approx(np.log(0.4) + np.log(uni_ab))

    def test_bos_context_counted(self):
        lm = WordNGramLM.fit(["ab ac", "ab ac"], vocab=["ab", "ac"], order=2)
        # line starts: P(ab | <s>) = 1 exactly (both lines start with ab)
        assert lm.logprob(0, (lm.bos_idx,)) == pytest.approx(0.0)

    def test_trigram_beats_bigram_context(self):
        # corpus where the bigram is ambiguous but the trigram is not:
        # 'ab ac' is followed by 'ab', 'ac ac' by 'ac'
        lm = WordNGramLM.fit(["ab ac ab", "ac ac ac"],
                             vocab=["ab", "ac"], order=3)
        assert lm.logprob(0, (0, 1)) == pytest.approx(0.0)   # ab | ab ac
        assert lm.logprob(1, (1, 1)) == pytest.approx(0.0)   # ac | ac ac

    def test_score_sums_word_logprobs(self):
        lm = WordNGramLM.fit(["ab ac", "ab ab"], vocab=["ab", "ac"], order=2)
        expect = lm.logprob(0, (lm.bos_idx,)) + lm.logprob(1, (0,))
        assert lm.score("ab ac") == pytest.approx(expect)

    def test_rescore_reranks_by_fused_score(self):
        lm = WordNGramLM.fit(["ab ac"] * 5, vocab=["ab", "ac"], order=2)
        # acoustically 'ab ab' leads by 0.1 but the LM strongly prefers
        # 'ab ac'; a large weight must flip the order
        cands = [("ab ab", -1.0), ("ab ac", -1.1)]
        assert lm.rescore(cands, lm_weight=0.0)[0][0] == "ab ab"
        assert lm.rescore(cands, lm_weight=2.0)[0][0] == "ab ac"

    def test_bigram_log_matrix_layout(self):
        lm = WordNGramLM.fit(["ab ac", "ab ab"], vocab=["ab", "ac"], order=2)
        m = lm.bigram_log_matrix()
        assert m.shape == (4, 4)  # V=2 words + <s> + <unk>
        # seen bigrams are exact count ratios
        assert m[0, 1] == pytest.approx(np.log(1 / 2))   # ac | ab
        assert m[0, 0] == pytest.approx(np.log(1 / 2))   # ab | ab
        assert m[lm.bos_idx, 0] == pytest.approx(0.0)    # ab | <s>
        # unseen context rows fall back to backoff * unigram, matching
        # the host scorer
        assert m[1, 0] == pytest.approx(lm.logprob(0, (1,)), abs=1e-6)

    def test_unknown_words_score_as_unk(self):
        lm = WordNGramLM.fit(["ab zz", "ab zz"], vocab=["ab"], order=2)
        # 'zz' is OOV: counted as <unk> after 'ab'
        assert lm.logprob(lm.unk_idx, (0,)) == pytest.approx(0.0)


class TestTrieWordIds:
    def test_word_id_maps_terminal_nodes(self):
        trie = LexiconTrie(["ab", "abc", "ca"], CLASSES)
        assert trie.words == ["ab", "abc", "ca"]
        for wid, word in enumerate(trie.words):
            node, is_word = trie.lookup(ids_of(word))
            assert is_word
            assert trie.word_id[node] == wid
        # non-terminal nodes carry -1
        node, _ = trie.lookup(ids_of("a"))
        assert trie.word_id[node] == -1

    def test_duplicate_words_deduplicate(self):
        trie = LexiconTrie(["ab", "ab", "ca"], CLASSES)
        assert trie.num_words == 2
        assert trie.words == ["ab", "ca"]


class TestDeviceWordLMFusion:
    # acoustics: clear "ab", separator, second word ambiguous 'b'/'c'
    # exactly tied, then a closing separator (the fusion scores a word
    # when its separator is consumed)
    AMBIG = [
        {1: 0.97},          # a
        {2: 0.97},          # b
        {4: 0.97},          # ' '
        {1: 0.97},          # a
        {2: 0.485, 3: 0.485},  # b/c exact tie
        {4: 0.97},          # ' '
    ]

    def _decode(self, lm_texts):
        trie = LexiconTrie(["ab", "ac"], CLASSES)
        lm = WordNGramLM.fit(lm_texts, vocab=trie.words, order=2)
        return top1(ctc_beam_search_device(
            peaked_logprobs(self.AMBIG), beam_width=8, topk=4,
            trie_trans=trie.trans, trie_word=trie.is_word, sep_idx=SEP,
            oov_penalty=-2.0, trie_word_id=trie.word_id,
            word_lm_log=lm.bigram_log_matrix(), word_lm_factor=1.0))

    def test_context_breaks_acoustic_tie(self):
        assert self._decode(["ab ab"] * 8 + ["ac"]) == "ab ab "
        assert self._decode(["ab ac"] * 8 + ["ab"]) == "ab ac "

    def test_zero_factor_matches_trie_only(self):
        trie = LexiconTrie(["ab", "ac"], CLASSES)
        lm = WordNGramLM.fit(["ab ab"] * 4, vocab=trie.words, order=2)
        logp = peaked_logprobs(self.AMBIG)
        kw = dict(beam_width=8, topk=4, trie_trans=trie.trans,
                  trie_word=trie.is_word, sep_idx=SEP, oov_penalty=-2.0)
        plain = ctc_beam_search_device(logp, **kw)
        fused = ctc_beam_search_device(
            logp, trie_word_id=trie.word_id,
            word_lm_log=lm.bigram_log_matrix(), word_lm_factor=0.0, **kw)
        np.testing.assert_allclose(np.asarray(plain[2]), np.asarray(fused[2]),
                                   rtol=1e-5)

    def test_requires_trie(self):
        lm = WordNGramLM.fit(["ab"], vocab=["ab"], order=2)
        with pytest.raises(ValueError, match="lexicon trie"):
            ctc_beam_search_device(
                peaked_logprobs(self.AMBIG),
                word_lm_log=lm.bigram_log_matrix())

    def test_decode_defaults_reach_facade_path(self):
        """set_decode_defaults makes the fusion decoder usable through the
        reference-shaped get_text call chain (which can only pass
        decoder=/beamWidth=)."""
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer, get_text

        chars = "abc "
        conv = CTCLabelConverter(chars)
        params = init_crnn_gen1(jax.random.PRNGKey(0),
                                num_class=conv.num_classes,
                                output_channel=32, hidden_size=32)
        trie = LexiconTrie(["ab", "ac"], conv.character)
        lm = WordNGramLM.fit(["ab ac"], vocab=trie.words, order=2)
        rec = Recognizer(params, conv).set_decode_defaults(
            lexicon=trie, word_lm=lm, oov_penalty=-2.0, beam_width=4)
        crop = (np.random.default_rng(0).integers(0, 255, (64, 96))
                .astype(np.uint8))
        out = get_text(chars, 64, 128, rec,
                       [([[0, 0], [96, 0], [96, 64], [0, 64]], crop)],
                       decoder="wordbeamsearch_fast")
        assert len(out) == 1 and isinstance(out[0][1], str)

        with pytest.raises(TypeError, match="unknown decode defaults"):
            rec.set_decode_defaults(beem_width=4)

    def test_pipeline_vocab_mismatch_raises(self):
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer

        conv = CTCLabelConverter("abc ")
        params = init_crnn_gen1(jax.random.PRNGKey(0),
                                num_class=conv.num_classes,
                                output_channel=32, hidden_size=32)
        rec = Recognizer(params, conv)
        trie = LexiconTrie(["ab"], ["[blank]"] + list("abc "))
        lm = WordNGramLM.fit(["ab"], vocab=["ab", "stray"], order=2)
        batch = np.zeros((1, 64, 64, 1), np.float32)
        with pytest.raises(ValueError, match="vocabulary"):
            rec.predict(batch, keep_mask_for(conv.num_classes, conv.ignore_idx),
                        decoder="wordbeamsearch_fast", lexicon=trie,
                        word_lm=lm)
