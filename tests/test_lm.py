"""Character bigram LM + beam-search shallow fusion (host and device)."""

import numpy as np
import pytest

from ocrfa_tpu.decode.beam import ctc_beam_search
from ocrfa_tpu.decode.lm import CharBigramLM

CLASSES = ["[blank]", "a", "b", "c"]


class TestCharBigramLM:
    def test_rows_are_distributions(self):
        lm = CharBigramLM.fit(["abc", "ab", "aab"], CLASSES)
        mat = np.exp(lm.log_matrix())
        np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-6)

    def test_fit_counts(self):
        lm = CharBigramLM.fit(["ab", "ab", "ac"], CLASSES)
        # after 'a': b seen twice, c once
        assert lm.prob(1, 2) > lm.prob(1, 3) > lm.prob(1, 1)

    def test_reference_named_surface(self):
        lm = CharBigramLM.fit(["ba", "bb"], CLASSES)
        # start context: 'b' starts both texts
        assert lm.getCharBigram("", "b") > lm.getCharBigram("", "a")
        # unknown chars fall back to a smoothed floor, no crash
        assert 0.0 < lm.getCharBigram("x", "y") < 1.0

    def test_unknown_char_resets_context(self):
        lm = CharBigramLM.fit(["aXb"], CLASSES)
        # 'X' is outside the charset: 'b' counts as start-context, not after-a
        assert lm.prob(0, 2) > lm.prob(1, 2)


def _two_way_matrix(p_a):
    """T=2: step 0 splits mass between 'a' and 'b', step 1 is blank."""
    mat = np.zeros((2, 4), dtype=np.float64)
    mat[0, 1] = p_a
    mat[0, 2] = 1.0 - p_a
    mat[1, 0] = 1.0
    return mat


class TestHostBeamLM:
    def test_lm_flips_near_tie(self):
        mat = _two_way_matrix(0.505)  # acoustically 'a' barely wins
        no_lm = ctc_beam_search(mat, CLASSES, ignore_idx=(0,))
        assert no_lm == "a"
        lm = CharBigramLM.fit(["b"] * 50 + ["a"], CLASSES)
        # the reference's length normalisation (p_text ** 1/len, blanks
        # included) dilutes the default 0.01 factor; 0.05 shows the flip
        with_lm = ctc_beam_search(mat, CLASSES, ignore_idx=(0,), lm=lm,
                                  lm_factor=0.05)
        assert with_lm == "b"

    def test_lm_does_not_override_clear_acoustics(self):
        mat = _two_way_matrix(0.9)
        lm = CharBigramLM.fit(["b"] * 50, CLASSES)
        assert ctc_beam_search(mat, CLASSES, ignore_idx=(0,), lm=lm) == "a"


class TestDeviceBeamLM:
    def test_lm_flips_near_tie_device(self):
        import jax.numpy as jnp

        from ocrfa_tpu.decode.beam_device import (
            ctc_beam_search_device,
            decode_beams_to_text,
        )

        mat = np.log(np.maximum(_two_way_matrix(0.55), 1e-9))[None]
        logp = jnp.asarray(mat, jnp.float32)

        pref, lens, _ = ctc_beam_search_device(logp, beam_width=4, topk=3)
        assert decode_beams_to_text(pref, lens, CLASSES) == ["a"]

        lm = CharBigramLM.fit(["b"] * 50 + ["a"], CLASSES)
        lm_log = jnp.asarray(lm.log_matrix())
        pref, lens, _ = ctc_beam_search_device(
            logp, beam_width=4, topk=3, lm_log=lm_log, lm_factor=0.5)
        assert decode_beams_to_text(pref, lens, CLASSES) == ["b"]

    def test_lm_neutral_matrix_is_noop(self):
        import jax.numpy as jnp

        from ocrfa_tpu.decode.beam_device import (
            ctc_beam_search_device,
            decode_beams_to_text,
        )

        rng = np.random.default_rng(0)
        probs = rng.random((2, 6, 4)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        logp = jnp.asarray(np.log(probs))
        base_p, base_l, _ = ctc_beam_search_device(logp, beam_width=4, topk=3)
        uniform = jnp.zeros((4, 4), jnp.float32)  # constant bias per step
        got_p, got_l, _ = ctc_beam_search_device(
            logp, beam_width=4, topk=3, lm_log=uniform, lm_factor=0.7)
        assert (decode_beams_to_text(base_p, base_l, CLASSES)
                == decode_beams_to_text(got_p, got_l, CLASSES))
