"""Tests for the evaluation metrics."""

from ocrfa_tpu.eval import cer, exact_match_rate, levenshtein, wer


class TestMetrics:
    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "abc") == 0
        assert levenshtein(["a", "b"], ["a", "c", "b"]) == 1

    def test_cer(self):
        assert cer(["abc"], ["abc"]) == 0.0
        assert cer(["abd"], ["abc"]) == 1 / 3
        assert cer(["ab", "cd"], ["ab", "ce"]) == 1 / 4

    def test_wer(self):
        assert wer(["the cat sat"], ["the cat sat"]) == 0.0
        assert wer(["the dog sat"], ["the cat sat"]) == 1 / 3

    def test_exact_match(self):
        assert exact_match_rate(["a", "b"], ["a", "c"]) == 0.5
        assert exact_match_rate([], []) == 1.0

    def test_farsi(self):
        assert cer(["سلام"], ["سلام"]) == 0.0
        assert cer(["سلاح"], ["سلام"]) == 0.25
