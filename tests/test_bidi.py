"""Tests for the UAX#9 bidi display reordering (python-bidi replacement)."""

from ocrfa_tpu.utils.bidi import get_display


class TestGetDisplay:
    def test_pure_ltr_unchanged(self):
        assert get_display("hello world") == "hello world"
        assert get_display("abc 123") == "abc 123"

    def test_pure_rtl_reversed(self):
        # logical order 'سلام' displays right-to-left
        assert get_display("سلام") == "مالس"

    def test_rtl_words_swap_order(self):
        # two RTL words: word order and letters both reverse
        assert get_display("اب جد") == "دج با"

    def test_digits_stay_ltr_inside_rtl(self):
        # European digits form an LTR run inside the RTL context
        out = get_display("اب 123")
        assert out == "123 با"

    def test_arabic_indic_digits(self):
        out = get_display("اب ۱۲۳")
        # AN digits keep logical order within the RTL line
        assert out == "۱۲۳ با"

    def test_mixed_base_ltr(self):
        # first strong char L -> base LTR, RTL run reversed in place
        assert get_display("abc اب def") == "abc با def"

    def test_mirroring_parens_in_rtl(self):
        out = get_display("اب (جد)")
        # parens mirror on RTL levels
        assert out == "(دج) با"

    def test_empty_and_neutral(self):
        assert get_display("") == ""
        assert get_display("   ") == "   "
        assert get_display("123") == "123"

    def test_base_dir_override(self):
        assert get_display("abc", base_dir="R") == "abc"

    def test_trailing_whitespace_resets(self):
        # trailing space stays at the (RTL) line end
        assert get_display("اب ") == " با"


class TestGetDisplayEdgeCases:
    def test_mixed_numbers_punct(self):
        # "price: 25٪" style mixes resolve without crashing, digits LTR
        out = get_display("اب: 25")
        assert "25" in out

    def test_explicit_rlo_reverses_latin(self):
        # RLO forces right-to-left display of latin letters
        out = get_display("‮abc‬")
        assert out == "cba"

    def test_explicit_lro_preserves(self):
        out = get_display("‭abc‬")
        assert out == "abc"

    def test_nsm_attaches_to_base(self):
        # combining marks (Farsi diacritics) stay with their base letter
        text = "بَا"  # beh + fatha + alef
        out = get_display(text)
        assert set(out) == set(text)
        # the mark reverses with the run, staying adjacent to its base
        # (renderers attach it; python-bidi behaves the same way)
        assert abs(out.index("َ") - out.index("ب")) == 1

    def test_long_rtl_roundtrip(self):
        text = "سلام دنیا از تست"
        out = get_display(text)
        # reversing the visual string word-wise reproduces logical order
        assert set(out) == set(text)
        assert out.split(" ")[::-1] == [w[::-1] for w in text.split(" ")]


class TestGetDisplayProperties:
    def test_multiset_preserved_on_charset(self):
        """For any recognizer-output string, display reordering must keep
        exactly the same characters (no formatting codes in the charset)."""
        import numpy as np

        from ocrfa_tpu.registry import RECOGNITION_MODELS

        from ocrfa_tpu.utils.bidi import _MIRRORED

        def canon(text):
            # L4 mirrors brackets on RTL runs (e.g. '[' -> ']'); compare
            # modulo mirror pairs
            return sorted(min(c, _MIRRORED.get(c, c)) for c in text)

        chars = list(RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"])
        rng = np.random.default_rng(0)
        for _ in range(100):
            n = int(rng.integers(0, 30))
            s = "".join(rng.choice(chars, size=n))
            out = get_display(s)
            assert canon(out) == canon(s)

    def test_deterministic(self):
        s = "اب 12 cd «اب»"
        assert get_display(s) == get_display(s)

    def test_idempotent_on_ltr(self):
        # pure-LTR strings are fixed points
        for s in ("hello", "a1b2", "...", ""):
            assert get_display(get_display(s)) == get_display(s)
