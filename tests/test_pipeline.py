"""End-to-end recognition parity: full pipeline vs reference get_text."""

import numpy as np
import pytest

from ocrfa_tpu import checkpoints
from ocrfa_tpu.decode import CTCLabelConverter
from ocrfa_tpu.pipeline import Recognizer, get_text

CHARSET = "abc d"


def _state_dict_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}


@pytest.fixture(scope="module")
def setup():
    import torch

    from tests.torch_replicas import Gen1Model

    torch.manual_seed(7)
    model = Gen1Model(num_class=len(CHARSET) + 1, output_channel=64, hidden_size=64).eval()
    params = checkpoints.convert_crnn_gen1(_state_dict_numpy(model))
    converter = CTCLabelConverter(CHARSET)
    recognizer = Recognizer(params, converter)
    return model, recognizer, converter


def _image_list(seed, n=3):
    rng = np.random.default_rng(seed)
    out = []
    y = 0
    for _ in range(n):
        w = int(rng.integers(80, 250))
        crop = rng.integers(0, 255, (64, w), dtype=np.uint8)
        box = [[0, y], [w, y], [w, y + 64], [0, y + 64]]
        out.append((box, crop))
        y += 70
    return out


class TestGetTextParity:
    @pytest.mark.parametrize("decoder", ["greedy", "beamsearch"])
    def test_matches_reference(self, ref_utils, setup, decoder):
        model, recognizer, converter = setup
        image_list = _image_list(21)
        max_width = 256  # covers all crops; multiple of 64 like the reference

        ref_converter = ref_utils.CTCLabelConverter(CHARSET)
        ref = ref_utils.get_text(
            CHARSET, 64, max_width, model, ref_converter, image_list,
            ignore_char="", decoder=decoder, beamWidth=5, batch_size=4,
            contrast_ths=0.1, adjust_contrast=0.5, workers=0, device="cpu",
        )
        ours = get_text(
            CHARSET, 64, max_width, recognizer, image_list,
            ignore_char="", decoder=decoder, beam_width=5,
            contrast_ths=0.1, adjust_contrast=0.5,
        )
        assert len(ours) == len(ref)
        for (obox, otext, oconf), (rbox, rtext, rconf) in zip(ours, ref):
            assert obox == rbox
            assert otext == rtext
            assert np.isclose(oconf, rconf, rtol=1e-2, atol=1e-3)

    def test_ignore_char(self, ref_utils, setup):
        model, recognizer, converter = setup
        image_list = _image_list(33, n=2)
        ref_converter = ref_utils.CTCLabelConverter(CHARSET)
        ignore = "bd"
        ref = ref_utils.get_text(
            CHARSET, 64, 256, model, ref_converter, image_list,
            ignore_char=ignore, decoder="greedy", batch_size=2, workers=0, device="cpu",
        )
        ours = get_text(CHARSET, 64, 256, recognizer, image_list, ignore_char=ignore)
        for o, r in zip(ours, ref):
            assert o[1] == r[1]
            for ch in ignore:
                assert ch not in o[1]

    def test_empty_image_list(self, setup):
        _, recognizer, _ = setup
        assert get_text(CHARSET, 64, 256, recognizer, []) == []


class TestGetTextParityExtras:
    def test_wordbeamsearch_with_dictionary(self, ref_utils, setup, tmp_path):
        model, recognizer, converter = setup
        # both converters need the same dictionary
        dict_file = tmp_path / "fa.txt"
        dict_file.write_text("ab\nabc\ncd\n", encoding="utf-8")
        from ocrfa_tpu.decode import CTCLabelConverter

        our_conv = CTCLabelConverter(CHARSET, {}, {"fa": str(dict_file)})
        ref_conv = ref_utils.CTCLabelConverter(CHARSET, {}, {"fa": str(dict_file)})
        # swap converters in place (params identical)
        old = recognizer.converter
        recognizer.converter = our_conv
        try:
            image_list = _image_list(55, n=2)
            ref = ref_utils.get_text(
                CHARSET, 64, 256, model, ref_conv, image_list,
                decoder="wordbeamsearch", beamWidth=4, batch_size=2,
                workers=0, device="cpu",
            )
            ours = get_text(CHARSET, 64, 256, recognizer, image_list,
                            decoder="wordbeamsearch", beam_width=4)
            for o, r in zip(ours, ref):
                assert o[1] == r[1]
        finally:
            recognizer.converter = old

    def test_contrast_second_pass_forced(self, ref_utils, setup):
        """contrast_ths=1.01 pushes every crop through the retry pass in
        both pipelines; outputs must still match."""
        model, recognizer, converter = setup
        ref_converter = ref_utils.CTCLabelConverter(CHARSET)
        image_list = _image_list(77, n=2)
        ref = ref_utils.get_text(
            CHARSET, 64, 256, model, ref_converter, image_list,
            decoder="greedy", batch_size=2, contrast_ths=1.01,
            adjust_contrast=0.5, workers=0, device="cpu",
        )
        ours = get_text(CHARSET, 64, 256, recognizer, image_list,
                        decoder="greedy", contrast_ths=1.01, adjust_contrast=0.5)
        for o, r in zip(ours, ref):
            assert o[1] == r[1]
            assert np.isclose(o[2], r[2], rtol=1e-2, atol=1e-3)
