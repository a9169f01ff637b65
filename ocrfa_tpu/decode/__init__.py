"""CTC decoding: label converter, host beam search, and on-device decoders."""

from ocrfa_tpu.decode.converter import CTCLabelConverter
from ocrfa_tpu.decode.beam import ctc_beam_search
from ocrfa_tpu.decode.lexicon import LexiconTrie
from ocrfa_tpu.decode.lm import CharBigramLM, WordNGramLM
from ocrfa_tpu.decode.segmentation import consecutive, word_segmentation

__all__ = [
    "CTCLabelConverter",
    "CharBigramLM",
    "LexiconTrie",
    "WordNGramLM",
    "ctc_beam_search",
    "consecutive",
    "word_segmentation",
]
