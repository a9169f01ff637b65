"""Character <-> CTC-index conversion and batch decoding front-ends.

Parity target: ``CTCLabelConverter`` in the reference
(``/root/reference/src/ocrfa/utils.py:1041-1173``).  Index 0 is the CTC
blank; character ``i`` of the charset maps to index ``i + 1``.

Unlike the reference, ``encode`` returns numpy arrays (no torch), and the
decode front-ends accept numpy arrays directly; the greedy path is fully
vectorised and also available on-device (:mod:`ocrfa_tpu.decode.device`).
"""

from __future__ import annotations

import numpy as np

from ocrfa_tpu.decode.beam import ctc_beam_search
from ocrfa_tpu.decode.segmentation import word_segmentation


class CTCLabelConverter:
    """Convert between text labels and CTC index sequences."""

    def __init__(self, character, separator_list=None, dict_pathlist=None):
        separator_list = separator_list or {}
        dict_pathlist = dict_pathlist or {}

        chars = list(character)
        self.dict = {ch: i + 1 for i, ch in enumerate(chars)}
        self.character = ["[blank]"] + chars

        self.separator_list = separator_list
        separator_char = [c for sep in separator_list.values() for c in sep]
        self.ignore_idx = [0] + [i + 1 for i, _ in enumerate(separator_char)]

        # Per-language dictionaries for word-beam-search.  Missing files are
        # silently skipped in the flat case (utils.py:1068-1073).
        if len(separator_list) == 0:
            dict_list = []
            for _, dict_path in dict_pathlist.items():
                try:
                    with open(dict_path, encoding="utf-8-sig") as f:
                        dict_list += f.read().splitlines()
                except OSError:
                    pass
        else:
            dict_list = {}
            for lang, dict_path in dict_pathlist.items():
                with open(dict_path, encoding="utf-8-sig") as f:
                    dict_list[lang] = f.read().splitlines()
        self.dict_list = dict_list

    @property
    def num_classes(self) -> int:
        return len(self.character)

    def encode(self, text, batch_max_length: int = 25):
        """Text labels -> (concatenated indices, per-label lengths)."""
        lengths = np.array([len(s) for s in text], dtype=np.int32)
        joined = "".join(text)
        indices = np.array([self.dict[ch] for ch in joined], dtype=np.int32)
        return indices, lengths

    def decode_greedy(self, text_index, length):
        """Collapse repeats, drop ignored indices, map to characters.

        ``text_index`` is the flat concatenation of per-sample argmax paths,
        ``length`` the per-sample lengths (utils.py:1099-1115).
        """
        text_index = np.asarray(text_index)
        chars = np.array(self.character)
        ignore = np.array(self.ignore_idx)
        texts = []
        index = 0
        for l in length:
            t = text_index[index:index + l]
            not_repeated = np.insert(t[1:] != t[:-1], 0, True)
            not_ignored = ~np.isin(t, ignore)
            keep = not_repeated & not_ignored
            texts.append("".join(chars[t[keep]]))
            index += l
        return texts

    def decode_beamsearch(self, mat, beamWidth: int = 5):
        """Per-row prefix beam search over a ``(N, T, C)`` batch."""
        return [
            ctc_beam_search(mat[i], self.character, self.ignore_idx, beam_width=beamWidth)
            for i in range(mat.shape[0])
        ]

    def decode_wordbeamsearch(self, mat, beamWidth: int = 5):
        """Beam-search each word span independently (utils.py:1124-1173).

        Without separators, words are maximal runs where the argmax path is
        not the space character; each run is decoded with the flat
        dictionary.  With separators, spans come from
        :func:`word_segmentation` and use per-language dictionaries.
        """
        texts = []
        argmax = np.argmax(mat, axis=2)

        for i in range(mat.shape[0]):
            string = ""
            if len(self.separator_list) == 0:
                space_idx = self.dict[" "]
                data = np.argwhere(argmax[i] != space_idx).flatten()
                groups = np.split(data, np.where(np.diff(data) != 1)[0] + 1)
                groups = [list(g) for g in groups if len(g) > 0]

                for j, span in enumerate(groups):
                    t = ctc_beam_search(
                        mat[i, span, :], self.character, self.ignore_idx,
                        beam_width=beamWidth, dict_list=self.dict_list,
                    )
                    string += t if j == 0 else " " + t
            else:
                words = word_segmentation(argmax[i])
                for word in words:
                    matrix = mat[i, word[1][0]:word[1][1] + 1, :]
                    dict_list = self.dict_list[word[0]] if word[0] else []
                    string += ctc_beam_search(
                        matrix, self.character, self.ignore_idx,
                        beam_width=beamWidth, dict_list=dict_list,
                    )
            texts.append(string)
        return texts
