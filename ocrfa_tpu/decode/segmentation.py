"""Word segmentation of argmax CTC paths for word-beam-search.

Parity targets: ``consecutive`` and ``word_segmentation`` in the reference
(``/root/reference/src/ocrfa/utils.py:773-820``).
"""

from __future__ import annotations

import numpy as np


def consecutive(data, mode: str = "first", stepsize: int = 1):
    """First/last element of each run of consecutive values (utils.py:773-782)."""
    data = np.asarray(data)
    groups = np.split(data, np.where(np.diff(data) != stepsize)[0] + 1)
    groups = [g for g in groups if len(g) > 0]
    if mode == "first":
        return [g[0] for g in groups]
    if mode == "last":
        return [g[-1] for g in groups]
    return None


def word_segmentation(mat, separator_idx=None, separator_idx_list=None):
    """Split an argmax index sequence at language separator tokens.

    Returns ``[[lang, [start, end]], ...]`` spans (utils.py:785-820).
    """
    if separator_idx_list is None:
        separator_idx_list = [1, 2, 3, 4]
    if separator_idx is None:
        separator_idx = {"th": [1, 2], "en": [3, 4]}

    mat = np.asarray(mat)
    sep_list = []
    for sep_idx in separator_idx_list:
        mode = "first" if sep_idx % 2 == 0 else "last"
        positions = consecutive(np.argwhere(mat == sep_idx).flatten(), mode)
        sep_list += [[pos, sep_idx] for pos in positions]
    sep_list.sort(key=lambda x: x[0])

    result = []
    start_idx = 0
    sep_lang = ""
    sep_start_idx = None
    for sep in sep_list:
        for lang in separator_idx:
            if sep[1] == separator_idx[lang][0]:  # language-start token
                sep_lang = lang
                sep_start_idx = sep[0]
            elif sep[1] == separator_idx[lang][1]:  # language-end token
                if sep_lang == lang:
                    new_sep_pair = [lang, [sep_start_idx + 1, sep[0] - 1]]
                    if sep_start_idx > start_idx:
                        result.append(["", [start_idx, sep_start_idx - 1]])
                    start_idx = sep[0] + 1
                    result.append(new_sep_pair)
                sep_lang = ""

    if start_idx <= len(mat) - 1:
        result.append(["", [start_idx, len(mat) - 1]])
    return result
