"""Unicode Bidirectional Algorithm (UAX #9) display reordering.

Replaces the ``python-bidi`` dependency the reference imports
(``/root/reference/src/ocrfa/ocr.py:30``; applied per recognized string at
ocr.py:474-478) with a self-contained implementation of the classic UBA:
base-level detection (P2-P3), explicit embeddings (X1-X9), weak-type
resolution (W1-W7), neutral resolution (N1-N2), implicit levels (I1-I2),
and reordering with mirroring (L1-L4).

Isolate controls (LRI/RLI/FSI/PDI, Unicode 6.3+) are treated as removed
formatting characters — same simplification as python-bidi 0.4.x, which is
what the reference's behavior is defined by.
"""

from __future__ import annotations

import unicodedata

# Explicit formatting codes
_LRE, _RLE, _PDF, _LRO, _RLO = "‪", "‫", "‬", "‭", "‮"
_EXPLICIT = {_LRE, _RLE, _PDF, _LRO, _RLO}
_MAX_DEPTH = 62

# L4 mirroring pairs (BidiMirroring.txt subset covering the recognizer
# charsets: ASCII brackets, guillemets, common math).
_MIRRORED = {
    "(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{",
    "<": ">", ">": "<", "«": "»", "»": "«",
    "‹": "›", "›": "‹",
    "⁅": "⁆", "⁆": "⁅",
    "⁽": "⁾", "⁾": "⁽",
    "₍": "₎", "₎": "₍",
    "≤": "≥", "≥": "≤",
}


def _bidi_type(ch: str) -> str:
    return unicodedata.bidirectional(ch) or "L"


def _base_level(text: str, upper_is_rtl: bool = False) -> int:
    """P2/P3: first strong character decides the paragraph level."""
    for ch in text:
        t = _bidi_type(ch)
        if t in ("R", "AL"):
            return 1
        if t == "L":
            return 0
    return 0


def _least_greater_odd(x: int) -> int:
    return x + 1 if x % 2 == 0 else x + 2


def _least_greater_even(x: int) -> int:
    return x + 2 if x % 2 == 0 else x + 1


def get_display(text: str, base_dir: str | None = None) -> str:
    """Return the display-ordered form of ``text`` (python-bidi parity)."""
    if not text:
        return text

    if base_dir is None:
        base = _base_level(text)
    else:
        base = 1 if base_dir == "R" else 0

    # X1-X9: explicit embeddings/overrides; embedding chars removed (X9)
    chars = []  # (ch, level, type)
    level = base
    override = ""
    stack = []
    for ch in text:
        if ch == _RLE or ch == _RLO:
            new_level = _least_greater_odd(level)
            if new_level <= _MAX_DEPTH and len(stack) < _MAX_DEPTH:
                stack.append((level, override))
                level = new_level
                override = "R" if ch == _RLO else ""
            continue
        if ch == _LRE or ch == _LRO:
            new_level = _least_greater_even(level)
            if new_level <= _MAX_DEPTH and len(stack) < _MAX_DEPTH:
                stack.append((level, override))
                level = new_level
                override = "L" if ch == _LRO else ""
            continue
        if ch == _PDF:
            if stack:
                level, override = stack.pop()
            continue
        t = _bidi_type(ch)
        if t == "BN" or "⁦" <= ch <= "⁩":
            continue  # removed formatting characters
        chars.append([ch, level, override or t])

    if not chars:
        return ""

    sor_type = "R" if max(base, chars[0][1]) % 2 else "L"
    eor_type = "R" if max(base, chars[-1][1]) % 2 else "L"

    # W1-W7 weak-type resolution
    prev_strong = sor_type
    prev_type = sor_type
    for c in chars:
        t = c[2]
        if t == "NSM":  # W1
            c[2] = t = prev_type
        if t == "EN" and prev_strong == "AL":  # W2
            c[2] = t = "AN"
        if t == "AL":  # W3
            c[2] = t = "R"
        if t in ("R", "L", "AL"):
            prev_strong = t
        prev_type = c[2]

    # W4: single ES between ENs -> EN; single CS between ENs/ANs -> that type
    for i in range(1, len(chars) - 1):
        t, before, after = chars[i][2], chars[i - 1][2], chars[i + 1][2]
        if t == "ES" and before == after == "EN":
            chars[i][2] = "EN"
        elif t == "CS" and before == after and before in ("EN", "AN"):
            chars[i][2] = before

    # W5: ET adjacent to EN -> EN
    for i, c in enumerate(chars):
        if c[2] == "ET":
            j = i
            while j >= 0 and chars[j][2] == "ET":
                j -= 1
            if j >= 0 and chars[j][2] == "EN":
                c[2] = "EN"
                continue
            j = i
            while j < len(chars) and chars[j][2] == "ET":
                j += 1
            if j < len(chars) and chars[j][2] == "EN":
                c[2] = "EN"

    # W6: remaining separators/terminators -> ON
    for c in chars:
        if c[2] in ("ET", "ES", "CS"):
            c[2] = "ON"

    # W7: EN after L -> L
    prev_strong = sor_type
    for c in chars:
        if c[2] == "EN" and prev_strong == "L":
            c[2] = "L"
        if c[2] in ("L", "R"):
            prev_strong = c[2]

    # N1-N2 neutral resolution
    _NEUTRAL = {"B", "S", "WS", "ON"}
    i = 0
    n = len(chars)
    while i < n:
        if chars[i][2] in _NEUTRAL:
            j = i
            while j < n and chars[j][2] in _NEUTRAL:
                j += 1
            before = chars[i - 1][2] if i > 0 else sor_type
            after = chars[j][2] if j < n else eor_type
            if before in ("EN", "AN"):
                before = "R"
            if after in ("EN", "AN"):
                after = "R"
            if before == after and before in ("L", "R"):
                fill = before  # N1
            else:
                fill = "R" if base % 2 else "L"  # N2: embedding direction
            for k in range(i, j):
                chars[k][2] = fill
            i = j
        else:
            i += 1

    # I1-I2 implicit levels
    for c in chars:
        t = c[2]
        if c[1] % 2 == 0:  # even (LTR) level
            if t == "R":
                c[1] += 1
            elif t in ("AN", "EN"):
                c[1] += 2
        else:  # odd (RTL) level
            if t in ("L", "AN", "EN"):
                c[1] += 1

    # L1: trailing whitespace (and S/B separators) reset to base level
    orig_types = [_bidi_type(c[0]) for c in chars]
    i = len(chars) - 1
    while i >= 0 and orig_types[i] in ("WS", "B", "S"):
        chars[i][1] = base
        i -= 1
    for i, ot in enumerate(orig_types):
        if ot in ("B", "S"):
            chars[i][1] = base
            j = i - 1
            while j >= 0 and orig_types[j] == "WS":
                chars[j][1] = base
                j -= 1

    # L4: mirror glyphs on RTL-resolved levels
    for c in chars:
        if c[1] % 2 and unicodedata.mirrored(c[0]):
            c[0] = _MIRRORED.get(c[0], c[0])

    # L2: reverse runs from the highest level down to the lowest odd level
    levels = [c[1] for c in chars]
    highest = max(levels)
    lowest_odd = min((l for l in levels if l % 2), default=highest + 1)
    for lev in range(highest, lowest_odd - 1, -1):
        i = 0
        while i < len(chars):
            if chars[i][1] >= lev:
                j = i
                while j < len(chars) and chars[j][1] >= lev:
                    j += 1
                chars[i:j] = chars[i:j][::-1]
                i = j
            else:
                i += 1

    return "".join(c[0] for c in chars)
