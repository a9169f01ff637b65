"""Training data pipeline: synthetic Farsi line rendering + prefetching.

The reference's only data machinery is an inference-time
``ListDataset``/``DataLoader`` pair (utils.py:553-602, covered by
``preproc.host.align_collate``); it ships no training data path at all.
This module provides one:

* :class:`SyntheticFarsiLines` — renders charset glyph bitmaps into text-line
  images with CTC labels (RTL layout, random lengths/jitter).  Deterministic
  per seed; good for overfit checks, decoder smoke tests, and pretraining
  scaffolds until real corpora are mounted.
* :class:`FontLineRenderer` / :class:`MultiFontLineRenderer` — REAL shaped
  Farsi typography (PIL + libraqm HarfBuzz shaping: contextual letterforms,
  cursive joining, ligatures), single face or a deterministic per-line font
  mix; `rtl_letters` picks the charset subset that renders safely RTL.
* :class:`ShapedFarsiLines` — the two combined: shaped-typography batches
  with the ``SyntheticFarsiLines`` yield contract, so the CTC and TrOCR
  trainers consume synthetic or shaped sources interchangeably.
* :class:`Prefetcher` — a background-thread iterator that keeps N batches
  ready so the 1-core host's rendering overlaps device steps.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class SyntheticFarsiLines:
    """Deterministic synthetic line-image generator.

    Each character gets a fixed random glyph (height x glyph_w); lines are
    rendered right-to-left with optional jitter/contrast noise.  Yields
    batches ``(images (N,H,W,1) float32 in [-1,1], labels (N,L) int32,
    label_lengths (N,))``.
    """

    def __init__(self, charset: str, batch_size: int = 32, width: int = 256,
                 height: int = 64, glyph_w: int = 24, min_len: int = 2,
                 max_len: int | None = None, noise: float = 0.05, seed: int = 0,
                 font: dict | None = None):
        self.charset = charset
        self.batch_size = batch_size
        self.width = width
        self.height = height
        self.glyph_w = glyph_w
        self.min_len = min_len
        self.max_len = max_len or max(min_len + 1, width // glyph_w)
        self.noise = noise
        self._rng = np.random.default_rng(seed)
        # the font derives from the seed, so two datasets with different
        # seeds render DIFFERENT alphabets — a held-out eval set must share
        # the training font (pass font=train_ds.font) or it tests the model
        # on glyphs it has never seen
        if font is not None:
            self.font = font
        else:
            font_rng = np.random.default_rng(seed + 1)
            self.font = {
                c: (font_rng.random((height, glyph_w)) > 0.6).astype(np.float32)
                for c in charset
            }
        # CTC label ids: charset char i -> i + 1 (0 = blank)
        self.char_to_id = {c: i + 1 for i, c in enumerate(charset)}

    def render(self, text: str) -> np.ndarray:
        img = np.zeros((self.height, self.width), dtype=np.float32)
        for i, ch in enumerate(text):  # RTL: first char rightmost
            col = (len(text) - 1 - i) * self.glyph_w
            img[:, col:col + self.glyph_w] = self.font[ch]
        return img

    def batch(self):
        n = self.batch_size
        images = np.zeros((n, self.height, self.width, 1), dtype=np.float32)
        labels = np.zeros((n, self.max_len), dtype=np.int32)
        lengths = np.zeros((n,), dtype=np.int32)
        texts = []
        for i in range(n):
            length = int(self._rng.integers(self.min_len, self.max_len + 1))
            text = "".join(self._rng.choice(list(self.charset), size=length))
            glyphs = self.render(text)
            if self.noise:
                glyphs = np.clip(
                    glyphs + self._rng.normal(0, self.noise, glyphs.shape), 0, 1
                )
            # dark text on white, normalised like the inference path
            images[i, :, :, 0] = ((1.0 - glyphs) - 0.5) / 0.5
            # labels in VISUAL order (leftmost glyph first): the render is
            # RTL and CTC/readout alignment is monotonic along width, so
            # training targets are the reversed logical string (the model
            # emits visual order; get_display restores logical — the
            # reference's arabic convention, ocr.py:482-486).  ``texts``
            # stays logical; reverse it when scoring raw model output.
            labels[i, :length] = [self.char_to_id[c] for c in text[::-1]]
            lengths[i] = length
            texts.append(text)
        return images, labels, lengths, texts

    def __iter__(self):
        while True:
            yield self.batch()


class FontLineRenderer:
    """Shaped real-typography Farsi line renderer (PIL + libraqm).

    Unlike :class:`SyntheticFarsiLines` (per-character glyph stamps), this
    renders text through HarfBuzz shaping: contextual Arabic letterforms
    (initial/medial/final/isolated), cursive joining and required ligatures
    — i.e. what scanned Farsi actually looks like.  The reference pipeline
    consumes such scans at inference (ocr.py:504-582); this provides the
    training/eval-side source for them.

    Scope: pure right-to-left text only (Arabic-letter runs + spaces).  The
    CRNN emits characters in VISUAL order (leftmost glyph first) and
    `get_display` restores logical order (reference convention,
    ocr.py:482-486); for RTL-only text visual order is exactly the reversed
    logical string.  Mixed-direction content (digits, Latin) and combining
    marks would break that reversal invariant, so callers should restrict
    text to `bidirectional(c) == "AL"` characters plus spaces.

    Requires PIL built with libraqm (``ImageFont`` ``direction=`` support);
    raises at construction otherwise.
    """

    DEFAULT_FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
    BOLD_FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf"

    def __init__(self, font_path: str | None = None, height: int = 64,
                 margin: int = 6, bold: bool = False):
        from PIL import ImageFont, features

        if not features.check("raqm"):
            raise RuntimeError(
                "FontLineRenderer needs PIL built with libraqm for RTL "
                "shaping (PIL.features.check('raqm') is False)")
        if font_path is None:
            font_path = self.BOLD_FONT if bold else self.DEFAULT_FONT
        self.font_path = font_path
        self.height = height
        self.margin = margin
        # largest size whose ascent+descent fits the line height with a
        # little breathing room (glyphs must not clip: descenders carry
        # distinguishing dots in Arabic)
        size = height
        while size > 4:
            f = ImageFont.truetype(font_path, size)
            asc, desc = f.getmetrics()
            if asc + desc <= height - 2:
                break
            size -= 1
        self.font = f
        self.size = size
        self._y0 = (height - (f.getmetrics()[0] + f.getmetrics()[1])) // 2
        self._cmap = None

    def covers(self, text: str) -> bool:
        """True if the font's cmap maps every non-space character."""
        if self._cmap is None:
            try:
                from fontTools.ttLib import TTFont

                self._cmap = set(TTFont(self.font_path).getBestCmap())
            except Exception:
                self._cmap = set()
        if not self._cmap:
            return True  # no fontTools: optimistic (notdef boxes render)
        return all(ord(c) in self._cmap for c in text if not c.isspace())

    def measure(self, text: str) -> int:
        """Advance width in pixels of the shaped RTL run (no margins)."""
        if not text:
            return 0
        return int(np.ceil(self.font.getlength(text, direction="rtl")))

    def fit_text(self, text: str, max_w: int) -> str:
        """Longest logical prefix whose shaped width fits ``max_w``.

        Truncating the logical TAIL removes the LEFTMOST glyphs of an RTL
        render, so label and image stay consistent (the line still starts
        at its right edge)."""
        while text and self.measure(text) > max_w:
            text = text[:-1].rstrip()
        return text

    def render(self, text: str) -> np.ndarray:
        """Greyscale u8 crop (height, W): dark shaped text on white."""
        from PIL import Image, ImageDraw

        w = max(8, self.measure(text)) + 2 * self.margin
        img = Image.new("L", (w, self.height), 255)
        ImageDraw.Draw(img).text((self.margin, self._y0), text,
                                 font=self.font, fill=0, direction="rtl")
        return np.asarray(img, dtype=np.uint8)


class MultiFontLineRenderer:
    """Deterministic per-line font mixing over several renderers.

    Each text line routes to one underlying :class:`FontLineRenderer` keyed
    by its FIRST character, so ``measure``/``fit_text``/``render`` stay
    consistent for the same line even after ``fit_text`` truncates the tail
    (truncation keeps the prefix).  Training over a font mix (e.g. DejaVu
    Sans regular + bold) forces glyph-shape robustness instead of
    single-face template matching.
    """

    def __init__(self, renderers):
        self.renderers = list(renderers)
        if not self.renderers:
            raise ValueError("need at least one renderer")
        heights = {r.height for r in self.renderers}
        if len(heights) != 1:
            raise ValueError(f"renderer heights differ: {heights}")
        self.height = self.renderers[0].height
        self.margin = self.renderers[0].margin

    def _pick(self, text: str):
        return self.renderers[ord(text[0]) % len(self.renderers)
                              if text else 0]

    def covers(self, text: str) -> bool:
        return all(r.covers(text) for r in self.renderers)

    def measure(self, text: str) -> int:
        return self._pick(text).measure(text)

    def fit_text(self, text: str, max_w: int) -> str:
        return self._pick(text).fit_text(text, max_w)

    def render(self, text: str) -> np.ndarray:
        return self._pick(text).render(text)


class ShapedFarsiLines:
    """:class:`SyntheticFarsiLines`-compatible batches rendered with REAL
    shaped typography (:class:`FontLineRenderer`): contextual Arabic
    letterforms, cursive joining, optional per-line Sans/Bold mix.

    Same yield contract — ``(images (N,H,W,1) float32 in [-1,1], labels
    (N,L) int32 in VISUAL order, lengths (N,), texts logical)`` — so the
    CTC and TrOCR trainers consume either source unchanged.  Text is
    sampled from the charset's renderable RTL-letter subset with
    interior-only spaces (word-gap structure; see
    ``eval_farsi.sample_texts`` for why the white runs are load-bearing),
    and labels index the FULL charset so trained heads stay compatible
    with the production converter.
    """

    def __init__(self, charset: str, batch_size: int = 32, width: int = 256,
                 height: int = 64, min_len: int = 2, max_len: int = 9,
                 seed: int = 0, font_mix: bool = True, jitter: bool = True,
                 augment=None):
        """``augment``: optional ``(crop_u8, rng) -> crop_u8`` hook applied
        to each rendered line before jitter — e.g. the production
        detection-crop transform (margins + tilt + 4-point warp +
        height-normalise) that closes the render->deployment domain gap."""
        renderer = FontLineRenderer(height=height)
        if font_mix:
            renderer = MultiFontLineRenderer(
                [renderer, FontLineRenderer(height=height, bold=True)])
        self.renderer = renderer
        self.charset = charset
        self.text_charset = "".join(
            c for c in rtl_letters(charset)
            if not c.isspace() and renderer.covers(c))
        if not self.text_charset:
            raise ValueError("charset has no renderable RTL letters")
        self.batch_size = batch_size
        self.width = width
        self.height = height
        self.min_len = min_len
        self.max_len = max_len
        self.jitter = jitter
        self.augment = augment
        self._rng = np.random.default_rng(seed)
        self.char_to_id = {c: i + 1 for i, c in enumerate(charset)}

    def _sample_text(self, r) -> str:
        length = int(r.integers(self.min_len, self.max_len + 1))
        chars = list(r.choice(list(self.text_charset), size=length))
        if length >= 4 and " " in self.charset and r.random() < 0.7:
            chars[int(r.integers(1, length - 1))] = " "  # interior word gap
        return "".join(chars)

    def batch(self):
        n, r = self.batch_size, self._rng
        images = np.full((n, self.height, self.width, 1), 255, np.uint8)
        labels = np.zeros((n, self.max_len), np.int32)
        lengths = np.zeros((n,), np.int32)
        texts = []
        for i in range(n):
            t = self.renderer.fit_text(self._sample_text(r), self.width - 12)
            crop = self.renderer.render(t)
            if self.augment is not None:
                crop = self.augment(crop, r)
            crop = crop.astype(np.float32)
            if self.jitter:
                # contrast + noise + x-shift: break image-hash memorization
                crop = 127.5 + (crop - 127.5) * (0.55 + 0.45 * r.random())
                crop += r.normal(0.0, 10.0, crop.shape)
                pad = int(r.integers(0, 10))
                crop = np.concatenate(
                    [np.full((crop.shape[0], pad), 255.0), crop], axis=1)
                crop = np.clip(crop, 0, 255)
            crop = crop[:, :self.width]
            images[i, :, :crop.shape[1], 0] = crop.astype(np.uint8)
            ids = [self.char_to_id[c] for c in t[::-1]]  # visual order
            labels[i, :len(ids)] = ids
            lengths[i] = len(ids)
            texts.append(t)
        norm = ((images.astype(np.float32) / 255.0) - 0.5) / 0.5
        return norm, labels, lengths, texts

    def __iter__(self):
        while True:
            yield self.batch()


def rtl_letters(charset: str) -> str:
    """The subset of ``charset`` safe for :class:`FontLineRenderer` text:
    Arabic-letter (bidi class AL) characters plus the space, excluding
    combining marks/digits/Latin (which would break the visual-order =
    reversed-logical invariant — see the class docstring)."""
    import unicodedata

    keep = [c for c in charset if unicodedata.bidirectional(c) == "AL"]
    if " " in charset:
        keep.append(" ")
    return "".join(keep)


class Prefetcher:
    """Background-thread batch prefetch (depth-bounded queue).

    Wraps any batch iterator so host-side rendering/augmentation overlaps
    device steps — the role the reference's ``DataLoader(num_workers=...)``
    plays (utils.py:728-730), without torch.
    """

    def __init__(self, iterator, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def worker():
            for item in iterator:
                if self._stop.is_set():
                    break
                self._queue.put(item)
            self._queue.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so the worker can observe the stop flag
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
