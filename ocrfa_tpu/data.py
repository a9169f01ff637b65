"""Training data pipeline: synthetic Farsi line rendering + prefetching.

The reference's only data machinery is an inference-time
``ListDataset``/``DataLoader`` pair (utils.py:553-602, covered by
``preproc.host.align_collate``); it ships no training data path at all.
This module provides one:

* :class:`SyntheticFarsiLines` — renders charset glyph bitmaps into text-line
  images with CTC labels (RTL layout, random lengths/jitter).  Deterministic
  per seed; good for overfit checks, decoder smoke tests, and pretraining
  scaffolds until real corpora are mounted.
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
