"""Lexicon-fusion decode eval: does the device-beam dictionary help?

Trains the production-scale gen1 CRNN on word-structured synthetic Farsi
(1-2 words per line from a fixed vocabulary), then evaluates on *degraded*
held-out renders (noise + contrast squeeze) and compares decoders:

* ``greedy`` — the reference's production decode;
* ``beamsearch_fast`` — on-device prefix beam (no prior);
* ``wordbeamsearch_fast`` — same beam with the training vocabulary walked
  as a dense trie inside the scan (decode/lexicon.py), over a small OOV
  penalty sweep;
* ``wordbeamsearch_fast + word LM`` — trie fusion plus in-context word
  scoring (decode/lm.py WordNGramLM): device bigram shallow fusion at
  separators, and host stupid-backoff rescoring of the full beam list.

Lines are drawn from a word-bigram MARKOV CHAIN (each word strongly
prefers 3 successors), so word context carries real signal the
equal-weight dictionary cannot see.

The claims under test: when acoustics degrade, dictionary fusion recovers
characters the acoustic-only decoders miss — the device analog of the
reference's ``decode_wordbeamsearch`` dictionaries (utils.py:1124-1173) —
and context-aware word probabilities recover more than the dictionary
alone (no reference counterpart).

Usage:
  python scripts/eval_lexicon.py [--steps 3000] [--eval-lines 256] [--small]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np

from eval_farsi import make_font, render_crop, train_gen1  # noqa: E402


def degrade(crop, rng, noise=35.0, contrast=0.45):
    """Scanner abuse: contrast squeeze toward grey + additive noise."""
    x = crop.astype(np.float32)
    x = 128.0 + (x - 128.0) * contrast
    x = x + rng.normal(0.0, noise, x.shape)
    return np.clip(x, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--train-pool", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval-lines", type=int, default=256)
    ap.add_argument("--vocab", type=int, default=250)
    ap.add_argument("--noise", type=float, default=35.0)
    ap.add_argument("--contrast", type=float, default=0.45)
    ap.add_argument("--beam-width", type=int, default=8)
    ap.add_argument("--small", action="store_true",
                    help="64-ch model + tiny charset (CPU smoke)")
    ap.add_argument("--realfont", action="store_true",
                    help="shaped DejaVu typography instead of glyph stamps")
    ap.add_argument("--font-mix", action="store_true",
                    help="with --realfont: mix regular + bold per line")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.decode.lexicon import LexiconTrie
    from ocrfa_tpu.eval import cer
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.registry import RECOGNITION_MODELS

    glyph_w = 24
    if args.small:
        charset = "ابتثجچحخد "
        oc = hs = 64
        args.vocab = min(args.vocab, 24)
    else:
        charset = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
        oc = hs = 512
    assert " " in charset

    # fixed word vocabulary over the Arabic block of the charset
    rng = np.random.default_rng(7)
    renderer = None
    if args.realfont:
        from ocrfa_tpu.data import (FontLineRenderer, MultiFontLineRenderer,
                                    rtl_letters)

        renderer = FontLineRenderer(height=64)
        if args.font_mix:
            renderer = MultiFontLineRenderer(
                [renderer, FontLineRenderer(height=64, bold=True)])
        letters = [c for c in rtl_letters(charset)
                   if c != " " and renderer.covers(c)]
    else:
        letters = [c for c in charset
                   if c.isalpha() and ("؀" <= c <= "ۿ" or args.small)]
    vocab = set()
    while len(vocab) < args.vocab:
        vocab.add("".join(rng.choice(letters,
                                     size=rng.integers(3, 7))))
    vocab = sorted(vocab)

    # word-bigram Markov chain: each word routes 90% of its successor mass
    # to 3 fixed words — the context signal the word LM can exploit
    successors = {w: rng.choice(vocab, size=3, replace=False) for w in vocab}

    def words_sampler(r, n):
        lines = []
        for _ in range(n):
            w = str(r.choice(vocab))
            ws = [w]
            for _ in range(int(r.integers(0, 2))):
                w = (str(r.choice(successors[w])) if r.random() < 0.9
                     else str(r.choice(vocab)))
                ws.append(w)
            lines.append(" ".join(ws))
        return lines

    def short_sampler(r, n):
        # curriculum warmup: half 1-3 char fragments (CTC alignment
        # lock-in), half single vocabulary words (bridges to the 7-13 char
        # two-word pool lines — without this middle rung the jump stalls
        # around loss ~20)
        return [("".join(r.choice(letters, size=r.integers(1, 4)))
                 if r.random() < 0.5 else str(r.choice(vocab)))
                for _ in range(n)]

    def train_augment(crop, r):
        # random degradation spanning the eval condition: without this the
        # model only ever sees binary pixels and collapses on noisy scans.
        # ~35% of crops stay clean — with every crop degraded the CTC
        # alignment lock-in stalls (loss plateaus ~24); clean examples
        # anchor it while the noisy ones buy robustness
        if r.random() < 0.35:
            return crop
        return degrade(crop, r, noise=float(r.uniform(0.0, args.noise * 1.2)),
                       contrast=float(r.uniform(args.contrast * 0.9, 1.0)))

    params, conv, font, loss, calib = train_gen1(
        charset, steps=args.steps, train_pool=args.train_pool,
        batch=args.batch, oc=oc, hs=hs, glyph_w=glyph_w,
        short_sampler=short_sampler, pool_sampler=words_sampler,
        augment=train_augment, renderer=renderer)

    # ---- degraded held-out eval set ---------------------------------------
    erng = np.random.default_rng(99)
    eval_texts = words_sampler(erng, args.eval_lines)
    eval_visual = [t[::-1] for t in eval_texts]  # model emits visual order
    crops = [degrade(renderer.render(t) if renderer is not None
                     else render_crop(t, font, glyph_w, margin=6), erng,
                     noise=args.noise, contrast=args.contrast)
             for t in eval_texts]
    width = -(-max(c.shape[1] for c in crops) // 64) * 64
    batch = np.full((len(crops), 64, width, 1), 255, np.uint8)
    for i, c in enumerate(crops):
        batch[i, :, :c.shape[1], 0] = c

    recognizer = Recognizer(params, conv)
    keep = keep_mask_for(conv.num_classes, conv.ignore_idx)

    # the beam walks emission (visual) order, so the trie stores each
    # vocabulary word reversed
    trie = LexiconTrie([w[::-1] for w in vocab], conv.character)
    assert trie.num_words == len(vocab)

    def run(decoder, **kw):
        t0 = time.time()
        out = recognizer.predict(batch, keep, decoder=decoder,
                                 beam_width=args.beam_width, **kw)
        dt = time.time() - t0
        texts = [t for t, _ in out]
        return {
            "cer": round(cer(texts, eval_visual), 6),
            "exact": round(float(np.mean(
                [a == b for a, b in zip(texts, eval_visual)])), 4),
            "seconds": round(dt, 2),
        }

    results = {
        "greedy": run("greedy"),
        "beamsearch_fast": run("beamsearch_fast"),
    }
    for pen in (-1.0, -2.0, -4.0):
        results[f"wordbeamsearch_fast(oov={pen:g})"] = run(
            "wordbeamsearch_fast", lexicon=trie, oov_penalty=pen)

    # ---- word-LM fusion: the LM sees the same Markov statistics the
    # corpus is drawn from (fit on a fresh 20k-line sample, VISUAL order to
    # match emissions — both word chars and word order reverse under RTL)
    from ocrfa_tpu.decode.lm import WordNGramLM

    lm_rng = np.random.default_rng(4242)
    lm = WordNGramLM.fit((t[::-1] for t in words_sampler(lm_rng, 20000)),
                         vocab=trie.words, order=2)
    for f in (0.5, 1.0):
        results[f"wordbeamsearch_fast+wordlm(f={f:g})"] = run(
            "wordbeamsearch_fast", lexicon=trie, oov_penalty=-4.0,
            word_lm=lm, word_lm_factor=f)

    # host rescoring closes the device gap on the final (unterminated)
    # word: rescore the full beam list with the same LM
    t0 = time.time()
    beams = recognizer.predict(batch, keep, decoder="wordbeamsearch_fast",
                               beam_width=args.beam_width, lexicon=trie,
                               oov_penalty=-4.0, return_beams=True)
    texts = [lm.rescore(bs, lm_weight=1.0)[0][0] if bs else ""
             for bs in beams]
    results["wordbeamsearch_fast+rescore(w=1)"] = {
        "cer": round(cer(texts, eval_visual), 6),
        "exact": round(float(np.mean(
            [a == b for a, b in zip(texts, eval_visual)])), 4),
        "seconds": round(time.time() - t0, 2),
    }

    metrics = {
        "model": f"gen1 {oc}/{hs}, {len(charset)}-char charset",
        "text_source": (("shaped DejaVu Sans"
                         + (" +Bold mix" if args.font_mix else ""))
                        if args.realfont else "blob glyph stamps"),
        "train_steps": args.steps,
        "final_ctc_loss": round(float(loss), 4),
        "vocab_words": len(vocab),
        "eval_lines": len(eval_texts),
        "degradation": {"noise_sigma": args.noise,
                        "contrast": args.contrast},
        "beam_width": args.beam_width,
        "decoders": results,
    }
    print(json.dumps(metrics, ensure_ascii=False, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, ensure_ascii=False,
                                             indent=2))


if __name__ == "__main__":
    main()
