"""Cross-framework Farsi eval: train, export, and score BOTH pipelines.

Replaces "parity on random noise" with parity on a *trained* model over a
real Farsi eval set (BASELINE.md metric; zoo weights need network egress,
so the model is trained here):

1. render synthetic Farsi lines from fixed per-character glyphs (full
   production ``arabic_g1`` charset, RTL layout);
2. train the PRODUCTION-SCALE gen1 CRNN (512/512) on them with the CTC
   trainer, then calibrate BN running stats for inference mode;
3. export the trained weights to a reference-keyed torch state dict
   (``checkpoints.export_crnn_gen1``) and run the REFERENCE pipeline
   (``ocrfa.utils.get_text`` + the torch replica) over held-out eval lines;
4. run this framework's parity path (``pipeline.get_text``) and the serving
   fast path (ribbon wire + static-int8 tower) over the same lines;
5. report CER/exact-match between frameworks and vs ground truth, plus
   recognition latency percentiles.

Usage:
  python scripts/eval_farsi.py [--steps 600] [--eval-lines 256] [--small]
  (--small: 64-channel model + tiny charset for CPU smoke runs)
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np


def make_font(chars, rng, glyph_w, h=64):
    """One fixed random glyph bitmap per character (dark on white);
    whitespace renders blank (real word gaps, needed for word-level
    decode evals)."""
    return {c: (np.full((h, glyph_w), 255, np.uint8) if c.isspace()
                else 255 - (rng.random((h, glyph_w)) > 0.6).astype(np.uint8) * 255)
            for c in chars}


def render_crop(text, font, glyph_w, h=64, margin: int = 0):
    """Native-width u8 line crop; visual RTL (first char rightmost).

    ``margin`` adds white columns on both sides — detection boxes always
    carry background margin (add_margin), and the recognizers' replicate-
    edge right padding must land on background, not on glyph pixels."""
    canvas = np.full((h, glyph_w * len(text) + 2 * margin), 255, dtype=np.uint8)
    for i, ch in enumerate(text):
        col = margin + (len(text) - 1 - i) * glyph_w
        canvas[:, col:col + glyph_w] = font[ch]
    return canvas


def sample_texts(rng, charset, n, min_len=2, max_len=9):
    """Random lines with real word-gap structure.

    Spaces are sampled deliberately (interior-only, never adjacent), not as
    uniform charset draws: a space renders as a full blank glyph column
    (make_font), which is learnable from context as "wide white run".
    Empirically these white runs are load-bearing — runs trained WITHOUT
    any spaces either failed CTC lock-in or converged to sequence
    memorization (trained lines perfect, held-out lines ~0.95 CER), while
    space-bearing corpora locked in and generalized (held-out CER < 0.01).
    The blank runs give CTC hard per-segment alignment anchors that force
    a glyph-grounded solution."""
    pool = [c for c in charset if not c.isspace()]
    has_space = " " in charset
    out = []
    for _ in range(n):
        length = int(rng.integers(min_len, max_len + 1))
        s = "".join(rng.choice(pool, size=length))
        if has_space and length >= 5 and rng.random() < 0.7:
            pos = int(rng.integers(2, length - 1))
            s = s[:pos] + " " + s[pos:]
        out.append(s)
    return out


def train_gen1(charset, steps=600, train_pool=20, batch=64, oc=512, hs=512,
               glyph_w=24, seed=0, verbose=True, lr=1e-3,
               short_sampler=None, pool_sampler=None, augment=None,
               reuse=2):
    """Render synthetic Farsi lines and CTC-train a gen1 CRNN on a
    STREAMING corpus.

    Fresh lines are sampled, rendered, and uploaded continuously by a
    producer thread — the corpus is effectively infinite (``steps/reuse``
    distinct batches), which structurally rules out the sequence-
    memorization failure mode that finite device-resident pools hit: a
    512-wide net trained 12k steps on ~1.3k distinct lines reached train
    loss 0.17 with held-out CER 0.98 (every prediction a memorized pool
    line).  Streaming makes train ≈ held-out by construction.

    Batches cross the relay as u8 (4x smaller than f32) and are
    normalised inside the jitted train step (no extra dispatch RTT);
    ``reuse`` consecutive steps per uploaded batch halves wire bandwidth
    again — ~0.5 MB/s effective at reuse=2, far below the relay floor.

    ``short_sampler``/``pool_sampler``: optional ``(rng, n) -> [str]``
    overriding the random-character text source (e.g. word-structured text
    for the lexicon eval); the line width adapts to the longest sample.
    ``augment``: optional ``(crop_u8, rng) -> crop_u8`` applied to each
    rendered training crop (noise/contrast robustness).
    ``train_pool`` is kept for signature compatibility (it sizes the
    width/length probe and the BN-calibration set).

    Returns ``(params, conv, font, loss, calib_batches)`` with BN running
    stats calibrated for inference mode.  Shared by eval_farsi (line-level
    cross-framework eval) and eval_pages (page-level serving-path eval).
    """
    import queue as queue_mod
    import threading

    import jax
    import jax.numpy as jnp

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.models.crnn import crnn_apply, init_crnn_gen1
    from ocrfa_tpu.train import calibrate_bn_stats, make_optimizer, make_train_step

    conv = CTCLabelConverter(charset)
    rng = np.random.default_rng(seed)
    font = make_font(charset, rng, glyph_w)

    default_samplers = pool_sampler is None and short_sampler is None
    if pool_sampler is None:
        pool_sampler = lambda r, n: sample_texts(r, charset, n)
    if short_sampler is None:
        short_sampler = lambda r, n: sample_texts(r, charset, n,
                                                  min_len=1, max_len=3)
    # Length-ladder curriculum (defaults only; custom samplers manage their
    # own): CTC alignment over the 184-glyph charset locks in reliably on
    # 1-3 char lines but dies on a hard jump to full length (loss spikes
    # ~200, collapses to all-blanks ~30, never recovers), and even a
    # blended jump re-aligns too slowly.  Each ladder rung extends max_len
    # a little, so alignment for length L+1 is a small perturbation of the
    # already-locked length-L solution.
    ladder_samplers = ([
        (lambda lo, hi: (lambda r, n: sample_texts(r, charset, n,
                                                   min_len=lo, max_len=hi)))(lo, hi)
        for lo, hi in [(2, 5), (2, 7)]] if default_samplers else [])

    # probe the samplers for the longest line -> fixed render width and
    # label length for the whole run (one jit compile); streamed outliers
    # beyond the probe max are truncated (headroom +2 makes that rare)
    probe = np.random.default_rng(seed + 7)
    probe_texts = [t for _ in range(8)
                   for t in pool_sampler(probe, max(train_pool, 32))]
    probe_texts += short_sampler(probe, 64)
    longest = max(len(t) for t in probe_texts) + 2
    width = glyph_w * longest + 16  # widest training line + margins
    width = -(-width // 64) * 64
    max_l = longest

    def render_batch(texts, r):
        n = len(texts)
        images = np.full((n, 64, width, 1), 255, np.uint8)
        labels = np.zeros((n, max_l), np.int32)
        lengths = np.zeros((n,), np.int32)
        for i, t in enumerate(texts):
            t = t[:max_l]
            crop = render_crop(t, font, glyph_w, margin=6)
            if augment is not None:
                crop = augment(crop, r)
            images[i, :, :crop.shape[1], 0] = crop
            # labels in VISUAL order (leftmost glyph first): CTC alignment is
            # monotonic along the width axis, so an RTL render must train
            # against the reversed logical string — the model emits visual
            # order and get_display() restores logical (the reference's
            # arabic convention, ocr.py:482-486)
            ids = [conv.dict[c] for c in t[::-1]]
            labels[i, :len(ids)] = ids
            lengths[i] = len(ids)
        return images, labels, lengths

    # rungs: short (1-3) -> ladder -> full-length pool, walked by training
    # fraction with a blended hand-off between adjacent rungs and a 15%
    # short-line anchor forever (blank-collapse is punished instantly on
    # 1-3 char lines, so alignment can't silently die on the long tail)
    rungs = [short_sampler] + ladder_samplers + [pool_sampler]
    warm_f = 0.1  # fraction of steps on rung 0 alone

    def rung_for(i, mix_rng):
        f = i / steps
        if f < warm_f or len(rungs) == 1:
            return rungs[0]
        # position along the ladder: reach the last rung by 45% of
        # training — the full-length stream needs a long full-LR tail
        # (the one observed full lock-in took ~6k steps at full length)
        pos = min(1.0, (f - warm_f) / (0.45 - warm_f)) * (len(rungs) - 1)
        base = min(int(pos), len(rungs) - 2)
        frac = pos - base
        if mix_rng.random() < 0.15:
            return rungs[0]
        return rungs[base + 1] if mix_rng.random() < frac else rungs[base]

    n_batches = -(-steps // max(reuse, 1))
    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=8)
    calib_host = []  # last few u8 batches, for BN calibration

    def producer():
        prng = np.random.default_rng(seed + 1)
        for b in range(n_batches):
            texts = rung_for(b * reuse, prng)(prng, batch)
            im, lb, ln = render_batch(texts, prng)
            if b >= n_batches - 6:
                calib_host.append((im.copy(), lb.copy(), ln.copy()))
            q.put((jax.device_put(jnp.asarray(im)),
                   jax.device_put(jnp.asarray(lb)),
                   jax.device_put(jnp.asarray(ln))))

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                            output_channel=oc, hidden_size=hs)
    # constant LR throughout: runs that generalized trained at full LR to
    # the end; with a streaming corpus there is nothing to over-fit, and
    # full LR keeps the long-tail alignment adapting
    opt = make_optimizer(lr)
    state = opt.init(params)
    inner_step = make_train_step(opt)

    @jax.jit
    def step(p, s, im_u8, lb, ln):
        im = (im_u8.astype(jnp.float32) - 127.5) / 127.5
        return inner_step(p, s, im, lb, ln)

    t0 = time.time()
    loss = float("nan")
    i = 0
    for b in range(n_batches):
        im, lb, ln = q.get()
        for _ in range(min(reuse, steps - i)):
            params, state, loss = step(params, state, im, lb, ln)
            if verbose and i % 100 == 0:
                print(f"step {i:4d}  loss {float(loss):8.4f}  "
                      f"({time.time()-t0:.0f}s)", flush=True)
            i += 1
    if verbose:
        print(f"trained {steps} steps, final loss {float(loss):.4f}")

    # generalization check: loss on a NEVER-TRAINED full-length batch.
    # With a streaming corpus this should track the train loss closely; a
    # large gap means memorization (the failure mode streaming exists to
    # kill — train loss 0.17 / held-out CER 0.98 on a finite pool).
    from ocrfa_tpu.train import ctc_loss as _ctc_loss

    @jax.jit
    def _eval_loss(p, im_u8, lb, ln):
        im = (im_u8.astype(jnp.float32) - 127.5) / 127.5
        return _ctc_loss(crnn_apply(p, im, train=True), lb, ln)

    hrng = np.random.default_rng(seed + 31337)
    held = float(_eval_loss(
        params, *map(jnp.asarray, render_batch(pool_sampler(hrng, batch), hrng))))
    # comparand is a batch the model actually TRAINED on, of the same tail
    # length distribution (~85% full-length pool draws) — the raw final
    # train loss can be a short-anchor batch, which would flag a bogus gap
    seen = float(_eval_loss(params, *map(jnp.asarray, calib_host[-1])))
    if verbose:
        print(f"loss trained-batch {seen:.4f}  held-out {held:.4f}"
              + ("  [MEMORIZATION — gap too large]"
                 if held > seen + 5 else ""), flush=True)

    # inference-mode BN: write calibrated running stats
    calib_f32 = [((b[0].astype(np.float32) / 255.0) - 0.5) / 0.5
                 for b in calib_host[-4:]]
    params = calibrate_bn_stats(
        params, lambda p, b: crnn_apply(p, b), [b[:32] for b in calib_f32])
    return params, conv, font, loss, calib_f32[:2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--train-pool", type=int, default=20, help="distinct device-resident batches")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval-lines", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--small", action="store_true", help="64-ch model + tiny charset (CPU smoke)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin overrides "
                         "JAX_PLATFORMS, so an env var is not enough)")
    ap.add_argument("--out", type=str, default=None, help="write metrics JSON here")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.eval import cer
    from ocrfa_tpu.pipeline import Recognizer, get_text
    from ocrfa_tpu.registry import RECOGNITION_MODELS

    glyph_w = 24
    if args.small:
        charset = "ابتثجچحخد"
        oc = hs = 64
    else:
        charset = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
        oc = hs = 512
    params, conv, font, loss, calib_batches = train_gen1(
        charset, steps=args.steps, train_pool=args.train_pool,
        batch=args.batch, oc=oc, hs=hs, glyph_w=glyph_w, lr=args.lr)
    rng = np.random.default_rng(99)  # separate stream from training

    # ---- eval set (held out) ----------------------------------------------
    eval_texts = sample_texts(rng, charset, args.eval_lines)
    # model output is in visual order; ground truth for CER must match
    eval_visual = [t[::-1] for t in eval_texts]
    crops = [render_crop(t, font, glyph_w, margin=6) for t in eval_texts]
    image_list = []
    y = 0
    for crop in crops:
        w = crop.shape[1]
        image_list.append(([[0, y], [w, y], [w, y + 64], [0, y + 64]], crop))
        y += 70
    max_width = -(-max(c.shape[1] for c in crops) // 64) * 64

    # ---- this framework: parity path --------------------------------------
    recognizer = Recognizer(params, conv)
    t0 = time.time()
    ours = get_text(charset, 64, max_width, recognizer, image_list)
    ours_texts = [t for _, t, _ in ours]
    lat = []
    for box_crop in image_list[:32]:
        t1 = time.time()
        get_text(charset, 64, max_width, recognizer, [box_crop])
        lat.append((time.time() - t1) * 1000)
    lat = np.array(lat)

    # ---- serving fast path: ribbon wire + static int8 ---------------------
    fast = Recognizer(params, conv, quantized="static",
                      calibration_batches=[calib_batches[0][:64]])
    keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
    fast_res = fast.collect(fast.predict_ribbon_async(crops, keep, out_w=max_width))
    fast_texts = [t for t, _ in fast_res]
    fast4_res = fast.collect(
        fast.predict_ribbon_async(crops, keep, out_w=max_width, wire="u4"))
    fast4_texts = [t for t, _ in fast4_res]
    fast1_res = fast.collect(
        fast.predict_ribbon_async(crops, keep, out_w=max_width, wire="u1"))
    fast1_texts = [t for t, _ in fast1_res]

    # ---- reference torch pipeline on the exported weights -----------------
    import torch

    from ocrfa_tpu.checkpoints import export_crnn_gen1
    from ref_stubs import import_reference_utils
    from torch_replicas import Gen1Model

    ref_utils = import_reference_utils()
    model = Gen1Model(num_class=conv.num_classes, output_channel=oc,
                      hidden_size=hs).eval()
    model.load_state_dict({k: torch.from_numpy(np.array(v))
                           for k, v in export_crnn_gen1(params).items()},
                          strict=True)
    ref_converter = ref_utils.CTCLabelConverter(charset)
    ref = ref_utils.get_text(
        charset, 64, max_width, model, ref_converter, image_list,
        ignore_char="", decoder="greedy", beamWidth=5, batch_size=32,
        contrast_ths=0.1, adjust_contrast=0.5, workers=0, device="cpu",
    )
    ref_texts = [t for _, t, _ in ref]

    # ---- metrics -----------------------------------------------------------
    exact = float(np.mean([a == b for a, b in zip(ours_texts, ref_texts)]))
    metrics = {
        "eval_lines": len(eval_texts),
        "model": f"gen1 {oc}/{hs}, {len(charset)}-char charset",
        "train_steps": args.steps,
        "final_ctc_loss": round(float(loss), 4),
        "exact_match_vs_reference": exact,
        "cer_vs_reference": round(cer(ours_texts, ref_texts), 6),
        "cer_ours_vs_truth": round(cer(ours_texts, eval_visual), 6),
        "cer_reference_vs_truth": round(cer(ref_texts, eval_visual), 6),
        "cer_serving_int8_vs_truth": round(cer(fast_texts, eval_visual), 6),
        "cer_serving_int8_vs_reference": round(cer(fast_texts, ref_texts), 6),
        "cer_serving_int8_u4wire_vs_truth": round(cer(fast4_texts, eval_visual), 6),
        "cer_serving_int8_u1wire_vs_truth": round(cer(fast1_texts, eval_visual), 6),
        "latency_ms_p50_single_line": round(float(np.percentile(lat, 50)), 2),
        "latency_ms_p95_single_line": round(float(np.percentile(lat, 95)), 2),
    }
    print(json.dumps(metrics, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
