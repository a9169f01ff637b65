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
import os
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
    decode evals).

    Glyphs are LOW-FREQUENCY ink blobs (thresholded smoothed noise), not
    per-pixel speckle: real type is made of smooth strokes, and a pooled
    conv tower can template-match blobs robustly.  Per-pixel white-noise
    glyphs were a trap — discriminating 184 noise bitmaps through /4-/8
    pooling is so gradient-hostile that production-scale training
    reliably preferred sequence memorization over reading (held-out loss
    pinned at the entropy floor across every curriculum/replay variant;
    one 8k-step run that did generalize proved seed-lottery)."""
    font = {}
    for c in chars:
        if c.isspace():
            font[c] = np.full((h, glyph_w), 255, np.uint8)
            continue
        # smooth noise: coarse random grid, bilinearly upsampled
        cell = 8
        coarse = rng.random((h // cell + 2, glyph_w // cell + 2))
        ys = np.linspace(0, coarse.shape[0] - 1.001, h)
        xs = np.linspace(0, coarse.shape[1] - 1.001, glyph_w)
        y0, x0 = ys.astype(int), xs.astype(int)
        fy, fx = (ys - y0)[:, None], (xs - x0)[None, :]
        up = (coarse[y0][:, x0] * (1 - fy) * (1 - fx)
              + coarse[y0 + 1][:, x0] * fy * (1 - fx)
              + coarse[y0][:, x0 + 1] * (1 - fy) * fx
              + coarse[y0 + 1][:, x0 + 1] * fy * fx)
        ink = up > np.quantile(up, 0.6)  # ~40% ink coverage, blob-shaped
        font[c] = 255 - ink.astype(np.uint8) * 255
    return font


def render_crop(text, font, glyph_w, h=64, margin: int = 0, bearing: int = 3):
    """Native-width u8 line crop; visual RTL (first char rightmost).

    ``margin`` adds white columns on both sides — detection boxes always
    carry background margin (add_margin), and the recognizers' replicate-
    edge right padding must land on background, not on glyph pixels.
    ``bearing`` white columns separate adjacent glyphs (sidebearings —
    real type never abuts ink edge-to-edge; they also give CTC honest
    per-glyph segmentation anchors)."""
    adv = glyph_w + bearing
    canvas = np.full((h, adv * len(text) - bearing + 2 * margin), 255,
                     dtype=np.uint8)
    for i, ch in enumerate(text):
        col = margin + (len(text) - 1 - i) * adv
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
               reuse=24, buffer_batches=64, ignite_batches=5,
               snapshot_path=None, snap_every=2000,
               renderer=None, ladder_samplers=None, ema_decay=None,
               init_params=None, warm_start=False, variant="gen1",
               late_channel=None, distill=None):
    """Render synthetic Farsi lines and CTC-train a gen1 CRNN on a
    REPLAY-BUFFERED streaming corpus.

    Fresh lines are sampled, rendered, and uploaded continuously by a
    producer thread into a device-resident replay buffer of
    ``buffer_batches`` slots; every ``reuse`` steps the oldest slot is
    replaced, and each step trains on a uniformly random slot.  Two
    failure modes bracketed this design (both observed at 512/512 over
    the 184-char charset):

    - a FINITE pool (~1.3k distinct lines revisited ~600x over 12k steps)
      locks in but memorizes — train loss 0.17 with held-out CER 0.98;
    - PURE streaming (each batch trained 2-8 consecutive steps, then
      discarded) never locks in at all — held-out loss sits at the label
      entropy floor (~len*ln(184)) because CTC alignment bootstraps off
      repetition: re-seeing a batch with spaced repetitions is what turns
      noisy alignment gradients into a consistent glyph-grounded signal.

    The schedule therefore has two phases:

    1. IGNITION (first ~20% of steps, capped at 1500): cycle a tiny
       fixed pool of ``ignite_batches`` short-line batches hundreds of
       times.  This deliberately lets the net memorize them — that is
       what snaps CTC into a consistent monotonic alignment (replay at
       ~24 spaced visits/batch was measured NOT to ignite: loss stayed
       at the entropy floor through the whole warm phase).
    2. REPLAY STREAMING: fresh batches are injected into the buffer
       every ``reuse`` steps (replacing the oldest slot, so the ignition
       pool washes out), and each step trains on a uniformly random
       slot.  Each batch is revisited ~``reuse`` times spread over
       ``buffer_batches * reuse`` steps while the corpus grows by
       ``batch`` fresh lines per ``reuse`` steps — far too many distinct
       lines to memorize, which is what kills the finite-pool collapse
       (the grounded-glyph solution formed during ignition generalizes;
       continued training on a FIXED pool instead decays it into pure
       sequence recall, 0.034 held-out CER at 8k steps -> 0.98 at 12k).

    Batches cross the relay as u8 (4x smaller than f32) and are
    normalised inside the jitted train step (no extra dispatch RTT);
    amortised wire cost is one batch per ``reuse`` steps — far below the
    relay floor.

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
    import collections
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
    if ladder_samplers is None:
        ladder_samplers = ([
            (lambda lo, hi: (lambda r, n: sample_texts(r, charset, n,
                                                       min_len=lo, max_len=hi)))(lo, hi)
            for lo, hi in [(2, 5), (2, 7)]] if default_samplers else [])

    # rungs: short (1-3) -> ladder -> full-length pool, climbed by the
    # loss-adaptive gate below, with a 15% short-line anchor forever
    # (blank-collapse is punished instantly on 1-3 char lines, so
    # alignment can't silently die on the long tail)
    rungs = [short_sampler] + ladder_samplers + [pool_sampler]

    # probe every rung's sampler for its longest line -> one canvas width
    # PER RUNG (rounded to 64) and a global label length.  A single
    # full-length canvas was a measured ignition killer: 1-3 char lines on
    # a 384px canvas are mostly blank columns (T~95 for ~2 labels), which
    # dilutes the CTC alignment gradient enough that the lock-in plateau
    # never breaks; on a tight 128px canvas the same rung ignites in a few
    # hundred steps (and the narrow steps run ~3x faster).  XLA compiles
    # one program per width bucket — the same bucket-ladder the serving
    # path uses.  Streamed outliers beyond a rung's probe max truncate.
    probe = np.random.default_rng(seed + 7)

    def _probe_rung(sampler):
        """(max label length, canvas width) for one rung's sampler.

        With a shaped-font renderer the per-character advance varies (and
        joining shrinks words), so the canvas is sized from MEASURED pixel
        widths of probed samples rather than a glyph-advance formula."""
        texts = [t for _ in range(4)
                 for t in sampler(probe, max(train_pool, 32))]
        maxlen = max(len(t) for t in texts) + 1
        if renderer is not None:
            w = max(renderer.measure(t) for t in texts) + 16 + 10
        else:
            w = (glyph_w + 3) * maxlen + 16 + 10  # bearings+margins+jitter
        return maxlen, -(-w // 64) * 64

    rung_maxlen, rung_width = zip(*[_probe_rung(s) for s in rungs])
    max_l = max(rung_maxlen)
    width = max(rung_width)  # held-out / calibration canvas

    def train_jitter(crop, r):
        """Break image-hash memorization: contrast + noise + x-shift.

        With clean deterministic renders the net can satisfy the loss by
        hashing arbitrary pixels to a stored sequence (a replay run hit
        train loss 0.05 with held-out loss at the entropy floor); jitter
        makes per-glyph template matching the only solution that explains
        every rendition, so the shortcut is gradient-starved."""
        x = crop.astype(np.float32)
        x = 127.5 + (x - 127.5) * (0.55 + 0.45 * r.random())
        x += r.normal(0.0, 10.0, x.shape)
        pad = int(r.integers(0, 10))
        x = np.concatenate([np.full((x.shape[0], pad), 255.0), x], axis=1)
        return np.clip(x, 0, 255).astype(np.uint8)

    def render_batch(texts, r, jitter=False, canvas_w=None):
        n = len(texts)
        cw = width if canvas_w is None else canvas_w
        images = np.full((n, 64, cw, 1), 255, np.uint8)
        labels = np.zeros((n, max_l), np.int32)
        lengths = np.zeros((n,), np.int32)
        # truncate to what the canvas fits WITH its jitter/margin headroom
        # (labels must match the rendered glyphs — cropping canvas columns
        # on an RTL render would cut the line START while the label kept
        # the full text)
        fit = min(max_l, (cw - 16 - 10) // (glyph_w + 3))
        for i, t in enumerate(texts):
            if renderer is not None:
                t = renderer.fit_text(t[:max_l], cw - 16 - 10)
                crop = renderer.render(t)
            else:
                t = t[:fit]
                crop = render_crop(t, font, glyph_w, margin=6)
            if jitter:
                crop = train_jitter(crop, r)
            if augment is not None:
                crop = augment(crop, r)
            crop = crop[:, :cw]
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

    reuse = max(reuse, 1)
    # ignition: rung-0-only steps over a tiny cycled pool (old-style warm
    # phase; the cap matches the longest warm that was needed in practice).
    # A warm start (fine-tune from already-locked-in params) skips it —
    # alignment exists, so the curriculum begins at the top rung with the
    # jittered stream from step 0.
    ignite_steps = (0 if warm_start
                    else min(max(1, int(steps * 0.25)), 1500))

    # LOSS-ADAPTIVE ladder: fraction-based schedules are seed-fragile —
    # how long CTC takes to break its all-blank plateau on fresh data
    # varies by run, and climbing before the current rung locks in sends
    # the loss to an unrecoverable collapse.  The training loop keeps a
    # post-ignition loss EMA and advances one rung whenever it dips under
    # the gate, with a one-buffer-turnover cooldown so the EMA reflects
    # the new rung before the next climb.  The producer thread just reads
    # the current rung; 15% of batches stay rung-0 anchors (blank
    # collapse is punished instantly on 1-3 char lines).
    cur = {"rung": len(rungs) - 1 if warm_start else 0}

    def rung_for(mix_rng):
        if mix_rng.random() < 0.15:
            return 0
        return cur["rung"]

    # initial buffer fill; afterwards the producer streams until stopped
    # (the consumer controls the replacement rate, which can change
    # mid-run — see the phase-3 acceleration below)
    fill = max(1, min(buffer_batches, -(-steps // reuse)))
    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=4)
    stop = threading.Event()
    calib_recent = collections.deque(maxlen=6)  # for BN calibration

    def producer():
        prng = np.random.default_rng(seed + 1)
        b = 0
        while not stop.is_set():
            # the fill batches are all rung-0 (they seed ignition); a warm
            # start has no ignition, so the fill streams the top rung too
            ri = 0 if (b < fill and not warm_start) else rung_for(prng)
            texts = rungs[ri](prng, batch)
            # ignition batches render CLEAN: memorizing them is the
            # mechanism that snaps CTC alignment (jitter from step 0 was
            # measured to block ignition entirely — loss pinned at the
            # entropy floor).  The post-ignition stream is jittered so
            # image-hash recall can't survive past ignition.  Each rung
            # renders on its own canvas width bucket.
            im, lb, ln = render_batch(texts, prng,
                                      jitter=(warm_start or b >= fill),
                                      canvas_w=rung_width[ri])
            calib_recent.append((im.copy(), lb.copy(), ln.copy()))
            item = (jax.device_put(jnp.asarray(im)),
                    jax.device_put(jnp.asarray(lb)),
                    jax.device_put(jnp.asarray(ln)))
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    break
                except queue_mod.Full:
                    pass
            b += 1

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    if init_params is not None:
        params = jax.tree.map(jnp.asarray, init_params)
    else:
        params = init_crnn_gen1(jax.random.PRNGKey(0),
                                num_class=conv.num_classes,
                                output_channel=oc, hidden_size=hs,
                                late_channel=late_channel)
    # full LR through ignition/ladder (lock-in needs it), then a cosine
    # tail over the last 30%: re-fitting each fresh buffer batch (the
    # memorization channel) needs large steps, while the glyph-grounded
    # solution is shared across batches and survives small ones — decay
    # starves the former and consolidates the latter
    if not callable(lr):
        lr_peak = lr

        def lr(count):  # noqa: F811 — schedule form of the same arg
            frac = count / max(steps, 1)
            return jnp.where(
                frac < 0.7, lr_peak,
                lr_peak * (0.15 + 0.85 * 0.5
                           * (1 + jnp.cos(jnp.pi * (frac - 0.7) / 0.3))))
    opt = make_optimizer(lr)
    state = opt.init(params)
    # distill: framewise-KL teacher term (train.make_train_step) — the
    # quality lever for thin serving towers (teach gen1t384 the full
    # tower's frame posteriors instead of re-learning from CTC alone)
    inner_step = make_train_step(opt, variant=variant, distill=distill)

    @jax.jit
    def step(p, s, im_u8, lb, ln):
        im = (im_u8.astype(jnp.float32) - 127.5) / 127.5
        return inner_step(p, s, im, lb, ln)

    from ocrfa_tpu.train import ctc_loss as _ctc_loss

    @jax.jit
    def _eval_loss(p, im_u8, lb, ln):
        im = (im_u8.astype(jnp.float32) - 127.5) / 127.5
        return _ctc_loss(crnn_apply(p, im, variant=variant, train=True), lb, ln)

    # fixed clean held-out batch, probed during training: a large gap vs
    # the train loss is the memorization signal, visible live
    hrng = np.random.default_rng(seed + 31337)
    held_batch = tuple(map(jnp.asarray,
                           render_batch(pool_sampler(hrng, batch), hrng)))

    # best-held-out tracking: long runs can diverge late (a 30k-step run
    # bottomed at held 6.3 by 15k, then the cosine tail consolidated
    # buffer memorization and held climbed to 32 — the final params were
    # the WORST of the run).  Params are functional pytrees, so keeping
    # the best snapshot is a free reference, no copy.
    best = {"held": float("inf"), "params": None, "step": -1, "saved": -10**9}

    # optional Polyak/EMA averaging (started after ignition): each replay
    # step fits the sampled buffer slot, so raw params oscillate around the
    # shared glyph-grounded solution — the average across slots is a less
    # memorization-contaminated estimate of it.  The EMA is probed on the
    # held batch alongside the raw params and competes for best/final.
    ema_params = None
    if ema_decay:
        _ema_update = jax.jit(lambda e, p: jax.tree.map(
            lambda a, b: ema_decay * a + (1.0 - ema_decay) * b, e, p))

    t0 = time.time()
    loss = float("nan")
    srng = np.random.default_rng(seed + 2)
    buffer = [q.get() for _ in range(fill)]
    ignite_n = min(max(1, ignite_batches), fill)
    oldest = 0
    ADV_GATE = 3.0
    repl = reuse  # replacement interval = avg visits per batch
    cooldown = len(buffer) * reuse  # one full buffer turnover
    # first climb no sooner than one turnover past ignition: right after
    # ignition the buffer is still ignition-heavy and the EMA would be
    # polluted by memorized-batch losses
    ema, last_adv = float("inf"), ignite_steps
    since_repl = 0
    for i in range(steps):
        if i < ignite_steps:
            # ignition: cycle the tiny rung-0 pool only
            im, lb, ln = buffer[int(srng.integers(ignite_n))]
        else:
            since_repl += 1
            if since_repl >= repl:
                # replace the oldest slot with a fresh batch (round-robin)
                buffer[oldest] = q.get()
                oldest = (oldest + 1) % len(buffer)
                since_repl = 0
            im, lb, ln = buffer[int(srng.integers(len(buffer)))]
        params, state, loss = step(params, state, im, lb, ln)
        if ema_decay and i >= ignite_steps:
            ema_params = params if ema_params is None else _ema_update(
                ema_params, params)
        if i >= ignite_steps and i % 25 == 0:
            # loss-adaptive ladder bookkeeping (sync every 25 steps only —
            # a per-step float() would add a dispatch RTT per step)
            v = float(loss)
            ema = v if ema == float("inf") else 0.9 * ema + 0.1 * v
            if ema < ADV_GATE and i - last_adv >= cooldown:
                if cur["rung"] < len(rungs) - 1:
                    cur["rung"] += 1
                    ema, last_adv = float("inf"), i
                    if verbose:
                        print(f"step {i:4d}  -> rung {cur['rung']}"
                              f"/{len(rungs) - 1}", flush=True)
                elif repl > max(4, reuse // 3):
                    # phase 3: top rung is locked — accelerate corpus
                    # growth (fewer visits per batch) so residual buffer
                    # memorization starves while generalization keeps
                    # collecting gradient
                    repl = max(4, reuse // 3)
                    if verbose:
                        print(f"step {i:4d}  -> streaming accel "
                              f"(visits/batch {reuse} -> {repl})", flush=True)
        if i % 500 == 0 and i >= ignite_steps:
            held_v = float(_eval_loss(params, *held_batch))
            cand_held, cand_params = held_v, params
            if ema_params is not None:
                held_e = float(_eval_loss(ema_params, *held_batch))
                if held_e < cand_held:
                    cand_held, cand_params = held_e, ema_params
                held_v = min(held_v, held_e)
            if cand_held < best["held"]:
                best.update(held=cand_held, params=cand_params, step=i)
        else:
            held_v = None
        if verbose and i % 100 == 0:
            held = f"  held {held_v:8.4f}" if held_v is not None else ""
            print(f"step {i:4d}  loss {float(loss):8.4f}{held}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (snapshot_path and i > 0
                and best["params"] is not None
                and best["step"] - best["saved"] >= snap_every):
            # evalable snapshot of the BEST-held-out params so far (BN-
            # calibrated copy): the axon relay can die mid-run and take
            # every device buffer with it — without snapshots that loses
            # the whole run.  Snapshotting best (throttled to one write
            # per snap_every steps of improvement) also means a crashed
            # tail never costs the run's peak.
            recent = [((b[0].astype(np.float32) / 255.0) - 0.5) / 0.5
                      for b in list(calib_recent)[-4:]]
            snap = calibrate_bn_stats(
                best["params"], lambda p, b: crnn_apply(p, b, variant=variant),
                [b[:32] for b in recent])
            save_trained(snapshot_path + ".tmp", snap, best["held"],
                         recent[:2],
                         dict(charset=charset, oc=oc, hs=hs,
                              glyph_w=glyph_w, steps=best["step"],
                              variant=variant))
            os.replace(snapshot_path + ".tmp", snapshot_path)
            best["saved"] = best["step"]
    if verbose:
        print(f"trained {steps} steps, final loss {float(loss):.4f}")
    stop.set()
    while True:  # unblock a producer mid-put and let it exit
        try:
            q.get_nowait()
        except queue_mod.Empty:
            break
    thread.join(timeout=5.0)
    calib_host = list(calib_recent)

    # generalization check: loss on the NEVER-TRAINED full-length batch.
    # This should track the train loss closely; a large gap means
    # memorization (train loss 0.17 / held-out CER 0.98 on a finite pool).
    held = float(_eval_loss(params, *held_batch))
    cands = [("final", params, held)]
    if ema_params is not None:
        cands.append(("final-ema", ema_params,
                      float(_eval_loss(ema_params, *held_batch))))
    if best["params"] is not None:
        cands.append((f"best@step{best['step']}", best["params"], best["held"]))
    tag, sel, h = min(cands, key=lambda c: c[2])
    if sel is not params and h + 0.5 < held:
        # late-run divergence (or the EMA won): return the run's best
        # held-out params, not the final (possibly memorized) ones.  The
        # margin keeps the final params when the probe difference is noise-
        # level — they saw the most fresh data.
        if verbose:
            print(f"restoring {tag} params "
                  f"(held {h:.4f} vs final {held:.4f})", flush=True)
        params, held = sel, h
    # comparand is a batch the model actually TRAINED on: the oldest
    # buffer resident was revisited a full complement of times (the raw
    # final train loss can be a short-anchor batch, which would flag a
    # bogus gap)
    seen = float(_eval_loss(params, *buffer[oldest]))
    if verbose:
        print(f"loss trained-batch {seen:.4f}  held-out {held:.4f}"
              + ("  [MEMORIZATION — gap too large]"
                 if held > seen + 5 else ""), flush=True)

    # inference-mode BN: write calibrated running stats
    calib_f32 = [((b[0].astype(np.float32) / 255.0) - 0.5) / 0.5
                 for b in calib_host[-4:]]
    params = calibrate_bn_stats(
        params, lambda p, b: crnn_apply(p, b, variant=variant),
        [b[:32] for b in calib_f32])
    return params, conv, font, loss, calib_f32[:2]


def save_trained(path, params, loss, calib_batches, meta):
    """Pickle a trained run (params as host numpy pytree + meta) so the
    page-level eval can reuse it instead of retraining (~1h on TPU)."""
    import pickle

    import jax

    blob = {"params": jax.tree.map(lambda a: np.asarray(a), params),
            "loss": float(loss),
            "calib": [np.asarray(b) for b in calib_batches],
            "meta": meta}
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_trained(path):
    """Inverse of save_trained; rebuilds the deterministic converter/font
    (train_gen1 derives both from charset + seed 0)."""
    import pickle

    from ocrfa_tpu.decode import CTCLabelConverter

    with open(path, "rb") as f:
        blob = pickle.load(f)
    meta = blob["meta"]
    conv = CTCLabelConverter(meta["charset"])
    font = make_font(meta["charset"], np.random.default_rng(0),
                     meta["glyph_w"])
    return blob["params"], conv, font, blob["loss"], blob["calib"], meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0,
                    help="training rng seed (ignition pool, replay order, "
                         "held-out probe).  Lock-in quality is seed-variable "
                         "(CLAUDE.md); retraining at another seed is the "
                         "cheap lever when a run lands above the ~0.045 "
                         "plateau")
    ap.add_argument("--train-pool", type=int, default=20, help="distinct device-resident batches")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval-lines", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ema", type=float, default=0.0,
                    help="Polyak/EMA parameter-averaging decay (e.g. 0.999); "
                         "0 disables.  The EMA competes with raw params on "
                         "the held-out probe for the returned weights")
    ap.add_argument("--small", action="store_true", help="64-ch model + tiny charset (CPU smoke)")
    ap.add_argument("--variant", choices=["gen1", "gen1w8"], default="gen1",
                    help="gen1w8: the reduced-FLOP serving tower (extra "
                         "width stride at the /8 pool; T = W/8+1). Same "
                         "param tree as gen1, ~0.6x tower FLOPs")
    ap.add_argument("--oc", type=int, default=None,
                    help="override output_channel (tower width; default 512)")
    ap.add_argument("--hs", type=int, default=None,
                    help="override LSTM hidden size (default 512)")
    ap.add_argument("--late-channel", type=int, default=None,
                    help="thin ONLY layer3/4 (78%% of tower FLOPs) to this "
                         "width, keeping T = W/4+1 — the gen1t serving "
                         "variant (e.g. 384 = ~0.66x tower FLOPs)")
    ap.add_argument("--realfont", action="store_true",
                    help="train/eval on REAL shaped Farsi typography "
                         "(PIL+libraqm + DejaVu Sans: contextual letterforms, "
                         "cursive joining) instead of per-character glyph "
                         "stamps; text restricted to the charset's "
                         "Arabic-letter subset + space")
    ap.add_argument("--font-mix", action="store_true",
                    help="with --realfont: mix DejaVu Sans regular + bold "
                         "per line (font-shape robustness, not single-face "
                         "template matching)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin overrides "
                         "JAX_PLATFORMS, so an env var is not enough)")
    ap.add_argument("--out", type=str, default=None, help="write metrics JSON here")
    ap.add_argument("--save-params", type=str, default=None,
                    help="pickle the trained (BN-calibrated) params here so "
                         "eval_pages can reuse the run")
    ap.add_argument("--load-params", type=str, default=None,
                    help="skip training; load params pickled by a previous "
                         "--save-params run (charset/oc/hs must match)")
    ap.add_argument("--continue-from", type=str, default=None,
                    help="warm-start from a --save-params blob and train "
                         "--steps MORE at the top ladder rung (model config "
                         "and renderer mode come from the blob meta; pass a "
                         "tail LR like --lr 2e-4)")
    ap.add_argument("--distill-from", type=str, default=None,
                    help="teacher blob (--save-params pickle, e.g. the "
                         "stock 512/512 shaped snapshot): adds a framewise "
                         "KL term against its frame posteriors — the thin-"
                         "tower quality recovery lever (VERDICT r3 #3)")
    ap.add_argument("--distill-weight", type=float, default=1.0)
    ap.add_argument("--distill-temp", type=float, default=2.0)
    ap.add_argument("--u1-sweep", type=str, default=None,
                    help='comma list of u1 binarisation thresholds to CER-'
                         'sweep on the serving path (e.g. "96,128,160,192")')
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # the relay can die such that every dispatch hangs forever — fail
        # fast instead of hanging at step 0 (utils/resilience.py)
        from ocrfa_tpu.utils.resilience import require_backend

        require_backend()

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
    oc = args.oc or oc
    hs = args.hs or hs
    late_channel = args.late_channel
    variant = args.variant
    if args.load_params:
        params, conv, font, loss, calib_batches, meta = load_trained(
            args.load_params)
        charset, oc, hs, glyph_w = (meta["charset"], meta["oc"], meta["hs"],
                                    meta["glyph_w"])
        late_channel = meta.get("late_channel", late_channel)
        args.steps = meta["steps"]
        args.realfont = bool(meta.get("realfont", args.realfont))
        args.font_mix = bool(meta.get("font_mix", args.font_mix))
        variant = meta.get("variant", variant)
    init_params, prev_steps = None, 0
    if args.continue_from:
        init_params, _c0, _f0, _l0, _cal0, cmeta = load_trained(
            args.continue_from)
        charset, oc, hs, glyph_w = (cmeta["charset"], cmeta["oc"],
                                    cmeta["hs"], cmeta["glyph_w"])
        prev_steps = int(cmeta.get("steps", 0))
        args.realfont = bool(cmeta.get("realfont", args.realfont))
        args.font_mix = bool(cmeta.get("font_mix", args.font_mix))
        variant = cmeta.get("variant", variant)
        late_channel = cmeta.get("late_channel", late_channel)
        if "realfont" not in cmeta and not args.realfont:
            # snapshots predating the realfont meta keys can't say which
            # renderer trained them; continuing a shaped-typography model
            # on glyph stamps silently resets it (observed: step-0 loss
            # 270 instead of 0.4) — make the ambiguity loud
            print("WARNING: blob meta has no 'realfont' key and --realfont "
                  "not passed; continuing with the glyph-stamp renderer. "
                  "If this snapshot was trained on shaped typography, "
                  "re-run with --realfont [--font-mix].", flush=True)
    renderer, text_charset = None, charset
    if args.realfont:
        from ocrfa_tpu.data import (FontLineRenderer, MultiFontLineRenderer,
                                    rtl_letters)

        renderer = FontLineRenderer(height=64)
        if getattr(args, "font_mix", False):
            renderer = MultiFontLineRenderer(
                [renderer, FontLineRenderer(height=64, bold=True)])
        text_charset = "".join(c for c in rtl_letters(charset)
                               if renderer.covers(c))
    distill = None
    if args.distill_from and not args.load_params:
        t_params, _tc, _tf, _tl, _tcal, tmeta = load_trained(
            args.distill_from)
        if tmeta["charset"] != charset:
            raise SystemExit("--distill-from charset mismatch")
        distill = dict(params=t_params,
                       variant=tmeta.get("variant", "gen1"),
                       weight=args.distill_weight, temp=args.distill_temp)
        print(f"distilling from {args.distill_from} "
              f"({tmeta.get('variant', 'gen1')}, {tmeta['oc']}/{tmeta['hs']}"
              f", held ctc {_tl:.4f}) weight {args.distill_weight} "
              f"temp {args.distill_temp}", flush=True)
    if not args.load_params:
        extra = {}
        if renderer is not None:
            def mk(lo, hi):
                return lambda r, n: sample_texts(r, text_charset, n,
                                                 min_len=lo, max_len=hi)

            extra = dict(renderer=renderer, short_sampler=mk(1, 3),
                         ladder_samplers=[mk(2, 5), mk(2, 7)],
                         pool_sampler=mk(2, 9))
        params, conv, font, loss, calib_batches = train_gen1(
            charset, steps=args.steps, train_pool=args.train_pool,
            batch=args.batch, oc=oc, hs=hs, glyph_w=glyph_w, lr=args.lr,
            seed=args.seed,
            snapshot_path=(args.save_params + ".snap"
                           if args.save_params else None),
            ema_decay=(args.ema or None),
            init_params=init_params, warm_start=init_params is not None,
            variant=variant, late_channel=late_channel, distill=distill,
            **extra)
    if args.save_params:
        save_trained(args.save_params, params, loss, calib_batches,
                     dict(charset=charset, oc=oc, hs=hs, glyph_w=glyph_w,
                          steps=prev_steps + args.steps,
                          realfont=bool(args.realfont),
                          font_mix=bool(args.font_mix), variant=variant,
                          late_channel=late_channel))
    rng = np.random.default_rng(99)  # separate stream from training

    # ---- eval set (held out) ----------------------------------------------
    eval_texts = sample_texts(rng, text_charset, args.eval_lines)
    # model output is in visual order; ground truth for CER must match
    eval_visual = [t[::-1] for t in eval_texts]
    crops = [renderer.render(t) if renderer is not None
             else render_crop(t, font, glyph_w, margin=6)
             for t in eval_texts]
    image_list = []
    y = 0
    for crop in crops:
        w = crop.shape[1]
        image_list.append(([[0, y], [w, y], [w, y + 64], [0, y + 64]], crop))
        y += 70
    max_width = -(-max(c.shape[1] for c in crops) // 64) * 64

    # ---- this framework: parity path --------------------------------------
    recognizer = Recognizer(params, conv, variant=variant)
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
    fast = Recognizer(params, conv, variant=variant, quantized="static",
                      calibration_batches=[calib_batches[0][:64]])
    if args.save_params and fast.act_amax is not None:
        # persist the calibrated int8 activation scales into the blob meta
        # (server.py quantize=static reads meta['act_amax'] and skips
        # startup calibration entirely — and never falls back to the
        # synthetic-render scales ADVICE flagged)
        import pickle

        with open(args.save_params, "rb") as f:
            blob = pickle.load(f)
        blob["meta"]["act_amax"] = fast.act_amax
        with open(args.save_params + ".tmp", "wb") as f:
            pickle.dump(blob, f)
        os.replace(args.save_params + ".tmp", args.save_params)
    keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
    fast_res = fast.collect(fast.predict_ribbon_async(crops, keep, out_w=max_width))
    fast_texts = [t for t, _ in fast_res]
    fast4_res = fast.collect(
        fast.predict_ribbon_async(crops, keep, out_w=max_width, wire="u4"))
    fast4_texts = [t for t, _ in fast4_res]
    fast1_res = fast.collect(
        fast.predict_ribbon_async(crops, keep, out_w=max_width, wire="u1"))
    fast1_texts = [t for t, _ in fast1_res]
    # u1 binarisation-threshold sweep (VERDICT r3 #6): the default 128 cut
    # costs thin towers ~+0.04 CER; measure whether a calibrated cut (or
    # none) qualifies u1 for this tower
    u1_sweep = {}
    if args.u1_sweep:
        for thr in (int(t) for t in args.u1_sweep.split(",")):
            res_t = fast.collect(fast.predict_ribbon_async(
                crops, keep, out_w=max_width, wire="u1", u1_threshold=thr))
            u1_sweep[str(thr)] = round(
                cer([t for t, _ in res_t], eval_visual), 6)
        if args.save_params:
            # persist the calibrated cut in the blob meta so u1-wire
            # consumers can pass it to predict_ribbon_async/pack_crops
            # (the per-tower calibration VERDICT r3 #6 asks for)
            best_thr = min(u1_sweep, key=u1_sweep.get)
            with open(args.save_params, "rb") as f:
                blob = pickle.load(f)
            blob["meta"]["u1_threshold"] = int(best_thr)
            blob["meta"]["u1_threshold_cer"] = u1_sweep[best_thr]
            with open(args.save_params + ".tmp", "wb") as f:
                pickle.dump(blob, f)
            os.replace(args.save_params + ".tmp", args.save_params)

    # ---- reference torch pipeline on the exported weights -----------------
    import torch

    from ocrfa_tpu.checkpoints import export_crnn_gen1
    from ref_stubs import import_reference_utils
    from torch_replicas import Gen1Model

    ref_utils = import_reference_utils()
    # the gen1w8 serving tower has no reference counterpart; the torch leg
    # uses OUR replica with the matching pool stride (same state-dict keys),
    # so cross-framework numerics stay checkable for every variant
    model = Gen1Model(num_class=conv.num_classes, output_channel=oc,
                      hidden_size=hs, w8=variant == "gen1w8",
                      late_channel=late_channel).eval()
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
        "model": (f"{variant} {oc}/{hs}"
                  + (f" late{late_channel}" if late_channel else "")
                  + f", {len(charset)}-char charset"),
        "text_source": ((f"shaped DejaVu Sans{' +Bold mix' if args.font_mix else ''}"
                         f" (real typography, {len(text_charset)}-char RTL subset)")
                        if args.realfont else "blob glyph stamps"),
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
        **({"cer_u1_threshold_sweep": u1_sweep} if u1_sweep else {}),
        "latency_ms_p50_single_line": round(float(np.percentile(lat, 50)), 2),
        "latency_ms_p95_single_line": round(float(np.percentile(lat, 95)), 2),
    }
    print(json.dumps(metrics, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
