"""Corpus-scale serving artifact (BASELINE config 5, VERDICT r3 #4).

Streams 10k+ shaped-typography Farsi pages through the production
:class:`ocrfa_tpu.serving.ServingPipeline` (device-resident pages, sub-byte
page wire, depth-pipelined detection + page-resident bucketed recognition +
fused device decode) with FULLY SELF-TRAINED weights — the CRAFT arm
detector (``blobs/craft_arm_r3.pkl``) and the crop-domain fine-tuned thin
recognizer (``blobs/gen1t384_ft_r3.pkl``).  Reference driver analog:
``readtext_batched`` (/root/reference/src/ocrfa/ocr.py:692-776), which
loops pages on the host at ~1 line/s/core.

Reports sustained pages/s + lines/s over the stream, p50/p95 single-page
latency, and a sampled CER: the first pool pass is scored against the
page generator's ground-truth line records (the same greedy-IoU scorer as
``eval_selftrained``), so the artifact carries accuracy evidence, not just
throughput.

Pages cycle through a fixed pool (distinct renders, host memory stays
flat) but every page pays its real relay upload each time.

Usage:
  python scripts/await_relay.py -- python scripts/serve_corpus.py \
      --pages 10000 --out eval_results/SERVE_CORPUS_r4.json
  python scripts/serve_corpus.py --pages 24 --cpu --mesh 8   # CPU rehearsal
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=10000)
    ap.add_argument("--pool", type=int, default=64)
    ap.add_argument("--depth", type=int, default=2,
                    help="detection waves in flight ahead of recognition")
    ap.add_argument("--wave", type=int, default=16,
                    help="pages per detection/recognition wave — relay "
                         "round trips amortise over the wave (r4's 12 "
                         "pages/s was the per-page RTT chain)")
    ap.add_argument("--per-page", action="store_true",
                    help="serve with the old per-page pipeline instead of "
                         "waves (the r4 configuration, for comparison)")
    ap.add_argument("--page-size", type=int, default=512)
    ap.add_argument("--page-wire", default="u4")
    ap.add_argument("--detector", default="blobs/craft_arm_r3.pkl")
    ap.add_argument("--recognizer", default="blobs/gen1t384_seed7_r5.pkl")
    ap.add_argument("--recognizer-ft", default="blobs/gen1t384_s7_ft_r5.pkl")
    ap.add_argument("--quantized", default="static",
                    help='recognizer tower numerics: "static" (int8 '
                         'serving path), "dynamic", or "" (bf16/f32)')
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard page batches over an N-device mesh "
                         "(CPU rehearsal: --cpu --mesh 8)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from ocrfa_tpu.utils.resilience import require_backend

        require_backend()

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import pickle

    import jax

    from eval_farsi import load_trained
    from eval_selftrained import build_facade, make_shaped_pages, score_pages

    from ocrfa_tpu.data import FontLineRenderer, MultiFontLineRenderer, rtl_letters
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.serving import ServingPipeline
    from ocrfa_tpu.utils.bidi import get_display

    # ---- weights -----------------------------------------------------------
    recog_params, conv, _font, _loss, calib, meta = load_trained(
        args.recognizer)
    if args.recognizer_ft:
        with open(args.recognizer_ft, "rb") as f:
            recog_params = pickle.load(f)["params"]
    with open(args.detector, "rb") as f:
        det_blob = pickle.load(f)

    mesh = None
    if args.mesh:
        from ocrfa_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(jax.devices()[:args.mesh])

    quantized = args.quantized or False
    rec = Recognizer(recog_params, conv, variant=meta.get("variant", "gen1"),
                     quantized=quantized, mesh=mesh,
                     act_amax=(meta.get("act_amax")
                               if quantized == "static" else None),
                     calibration_batches=(
                         None if meta.get("act_amax") or quantized != "static"
                         else calib))

    pipe = ServingPipeline(
        det_blob["params"], rec, canvas_size=args.page_size,
        text_threshold=0.5, low_text=0.3, link_threshold=0.4, min_size=10,
        mesh=mesh, page_wire=args.page_wire)

    # ---- corpus: shaped held-out pages with ground truth -------------------
    renderer = MultiFontLineRenderer(
        [FontLineRenderer(height=64), FontLineRenderer(height=64, bold=True)])
    ocr = build_facade(None, None, None)
    text_charset = "".join(c for c in rtl_letters(meta["charset"])
                           if renderer.covers(c) and c in ocr.lang_char)
    pool, _quads, _chars, records = make_shaped_pages(
        args.pool, renderer, text_charset, page=args.page_size, seed=1234)

    # ---- single-page latency (warm) ----------------------------------------
    h0 = pipe.submit_page(pool[0])
    pipe.finish_page(h0)  # compile
    lat = []
    for i in range(32):
        t0 = time.perf_counter()
        pipe.finish_page(pipe.submit_page(pool[i % len(pool)]))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    # relay stalls (CLAUDE.md: the relay dies/flaps for stretches) are a
    # transport outage, not pipeline latency — report them separately
    # instead of letting one 6.5 s stall masquerade as p95 (r4's artifact)
    stall_ms = 1000.0
    stalls = lat[lat >= stall_ms]
    clean_lat = lat[lat < stall_ms] if (lat < stall_ms).any() else lat

    # ---- sampled CER: one pool pass through the stream ----------------------
    runner = (lambda it: pipe.process(it, depth=max(args.depth, 4))) \
        if args.per_page else \
        (lambda it: pipe.process_waves(it, wave=args.wave, depth=args.depth))
    sample_results = []
    for res in runner(iter(pool)):
        sample_results.append(
            [(quad, get_display(text), conf) for quad, text, conf in res])
    cer_sample = score_pages(sample_results, records)

    # ---- sustained stream ---------------------------------------------------
    def stream():
        for i in range(args.pages):
            yield pool[i % len(pool)]

    pipe.stage_seconds.clear()
    t0 = time.perf_counter()
    total_lines = 0
    done = 0
    for res in runner(stream()):
        total_lines += len(res)
        done += 1
        if done % 1000 == 0:
            dt = time.perf_counter() - t0
            print(f"{done}/{args.pages} pages  {done / dt:.2f} pages/s  "
                  f"{total_lines / dt:.0f} lines/s  ({dt:.0f}s)",
                  flush=True)
    dt = time.perf_counter() - t0
    stages = {k: round(v, 1) for k, v in sorted(pipe.stage_seconds.items())}
    stages["unattributed"] = round(dt - sum(pipe.stage_seconds.values()), 1)

    metrics = {
        "pages": args.pages,
        "page_size": args.page_size,
        "page_wire": args.page_wire,
        "depth": args.depth,
        "mesh_devices": args.mesh or 1,
        "recognizer": f"{meta.get('variant', 'gen1')}"
                      f"{' late' + str(meta['late_channel']) if meta.get('late_channel') else ''}"
                      f" {meta['oc']}/{meta['hs']}"
                      f" {'+ft ' + args.recognizer_ft if args.recognizer_ft else ''}"
                      f" quant={args.quantized or 'none'}",
        "detector": args.detector,
        "wave": 0 if args.per_page else args.wave,
        "pages_per_sec": round(args.pages / dt, 2),
        "lines_per_sec": round(total_lines / dt, 1),
        "lines_total": total_lines,
        "wall_seconds": round(dt, 1),
        "stage_seconds": stages,
        "p50_page_ms": round(float(np.percentile(clean_lat, 50)), 1),
        "p95_page_ms": round(float(np.percentile(clean_lat, 95)), 1),
        "latency_relay_stalls": {
            "count": int(len(stalls)),
            "of_samples": int(len(lat)),
            "max_ms": round(float(lat.max()), 1),
        },
        "sampled_cer": cer_sample,
    }
    print(json.dumps(metrics, indent=2, ensure_ascii=False))
    if args.out:
        Path(args.out).write_text(
            json.dumps(metrics, indent=2, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
