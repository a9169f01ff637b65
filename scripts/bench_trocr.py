"""TrOCR serving throughput on TPU (quality-path lines/s, VERDICT r2 #6).

Measures the transformer recognizer (`pipeline.TrocrRecognizer`: ViT-style
patch encoder + KV-cached autoregressive greedy decode) through the same
depth-pipelined dispatch pump bench.py uses for the CTC family, so the
quality/throughput trade-off between the two families is on record.

Throughput is weight-independent (greedy decode always runs max_len steps
under jit), so random init measures the same program a trained blob serves;
pass --blob to bench the real trained params.

Run: python scripts/bench_trocr.py [--batch 64] [--width 256] [--steps 48]
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

N_LINES = 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=48)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--blob", type=str, default=None,
                    help="trained blob from pretrain_trocr --save-params")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.pipeline import TrocrRecognizer
    from ocrfa_tpu.registry import RECOGNITION_MODELS

    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    converter = CTCLabelConverter(chars)
    heads = 8
    if args.blob:
        import pickle

        blob = pickle.loads(Path(args.blob).read_bytes())
        params = jax.tree.map(jax.numpy.asarray, blob["params"])
        meta = blob.get("meta", {})
        heads = int(meta.get("heads", 8))
        args.max_len = int(meta.get("max_len", args.max_len))
    else:
        from ocrfa_tpu.models.trocr import init_trocr

        params = init_trocr(jax.random.PRNGKey(0),
                            num_class=converter.num_classes,
                            d_model=args.d_model, heads=heads,
                            enc_layers=args.layers, dec_layers=args.layers)
    rec = TrocrRecognizer(params, converter, heads=heads,
                          max_len=args.max_len)
    keep_mask = keep_mask_for(converter.num_classes, converter.ignore_idx)

    rng = np.random.default_rng(0)
    batches = [
        rng.integers(0, 255, (args.batch, args.height, args.width, 1),
                     dtype=np.uint8)
        for _ in range(N_LINES // args.batch)
    ]

    def run_window():
        t0 = time.perf_counter()
        inflight, done = [], 0
        for b in batches:
            inflight.append(rec.predict_async(b, keep_mask))
            if len(inflight) >= args.depth:
                done += len(rec.collect(inflight.pop(0)))
        while inflight:
            done += len(rec.collect(inflight.pop(0)))
        return done / (time.perf_counter() - t0)

    run_window()  # compile + settle
    vals = [run_window() for _ in range(args.windows)]
    med = statistics.median(vals)
    out = {
        "metric": "trocr_lines_per_sec_per_chip",
        "value": round(med, 1),
        "best": round(max(vals), 1),
        "batch": args.batch,
        "width": args.width,
        "max_len": args.max_len,
        "model": (args.blob or
                  f"random d{args.d_model} x{args.layers}L"),
        "unit": "img/s/chip",
    }
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
