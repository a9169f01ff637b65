"""Probe compute-only throughput of candidate serving towers on the TPU.

Round-3 FLOP-cut selection (VERDICT item 1): the width-mixture compute
ceiling of the stock gen1 512/512 static-int8 tower is ~4.1k lines/s —
below the 5k north star even with a free wire.  Candidates cut tower FLOPs
two ways (composable):

* ``gen1w8``: extra width stride at the /8 pool — layer3/4 (78% of FLOPs)
  run at W/8 (T = W/8+1), same param tree;
* thinner tower: output_channel/hidden 384 instead of 512 (FLOPs x0.56).

Usage: python scripts/probe_towers.py [--buckets 256,512] [--chunk 512]
Prints one JSON line per (config, bucket) plus a mixture estimate.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="256,512")
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--configs", default="gen1:512,gen1w8:512,gen1:384,gen1w8:384")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    buckets = [int(b) for b in args.buckets.split(",")]

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.preproc.ribbon import pack_crops
    from ocrfa_tpu.registry import RECOGNITION_MODELS

    rng = np.random.default_rng(0)
    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    converter = CTCLabelConverter(chars)
    keep = keep_mask_for(converter.num_classes, converter.ignore_idx)
    keep_dev = jax.device_put(jnp.asarray(keep))
    calib = ((rng.integers(0, 255, (128, 64, 256, 1)) / 255.0 - 0.5) / 0.5
             ).astype(np.float32)

    results = {}
    for cfg in args.configs.split(","):
        variant, oc = cfg.split(":")
        oc = int(oc)
        params = init_crnn_gen1(jax.random.PRNGKey(0),
                                num_class=converter.num_classes,
                                output_channel=oc, hidden_size=oc)
        rec = Recognizer(params, converter, variant=variant,
                         quantized="static", calibration_batches=[calib])
        per_bucket = {}
        for out_w in buckets:
            # crops that need exactly this bucket (aspect = out_w/64)
            crops = []
            for _ in range(args.chunk):
                h = int(rng.integers(24, 41))
                w = max(16, int(h * out_w / 64) - 2)
                crops.append(rng.integers(0, 255, (h, w), dtype=np.uint8))
            flat, meta = pack_crops(crops)
            flat_dev = jax.device_put(jnp.asarray(flat))
            meta_dev = jax.device_put(jnp.asarray(meta))
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    out = rec._apply_ribbon(rec.params, flat_dev, meta_dev,
                                            keep_dev, out_w=out_w, wire="u8")
                np.asarray(out[:1])
                best = max(best, args.chunk * args.reps
                           / (time.perf_counter() - t0))
            per_bucket[out_w] = round(best, 1)
            print(json.dumps({"config": cfg, "bucket": out_w,
                              "lines_per_sec": per_bucket[out_w]}), flush=True)
        hm = len(per_bucket) / sum(1.0 / v for v in per_bucket.values())
        results[cfg] = {"per_bucket": per_bucket,
                        "harmonic_mean": round(hm, 1)}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
