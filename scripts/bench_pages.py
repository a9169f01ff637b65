"""Full-page serving benchmark (BASELINE configs 3/5 metrics).

Streams synthetic A4-ish pages through the ServingPipeline and reports
pages/sec plus per-page latency percentiles (the BASELINE p50 metric).
Not the driver headline (that's bench.py's line throughput) — run manually.

Corpus-scale mode (BASELINE config 5): ``--pages 10000`` streams 10k+
pages through the pipelined path; pages are generated lazily from a
cycling 64-page pool so host memory stays flat while every page still
pays its real relay upload.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def make_pool(rng, n_pool: int):
    pages = []
    for _ in range(n_pool):
        page = np.full((1088, 832), 240, dtype=np.uint8)
        for row in range(10):
            y = 40 + row * 100
            w = int(rng.integers(300, 760))
            page[y:y + 36, 30:30 + w] = rng.integers(0, 80, (36, w))
        pages.append(page)
    return pages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=24)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--pool", type=int, default=64,
                    help="distinct pages cycled through the stream")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.eval import latency_percentiles
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.registry import RECOGNITION_MODELS
    from ocrfa_tpu.serving import ServingPipeline
    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    conv = CTCLabelConverter(chars)
    rec = Recognizer(init_crnn_gen1(jax.random.PRNGKey(0), conv.num_classes),
                     conv, quantized=True)
    pipe = ServingPipeline(init_craft(jax.random.PRNGKey(1)), rec,
                           canvas_size=960, low_text=0.002,
                           text_threshold=0.01, link_threshold=0.9)

    rng = np.random.default_rng(0)
    pool = make_pool(rng, min(args.pool, args.pages))

    stats = latency_percentiles(
        lambda p: pipe.finish_page(pipe.submit_page(p)), pool[:24], warmup=3
    )

    def stream():
        for i in range(args.pages):
            yield pool[i % len(pool)]

    t0 = time.perf_counter()
    total_lines = 0
    done = 0
    for result in pipe.process(stream(), depth=args.depth):
        total_lines += len(result)
        done += 1
        if done % 500 == 0:
            dt = time.perf_counter() - t0
            print(f"{done}/{args.pages} pages  {done/dt:.2f} pages/s  "
                  f"({dt:.0f}s)", flush=True)
    dt = time.perf_counter() - t0

    metrics = {
        "pages": args.pages,
        "depth": args.depth,
        "pages_per_sec": round(args.pages / dt, 2),
        "lines_recognized": total_lines,
        "lines_per_sec": round(total_lines / dt, 1),
        "wall_seconds": round(dt, 1),
        "p50_page_ms": round(stats["p50_ms"], 1),
        "p90_page_ms": round(stats["p90_ms"], 1),
    }
    print(json.dumps(metrics))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
