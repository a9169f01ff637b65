"""Full-page serving benchmark (BASELINE configs 3/5 metrics).

Streams synthetic A4-ish pages through the ServingPipeline and reports
pages/sec plus per-page latency percentiles (the BASELINE p50 metric).
Not the driver headline (that's bench.py's line throughput) — run manually.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main(n_pages: int = 24):
    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.eval import latency_percentiles
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.registry import RECOGNITION_MODELS
    from ocrfa_tpu.serving import ServingPipeline

    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    conv = CTCLabelConverter(chars)
    rec = Recognizer(init_crnn_gen1(jax.random.PRNGKey(0), conv.num_classes),
                     conv, quantized=True)
    pipe = ServingPipeline(init_craft(jax.random.PRNGKey(1)), rec,
                           canvas_size=960, low_text=0.002,
                           text_threshold=0.01, link_threshold=0.9)

    rng = np.random.default_rng(0)
    pages = []
    for _ in range(n_pages):
        page = np.full((1088, 832), 240, dtype=np.uint8)
        for row in range(10):
            y = 40 + row * 100
            w = int(rng.integers(300, 760))
            page[y:y + 36, 30:30 + w] = rng.integers(0, 80, (36, w))
        pages.append(page)

    stats = latency_percentiles(
        lambda p: pipe.finish_page(pipe.submit_page(p)), pages, warmup=3
    )
    t0 = time.perf_counter()
    total_lines = 0
    for result in pipe.process(pages, depth=2):
        total_lines += len(result)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "pages_per_sec": round(n_pages / dt, 2),
        "lines_recognized": total_lines,
        "p50_page_ms": round(stats["p50_ms"], 1),
        "p90_page_ms": round(stats["p90_ms"], 1),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
