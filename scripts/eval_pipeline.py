"""CER / latency harness (BASELINE.md metrics).

Compares the parity recognition path (host PIL preproc, reference-exact)
against the serving path (device page pipeline) on synthetic pages, and
reports CER between them plus per-page latency percentiles.

With real reference outputs available (a TSV of ``image_path<TAB>text``),
pass ``--truth`` to score CER against ground truth instead.

Usage:
  python scripts/eval_pipeline.py [--pages N] [--truth file.tsv]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def synthetic_pages(n, seed=0):
    rng = np.random.default_rng(seed)
    pages = []
    for _ in range(n):
        page = np.full((416, 640), 235, dtype=np.uint8)
        for row in range(4):
            y = 40 + row * 90
            w = int(rng.integers(200, 560))
            page[y:y + 28, 20:20 + w] = rng.integers(0, 90, (28, w))
        pages.append(page)
    return pages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=8)
    ap.add_argument("--truth", type=str, default=None)
    args = ap.parse_args()

    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.eval import cer, latency_percentiles
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.registry import RECOGNITION_MODELS
    from ocrfa_tpu.serving import ServingPipeline

    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    conv = CTCLabelConverter(chars)
    rec = Recognizer(
        init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes), conv
    )
    serving = ServingPipeline(init_craft(jax.random.PRNGKey(1)), rec, canvas_size=640)

    pages = synthetic_pages(args.pages)

    # warm + latency measurement for the serving path
    def one_page(p):
        return serving.finish_page(serving.submit_page(p))

    stats = latency_percentiles(one_page, pages, warmup=2)
    print("serving per-page latency:", stats)

    # serving vs parity-path CER on the same boxes
    texts_serving, texts_parity = [], []
    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.pipeline import get_text

    keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
    for page in pages:
        handle = serving.submit_page(page)
        res = serving.finish_page(handle)
        texts_serving += [t for _, t, _ in res]
        boxes = [
            [q[0][0], q[1][0], q[0][1], q[2][1]] for q, _, _ in res
        ]
        from ocrfa_tpu.geometry import get_image_list

        image_list, max_width = get_image_list(boxes, [], page, model_height=64)
        parity = get_text(chars, 64, int(max_width), rec, image_list)
        texts_parity += [t for _, t, _ in parity]

    rate = cer(texts_serving, texts_parity)
    print(f"serving-vs-parity CER: {rate:.4f} over {len(texts_parity)} lines")

    if args.truth:
        truths = [line.split("\t")[1].strip() for line in open(args.truth)]
        print("CER vs ground truth:", cer(texts_parity, truths))


if __name__ == "__main__":
    main()
