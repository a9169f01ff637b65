"""Measure the REFERENCE pipeline's own recognition throughput on CPU.

BASELINE.md lists "reference throughput (to be measured by us)" as the
comparison point for the 5,000 lines/s/chip north star: the reference
(`erfanzar/OCR-FA`) publishes no numbers, so we run its actual code —
`ocrfa.utils.get_text` -> `recognizer_predict` (utils.py:605-662, the
exact driver `OCR.recognize` calls, ocr.py:399-425) — on this host's CPU
at production scale (generation1, 512 output channels / 512 hidden,
arabic_g1 charset) and record lines/s.

Two modes, mirroring the reference's own dispatch logic (ocr.py:399):

* ``default`` — what a CPU user actually gets: `recognize()` loops over
  boxes one at a time (`batch_size == 1 or device == "cpu"` branch),
  one `get_text` call per line.
* ``batched`` — best case: one `get_text` over the whole corpus with a
  large batch (the branch the reference only reaches on GPU), which
  amortises loader and softmax-renorm overhead.

Weights are random-init — throughput does not depend on weight values —
and `torch.quantization.quantize_dynamic` is applied exactly as the
reference does for every CPU model (utils.py:686-690).  The corpus matches
`bench.py` (heights 24-40 px, aspects 2-8) so the numbers are directly
comparable with the TPU serving bench.

Run:  python scripts/bench_reference_cpu.py [--budget 90] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def make_corpus(rng, n):
    """Same distribution as bench.py:make_corpus (native scan resolution)."""
    import numpy as np

    crops = []
    for _ in range(n):
        h = int(rng.integers(24, 41))
        aspect = float(rng.uniform(2.0, 8.0))
        w = max(16, int(h * aspect))
        crops.append(rng.integers(0, 255, (h, w), dtype=np.uint8))
    return crops


def build_reference_recognizer():
    """Production-scale generation1 model via the reference's own classes."""
    import torch

    from tests.ref_stubs import REF_SRC, install_reference_stubs

    install_reference_stubs()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import ocrfa.utils as U
    from ocrfa.modules import Model

    from ocrfa_tpu.registry import RECOGNITION_MODELS

    cfg = RECOGNITION_MODELS["gen1"]["arabic_g1"]
    character = cfg["characters"]
    converter = U.CTCLabelConverter(character, {}, {})
    num_class = len(converter.character)
    # network_params per the reference's generation1 config
    # (mirrored in ocrfa_tpu.registry.NETWORK_PARAMS)
    model = Model(input_channel=1, output_channel=512, hidden_size=512,
                  num_class=num_class)
    model.eval()
    # the reference always dynamic-int8-quantizes CPU models (utils.py:686-690)
    try:
        torch.quantization.quantize_dynamic(model, dtype=torch.qint8,
                                            inplace=True)
    except Exception:
        pass
    return U, model, converter, character


def line_imgw(crop, img_h=64):
    h, w = crop.shape
    return int(math.ceil(img_h * (w / float(h))))


def run_default_mode(U, model, converter, character, crops, budget_s):
    """Reference CPU default: one get_text per line, batch_size=1."""
    quad = ((0, 0), (1, 0), (1, 1), (0, 1))
    # warmup (compile-free in torch, but primes allocator/threadpools)
    U.get_text(character, 64, line_imgw(crops[0]), model, converter,
               [(quad, crops[0])], batch_size=1, workers=0, device="cpu")
    n_done = 0
    t0 = time.perf_counter()
    for crop in crops:
        U.get_text(character, 64, line_imgw(crop), model, converter,
                   [(quad, crop)], batch_size=1, workers=0, device="cpu")
        n_done += 1
        if time.perf_counter() - t0 > budget_s:
            break
    dt = time.perf_counter() - t0
    return n_done / dt, n_done


def run_batched_mode(U, model, converter, character, crops, budget_s,
                     batch_size=32):
    """Reference best case: one get_text over the corpus, large batch."""
    quad = ((0, 0), (1, 0), (1, 1), (0, 1))
    imgw = max(line_imgw(c) for c in crops)
    image_list = [(quad, c) for c in crops]
    # one timed pass over as many full batches as fit the budget
    n_done = 0
    t0 = time.perf_counter()
    for start in range(0, len(image_list), batch_size):
        chunk = image_list[start:start + batch_size]
        U.get_text(character, 64, imgw, model, converter, chunk,
                   batch_size=batch_size, workers=0, device="cpu")
        n_done += len(chunk)
        if time.perf_counter() - t0 > budget_s:
            break
    dt = time.perf_counter() - t0
    return n_done / dt, n_done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=90.0,
                    help="per-mode time budget, seconds")
    ap.add_argument("--n", type=int, default=256, help="corpus size cap")
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    rng = np.random.default_rng(0)
    crops = make_corpus(rng, args.n)

    U, model, converter, character = build_reference_recognizer()

    default_lps, n_def = run_default_mode(
        U, model, converter, character, crops, args.budget)
    batched_lps, n_bat = run_batched_mode(
        U, model, converter, character, crops, args.budget)

    out = {
        "metric": "reference_cpu_lines_per_sec",
        "default_batch1_lines_per_sec": round(default_lps, 3),
        "batched_b32_lines_per_sec": round(batched_lps, 3),
        "lines_measured": {"default": n_def, "batched": n_bat},
        "cpu_count": os.cpu_count(),
        "torch_threads": torch.get_num_threads(),
        "model": "generation1 512/512 arabic_g1 charset, dynamic int8 "
                 "(reference CPU default)",
        "corpus": "bench.py distribution: h 24-40 px, aspect 2-8",
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
