"""Probe: where do the serving path's dispatch gaps come from?

VERDICT r2 weak #2: u1 e2e runs at ~85% of the width-mixture compute
ceiling even though the u1 wire is not relay-bound.  The suspect is the
per-chunk payload fetch in ``Recognizer.collect`` — one blocking
``np.asarray`` (~26 ms relay RTT regardless of size, CLAUDE.md) on the
same host thread that dispatches the next chunk.

Three pump designs over identical chunked work:

A. baseline   — dispatch; when DEPTH in flight, blocking collect (today's
                ``bench.py``/``pipeline.py`` loop);
B. d2h-eager  — same, but ``copy_to_host_async()`` fires right after each
                dispatch so the relay D2H overlaps device compute and the
                later ``np.asarray`` finds the bytes already host-side;
C. fetch-pool — a 2-thread collector pulls ``np.asarray`` off the pump
                thread entirely (``concurrent.futures``); the pump only
                dispatches.

Prints one JSON line with lines/s for each and the gap each closes.
"""

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

N_LINES = 2048
CHUNK = 512
DEPTH = 8
WIRE = "u1"


def make_corpus(rng, n):
    crops = []
    for _ in range(n):
        h = int(rng.integers(24, 41))
        w = max(16, int(h * float(rng.uniform(2.0, 8.0))))
        crops.append(rng.integers(0, 255, (h, w), dtype=np.uint8))
    return crops


def main():
    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.preproc.buckets import SERVING_WIDTH_BUCKETS, bucketize
    from ocrfa_tpu.registry import RECOGNITION_MODELS

    rng = np.random.default_rng(0)
    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    converter = CTCLabelConverter(chars)
    params = init_crnn_gen1(jax.random.PRNGKey(0),
                            num_class=converter.num_classes)
    calib = ((rng.integers(0, 255, (128, 64, 256, 1)) / 255.0 - 0.5) / 0.5
             ).astype(np.float32)
    rec = Recognizer(params, converter, variant="gen1w8", quantized="static",
                     calibration_batches=[calib])
    keep_mask = keep_mask_for(converter.num_classes, converter.ignore_idx)

    crops = make_corpus(rng, N_LINES)
    need_w = [max(16, int(np.ceil(64 * c.shape[1] / c.shape[0])))
              for c in crops]
    groups = bucketize(need_w, SERVING_WIDTH_BUCKETS)
    chunks = []
    for out_w, idxs in sorted(groups.items()):
        idxs = sorted(idxs, key=lambda i: crops[i].shape[1])
        for s in range(0, len(idxs), CHUNK):
            chunks.append(([crops[i] for i in idxs[s:s + CHUNK]], out_w))

    def pump_baseline():
        t0 = time.perf_counter()
        inflight, done = [], 0
        for chunk, out_w in chunks:
            inflight.append(
                rec.predict_ribbon_async(chunk, keep_mask, out_w, wire=WIRE))
            if len(inflight) >= DEPTH:
                done += len(rec.collect(inflight.pop(0)))
        while inflight:
            done += len(rec.collect(inflight.pop(0)))
        return done / (time.perf_counter() - t0)

    def pump_d2h_eager():
        t0 = time.perf_counter()
        inflight, done = [], 0
        for chunk, out_w in chunks:
            h = rec.predict_ribbon_async(chunk, keep_mask, out_w, wire=WIRE)
            try:
                h[0].copy_to_host_async()
            except Exception:
                pass
            inflight.append(h)
            if len(inflight) >= DEPTH:
                done += len(rec.collect(inflight.pop(0)))
        while inflight:
            done += len(rec.collect(inflight.pop(0)))
        return done / (time.perf_counter() - t0)

    def pump_fetch_pool(workers=2):
        t0 = time.perf_counter()
        done = 0
        with ThreadPoolExecutor(workers) as pool:
            futs = []
            for chunk, out_w in chunks:
                h = rec.predict_ribbon_async(chunk, keep_mask, out_w,
                                             wire=WIRE)
                futs.append(pool.submit(rec.collect, h))
                # bound host memory the way DEPTH does, without blocking
                # the pump on a fetch RTT
                while len(futs) >= DEPTH and futs[0].done():
                    done += len(futs.pop(0).result())
            for f in futs:
                done += len(f.result())
        return done / (time.perf_counter() - t0)

    # warm every bucket once
    pump_baseline()
    res = {}
    for name, fn in (("baseline", pump_baseline),
                     ("d2h_eager", pump_d2h_eager),
                     ("fetch_pool", pump_fetch_pool)):
        vals = [fn() for _ in range(3)]
        res[name] = round(max(vals), 1)
        res[name + "_all"] = [round(v, 1) for v in vals]

    res["wire"] = WIRE
    res["gain_d2h"] = round(res["d2h_eager"] / res["baseline"], 3)
    res["gain_pool"] = round(res["fetch_pool"] / res["baseline"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
