"""Benchmark: text-line recognition throughput (BASELINE.md headline).

Measures steady-state text-line images/sec/chip through the production
serving path on realistic inputs:

* corpus: synthetic word/phrase line crops at NATIVE scan resolution
  (heights 24-40 px, aspect ratios 2-8 — 150-dpi-scan-like), grouped onto
  the serving width-bucket ladder;
* wire: the ribbon format (`preproc.ribbon`) — crops cross the relay as
  packed native-size uint8 bytes, 2-4x less traffic than padded batches;
* device: fused ribbon-unpack -> calibrated static-int8 CRNN (the TPU
  equivalent of the reference's always-on dynamic int8, utils.py:687-690)
  -> CTC postprocess, one program per (ribbon, batch, width) bucket;
* pipelining: depth-8 in-flight dispatches so upload, device compute and
  host string collapse overlap.

Reporting (one JSON line): headline `value` is the MEDIAN end-to-end
lines/s over measurement windows (best also reported — the relay's
throughput swings +-2x across sessions, CLAUDE.md); `compute_only` is the
same fused program on device-resident input (no per-batch upload);
`relay_mbps`/`wire_kb_per_line` give the transport ceiling the e2e number
is bounded by on this host.

Baseline: BASELINE.json north star = 5,000 lines/sec/chip on TPU v5e.

Relay shielding: `python bench.py` supervises (awaits a STABLE relay via
fresh-subprocess probes, runs the measurement as a `--measure` child under
a hang deadline, retries after an idle window, 45 min horizon) so a relay
flap at capture time degrades to a late measurement instead of a lost
round artifact (BENCH_r04 was lost exactly that way).
"""

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

BASELINE_LINES_PER_SEC = 5000.0

import os

# ---- relay-flap shielding (supervisor mode) --------------------------------
# The axon relay dies silently for stretches and FLAPS (CLAUDE.md); round 4
# lost its headline artifact to exactly that (BENCH_r04: rc 134 after one
# 300 s probe).  `python bench.py` therefore now runs as a SUPERVISOR: it
# waits for a STABLE relay (consecutive fresh-subprocess probes — a hung
# in-process axon client never recovers, so probing must not reuse one),
# then runs the measurement as a child (`bench.py --measure`) under a hang
# deadline, and on child failure idles and retries until MAX_WALL_S.
MAX_WALL_S = float(os.environ.get("BENCH_MAX_WALL_S", "2700"))   # 45 min
CHILD_TIMEOUT_S = float(os.environ.get("BENCH_CHILD_TIMEOUT_S", "1500"))
PROBE_TIMEOUT_S = 210.0    # must cover degraded-relay first-dispatch 30-150 s
STABLE_PROBES = 3
STABLE_GAP_S = 20.0
RETRY_IDLE_S = 120.0


def _relay_up(timeout_s: float = PROBE_TIMEOUT_S) -> bool:
    """One trivial dispatch in a FRESH subprocess (see scripts/await_relay.py)."""
    probe = ("import jax, numpy as np; "
             "print(float(np.asarray(jax.numpy.ones((8, 8)).sum())))")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0 and b"64.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _await_stable(deadline: float) -> bool:
    good = 0
    while time.time() < deadline:
        if _relay_up(min(PROBE_TIMEOUT_S, max(10.0, deadline - time.time()))):
            good += 1
            if good >= STABLE_PROBES:
                return True
            time.sleep(STABLE_GAP_S)
        else:
            good = 0
            print(f"[bench] relay down; re-probing "
                  f"({deadline - time.time():.0f}s left)",
                  file=sys.stderr, flush=True)
            time.sleep(30.0)
    return False


def supervise() -> int:
    deadline = time.time() + MAX_WALL_S
    attempt = 0
    while time.time() < deadline:
        if not _await_stable(deadline):
            break
        attempt += 1
        budget = min(CHILD_TIMEOUT_S, max(60.0, deadline - time.time()))
        print(f"[bench] relay stable; measurement attempt #{attempt} "
              f"(child deadline {budget:.0f}s)", file=sys.stderr, flush=True)
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--measure"],
                timeout=budget, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print("[bench] child hung past deadline (relay died "
                  "mid-measurement?) — idling then retrying",
                  file=sys.stderr, flush=True)
            time.sleep(RETRY_IDLE_S)
            continue
        sys.stderr.write(r.stderr[-4000:])
        line = next((ln for ln in reversed(r.stdout.splitlines())
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line is not None:
            parsed = json.loads(line)
            if "error" not in parsed:
                print(line, flush=True)
                return 0
        print(f"[bench] child rc={r.returncode} "
              f"result={'error' if line else 'none'} — idling then retrying",
              file=sys.stderr, flush=True)
        time.sleep(RETRY_IDLE_S)
    print(json.dumps({
        "metric": "textline_images_per_sec_per_chip",
        "value": 0.0,
        "unit": "img/s/chip",
        "vs_baseline": 0.0,
        "error": f"backend unreachable: no valid measurement within "
                 f"{MAX_WALL_S:.0f}s supervisor horizon ({attempt} attempts) "
                 "— not a measurement",
    }), flush=True)
    return 1

N_LINES = 4096          # corpus size per measurement window
CHUNK = int(os.environ.get("BENCH_CHUNK", "512"))   # device batch/dispatch
DEPTH = int(os.environ.get("BENCH_DEPTH", "8"))     # in-flight dispatches
# serving tower (models/crnn.py): gen1w8 = width-strided /8 pool (~0.61x
# tower FLOPs, T = W/8+1); gen1t384 = layer3/4 thinned to 384ch (~0.66x,
# T = W/4+1 kept — the CTC-friendlier cut, held CER 0.050 vs w8's 0.061);
# BENCH_VARIANT=gen1 benches the stock reference-parity tower
VARIANT = os.environ.get("BENCH_VARIANT", "gen1t384")
WINDOWS = 5
# bf16-equivalent tower FLOPs at bucket 256: 50.8 GFLOP stock; layer3/4 =
# 78% of tower FLOPs (CLAUDE.md) at half width (w8) or (384/512)^2 (t384)
CONV_GFLOP_PER_LINE_W256 = 50.8 * {"gen1w8": 0.61, "gen1t384": 0.66}.get(
    VARIANT, 1.0)


def make_corpus(rng, n):
    """Native-resolution grey crops: h ~ U{24..40}, aspect ~ 2..8."""
    import numpy as np

    crops = []
    for _ in range(n):
        h = int(rng.integers(24, 41))
        aspect = float(rng.uniform(2.0, 8.0))
        w = max(16, int(h * aspect))
        crops.append(rng.integers(0, 255, (h, w), dtype=np.uint8))
    return crops


def backend_alive(timeout=240.0):
    """True once a trivial dispatch round-trips.

    The axon relay can die mid-session (observed: tunnel process exits,
    every dispatch blocks forever) — without this watchdog the bench
    hangs instead of reporting, and the round loses its artifact."""
    import threading

    ok = []

    def probe():
        import jax
        import numpy as np

        ok.append(float(np.asarray(jax.numpy.ones((8, 8)).sum())))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout)
    return bool(ok)


def main():
    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if not backend_alive():
        print(json.dumps({
            "metric": "textline_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "img/s/chip",
            "vs_baseline": 0.0,
            "error": "backend unreachable: no dispatch completed within "
                     "240s (axon relay down?) — not a measurement",
        }))
        sys.exit(3)  # nonzero so the supervisor knows to retry

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.preproc.buckets import SERVING_WIDTH_BUCKETS, chunk_by_width
    from ocrfa_tpu.registry import RECOGNITION_MODELS

    rng = np.random.default_rng(0)

    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    converter = CTCLabelConverter(chars)
    params = init_crnn_gen1(
        jax.random.PRNGKey(0), num_class=converter.num_classes,
        late_channel=384 if VARIANT == "gen1t384" else None)
    calib = ((rng.integers(0, 255, (128, 64, 256, 1)) / 255.0 - 0.5) / 0.5
             ).astype(np.float32)
    recognizer = Recognizer(
        params, converter,
        variant="gen1" if VARIANT == "gen1t384" else VARIANT,
        quantized="static", calibration_batches=[calib])
    keep_mask = keep_mask_for(converter.num_classes, converter.ignore_idx)

    crops = make_corpus(rng, N_LINES)

    # width-sorted FULL chunks (chunk_by_width): per-bucket chunking left
    # one ragged dispatch per occupied bucket — ~13% of e2e on this corpus
    need_w = [max(16, int(np.ceil(64 * c.shape[1] / c.shape[0]))) for c in crops]
    chunks = [([crops[i] for i in idxs], out_w)
              for idxs, out_w in chunk_by_width(need_w, CHUNK,
                                                SERVING_WIDTH_BUCKETS)]

    # wire accounting: actual packed row-ribbon bytes that cross the relay
    from ocrfa_tpu.preproc.ribbon import pack_crops

    wire_bytes = {
        w: sum(pack_crops(chunk, wire=w)[0].nbytes for chunk, _ in chunks)
        for w in ("u8", "u4")
    }

    def run_window(wire):
        t0 = time.perf_counter()
        inflight = []
        done = 0
        for chunk, out_w in chunks:
            inflight.append(
                recognizer.predict_ribbon_async(chunk, keep_mask, out_w, wire=wire))
            if len(inflight) >= DEPTH:
                done += len(recognizer.collect(inflight.pop(0)))
        while inflight:
            done += len(recognizer.collect(inflight.pop(0)))
        return done / (time.perf_counter() - t0)

    run_window("u8")  # warm: compiles every bucket
    run_window("u4")
    run_window("u1")
    # Interleave wires across windows: the relay's throughput drifts WITHIN
    # a session (observed 45 -> 26 MB/s over one bench run), so running each
    # wire as its own block hands whichever goes first the better relay.
    e2e_u8, e2e, e2e_u1 = [], [], []
    for _ in range(WINDOWS):
        e2e_u8.append(run_window("u8"))
        # u4 wire: the production serving config — 4-bit pixels halve relay
        # traffic; CER impact ~0 on the trained eval (eval_farsi.py)
        e2e.append(run_window("u4"))
        # u1 wire: binary-scan config (8x fewer bytes; exact for thresholded
        # documents) — where the pipeline lands once transfer stops binding
        e2e_u1.append(run_window("u1"))

    # compute-only per width bucket on device-resident input -> the corpus
    # mixture ceiling (harmonic mean over equal-line buckets)
    keep_dev = jax.device_put(jnp.asarray(keep_mask))
    per_bucket = {}
    for out_w, group in sorted(
            {w: c for c, w in chunks if len(c) == CHUNK}.items()):
        flat, meta = pack_crops(group)
        flat_dev = jax.device_put(jnp.asarray(flat))
        meta_dev = jax.device_put(jnp.asarray(meta))
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            reps = 6
            for _ in range(reps):
                out = recognizer._apply_ribbon(
                    recognizer.params, flat_dev, meta_dev, keep_dev,
                    out_w=out_w, wire="u8")
            np.asarray(out[:1])  # sync on a slice of the packed payload
            best = max(best, CHUNK * reps / (time.perf_counter() - t0))
        per_bucket[out_w] = best
    compute_only = per_bucket.get(256) or max(per_bucket.values())
    mixture_ceiling = len(per_bucket) / sum(1.0 / v for v in per_bucket.values())

    # sustained relay throughput for the ACTUAL u4 ribbons (burst uploads
    # overestimate; this is the stream the e2e path pushes)
    packed = [pack_crops(c, wire="u4")[0] for c, _ in chunks]
    jax.device_put(packed[0])
    t0 = time.perf_counter()
    bufs = [jax.device_put(p) for p in packed]
    np.asarray(bufs[-1][:1])
    dt = time.perf_counter() - t0
    relay_mbps = sum(p.nbytes for p in packed) / dt / 1e6
    upload_equiv = N_LINES / dt  # lines/s if transfer were the only cost

    # headline: best FULL-FIDELITY wire median (u8 vs u4) — a deployment
    # picks one wire; u1 (lossy for non-binary scans) reported separately
    med_u8 = statistics.median(e2e_u8)
    med_u4 = statistics.median(e2e)
    value, headline_wire = max((med_u4, "u4"), (med_u8, "u8"))
    kb_u4 = wire_bytes["u4"] / N_LINES / 1024
    kb_u8 = wire_bytes["u8"] / N_LINES / 1024
    print(json.dumps({
        "metric": "textline_images_per_sec_per_chip",
        "value": round(value, 1),
        "variant": VARIANT,
        "unit": "img/s/chip",
        "vs_baseline": round(value / BASELINE_LINES_PER_SEC, 3),
        "headline_wire": headline_wire,
        "e2e_u4_wire_median": round(med_u4, 1),
        "e2e_best": round(max(e2e + e2e_u8), 1),
        "e2e_u8_wire_median": round(statistics.median(e2e_u8), 1),
        "e2e_u1_wire_median": round(statistics.median(e2e_u1), 1),
        "e2e_u1_wire_best": round(max(e2e_u1), 1),
        "compute_only_w256": round(compute_only, 1),
        "compute_mixture_ceiling": round(mixture_ceiling, 1),
        "relay_sustained_mbps": round(relay_mbps, 1),
        "upload_equiv_lines_per_sec": round(upload_equiv, 1),
        "relay_bound_fraction": round(value / upload_equiv, 3),
        "wire_kb_per_line": round(kb_u4, 2),
        "wire_kb_per_line_u8": round(kb_u8, 2),
        "mfu_compute_only": round(
            compute_only * CONV_GFLOP_PER_LINE_W256 * 1e9 / 394.0e12, 3),
    }))


if __name__ == "__main__":
    if "--measure" in sys.argv:
        main()
    else:
        sys.exit(supervise())
