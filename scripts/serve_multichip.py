"""Multi-chip / multi-host serving example (BASELINE.json config 5).

Streams grey pages through :class:`ocrfa_tpu.serving.ServingPipeline` with
detector+recognizer params replicated over a device mesh and page batches
dp-sharded (`submit_page_batch`), depth-pipelined.

Single host, all local chips:
  python scripts/serve_multichip.py --pages 64

Multi-host (one process per host, same flags on each + coordinator):
  python scripts/serve_multichip.py --coordinator <host0-ip>:8476 \
      --num-processes 4 --process-id $SLURM_PROCID
`jax.distributed.initialize` wires the hosts; `jax.devices()` then spans
every chip and the same mesh code scales out — collectives ride ICI within
a slice (the reference's DataParallel has no multi-host analog;
detectors.py:88 wraps a single-process torch DataParallel).

CPU rehearsal (8 virtual devices):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/serve_multichip.py --cpu --pages 16 --page-size 256
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=64)
    ap.add_argument("--page-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=0,
                    help="pages per sharded dispatch (default: mesh size)")
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--coordinator", type=str, default=None,
                    help="host:port of process 0 (enables jax.distributed)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (axon overrides JAX_PLATFORMS)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.parallel.mesh import create_mesh
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.registry import RECOGNITION_MODELS
    from ocrfa_tpu.serving import ServingPipeline

    devices = jax.devices()
    mesh = create_mesh(devices) if len(devices) > 1 else None
    batch = args.batch or max(len(devices), 1)
    print(f"{jax.process_count()} process(es), {len(devices)} device(s), "
          f"batch {batch}, mesh={'dp' if mesh else 'none'}")

    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    conv = CTCLabelConverter(chars)
    recognizer = Recognizer(
        init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes),
        conv, mesh=mesh)
    pipeline = ServingPipeline(init_craft(jax.random.PRNGKey(1)), recognizer,
                               canvas_size=args.page_size, mesh=mesh)

    rng = np.random.default_rng(jax.process_index())
    pages = [rng.integers(0, 255, (args.page_size, args.page_size),
                          dtype=np.uint8) for _ in range(args.pages)]

    # warm (compiles detector + recognition buckets)
    handles = pipeline.submit_page_batch(pages[:batch])
    for h in handles:
        pipeline.finish_page(h)

    t0 = time.perf_counter()
    inflight, done = [], 0
    for s in range(0, len(pages) - len(pages) % batch, batch):
        inflight.append(pipeline.submit_page_batch(pages[s:s + batch]))
        if len(inflight) >= args.depth:
            for h in inflight.pop(0):
                pipeline.finish_page(h)
                done += 1
    while inflight:
        for h in inflight.pop(0):
            pipeline.finish_page(h)
            done += 1
    dt = time.perf_counter() - t0

    metrics = {
        "pages": done,
        "devices": len(devices),
        "processes": jax.process_count(),
        "pages_per_sec": round(done / dt, 2),
        "p50_ms_per_batch": round(dt / max(done // batch, 1) * 1000, 1),
    }
    print(json.dumps(metrics))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
