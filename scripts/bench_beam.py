"""Device beam-search serving throughput (BASELINE config 2).

Measures end-to-end recognizer throughput with the on-device CTC prefix
beam (``decode/beam_device.ctc_beam_search_device``) replacing greedy
argmax, over the same width-bucketed corpus shape as ``bench.py``'s
compute path — the number BASELINE.json config 2 asks for ("256
variable-width Farsi lines, width-bucketed padding + beam-search CTC").

The beam adds a (T, beam, K) lax.scan after the tower; the question is
what fraction of the greedy path's throughput survives.  Device-resident
inputs (compute-only, like bench.py's ``compute_only_w256``) isolate the
decode cost from the relay.

Usage: python scripts/bench_beam.py [--beam-width 8] [--batch 512]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--beam-width", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--merge", default="dense",
                    help="beam merge impl: dense ((m,m) equality, TPU "
                         "fast path) or sort (lexsort+segment baseline)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.batch, args.rounds = 16, 2
    else:
        from ocrfa_tpu.utils.resilience import require_backend

        require_backend()

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.decode.beam_device import ctc_beam_search_device
    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.models.crnn import crnn_apply, init_crnn_gen1
    from ocrfa_tpu.registry import RECOGNITION_MODELS

    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    conv = CTCLabelConverter(chars)
    params = init_crnn_gen1(jax.random.PRNGKey(0), conv.num_classes)
    keep = keep_mask_for(conv.num_classes, conv.ignore_idx)

    @jax.jit
    def fwd_greedy(p, im_u8):
        im = (im_u8.astype(jnp.float32) - 127.5) / 127.5
        logits = crnn_apply(p, im)
        logp = jax.nn.log_softmax(
            jnp.where(keep[None, None, :], logits, -1e9))
        return jnp.argmax(logp, axis=-1).astype(jnp.int32)

    bw = args.beam_width

    @jax.jit
    def fwd_beam(p, im_u8):
        im = (im_u8.astype(jnp.float32) - 127.5) / 127.5
        logits = crnn_apply(p, im)
        logp = jax.nn.log_softmax(
            jnp.where(keep[None, None, :], logits, -1e9))
        prefixes, lengths, scores = ctc_beam_search_device(
            logp, beam_width=bw, topk=bw, merge=args.merge)
        # reduce to one device scalar per call — fetching the full beam
        # tensor would measure the relay, not the decode (CLAUDE.md)
        return (prefixes.sum() + lengths.sum()
                + scores.sum().astype(jnp.int32))

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (args.batch, 64, args.width, 1),
                         dtype=np.uint8)
    dev = jax.device_put(jnp.asarray(batch))

    def run(fn):
        np.asarray(fn(params, dev))  # compile + warm
        best = 0.0
        for _ in range(args.rounds):
            t0 = time.time()
            np.asarray(fn(params, dev))
            best = max(best, args.batch / (time.time() - t0))
        return best

    greedy = run(fwd_greedy)
    beam = run(fwd_beam)
    out = {
        "metric": "device_beam_lines_per_sec_per_chip",
        "value": round(beam, 1),
        "greedy_lines_per_sec": round(greedy, 1),
        "beam_fraction_of_greedy": round(beam / greedy, 3),
        "beam_width": bw,
        "merge": args.merge,
        "batch": args.batch,
        "width": args.width,
        "unit": "img/s/chip (compute-only, device-resident input)",
    }
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
