"""Probe: gather DCN vs bounded dense-shift DCN vs plain conv on TPU.

VERDICT r2 weak #3 / next-step #5: the DCN row-gather op runs ~6x a plain
conv at dbnet18's /8 stage, making dbnet18 pages 0.80x CRAFT.  The
bounded-offset formulation (``ops.deform_conv.modulated_deform_conv_bounded``)
replaces the gathers with (2R+2)^2 statically shifted FMA passes — pure
VPU/MXU work — at the cost of clamping offsets to +-R.

Times the three implementations at the exact shapes dbnet18's DCN stages
see at 736^2 (b16 by default — at b4 every number is the ~27 ms relay RTT
floor, CLAUDE.md), plus the end-to-end dbnet18 forward with each impl.

Run:  python scripts/probe_dcn.py [--batch 16] [--size 736]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def time_op(fn, *args, reps=8):
    """Median of 3 windows; syncs via a scalar fetch (np.asarray of a full
    output would measure the ~20 MB/s relay download, CLAUDE.md)."""
    import jax.numpy as jnp

    out = fn(*args)
    float(np.asarray(jnp.sum(out[..., :1])))  # compile + settle
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(jnp.sum(out[..., :1])))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=736)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ocrfa_tpu.models.layers import conv2d
    from ocrfa_tpu.ops.deform_conv import (
        modulated_deform_conv,
        modulated_deform_conv_bounded,
    )

    rng = np.random.default_rng(0)
    res = {"batch": args.batch, "size": args.size, "stages": {}}

    # dbnet18 DCN stages at /8, /16, /32 of a size^2 page
    for name, (div, ch) in {"s8": (8, 128), "s16": (16, 256),
                            "s32": (32, 512)}.items():
        hw = args.size // div
        n = args.batch
        x = jnp.asarray(rng.standard_normal((n, hw, hw, ch)), jnp.float32)
        off = jnp.asarray(rng.uniform(-2, 2, (n, hw, hw, 18)), jnp.float32)
        m = jnp.asarray(rng.uniform(0, 1, (n, hw, hw, 9)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, ch, ch)) * 0.05,
                        jnp.float32)

        gather = jax.jit(lambda x, o, mm, w: modulated_deform_conv(
            x, o, mm, w, padding=1))
        b2 = jax.jit(lambda x, o, mm, w: modulated_deform_conv_bounded(
            x, o, mm, w, padding=1, radius=2))
        b1 = jax.jit(lambda x, o, mm, w: modulated_deform_conv_bounded(
            x, o, mm, w, padding=1, radius=1))
        plain = jax.jit(lambda x, w: conv2d(x, w, padding=1))

        stage = {
            "gather_ms": round(time_op(gather, x, off, m, w), 3),
            "bounded_r2_ms": round(time_op(b2, x, off, m, w), 3),
            "bounded_r1_ms": round(time_op(b1, x, off, m, w), 3),
            "plain_conv_ms": round(time_op(plain, x, w), 3),
        }
        stage["gather_vs_plain"] = round(
            stage["gather_ms"] / stage["plain_conv_ms"], 2)
        stage["bounded_r2_vs_plain"] = round(
            stage["bounded_r2_ms"] / stage["plain_conv_ms"], 2)
        stage["bounded_r1_vs_plain"] = round(
            stage["bounded_r1_ms"] / stage["plain_conv_ms"], 2)
        res["stages"][name] = stage
        print(name, json.dumps(stage), flush=True)

    print(json.dumps(res))
    if args.out:
        Path(args.out).write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
