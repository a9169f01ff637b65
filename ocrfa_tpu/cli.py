"""Command-line interface: ``python -m ocrfa_tpu <command>``.

The reference ships only a demo script (``experiments.py:1-17``); a
production framework needs a real entry point.  Commands:

* ``read``       — full-page OCR over image files, one JSON line each.
* ``serve``      — HTTP front-end (delegates to ``server.main``).
* ``serve-grpc`` — gRPC front-end (delegates to ``server_grpc.main``).
* ``download``   — prefetch model-zoo weights (utils.py:1421-1435 path)
                   without building the models.

Offline / self-trained deployments inject weights via ``--recognizer-pickle``
(an ``eval_farsi.save_trained`` blob: ``{"params", "meta": {"charset", ...}}``)
and ``--detector-pickle`` (an ``eval_selftrained --save-craft`` blob:
``{"params", "meta": {"detector": "craft"|"dbnet18"}}``), matching the
artifacts every training script in ``scripts/`` emits.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_pickle(path):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def build_reader(args):
    """Construct the ``OCR`` facade for the ``read`` command.

    With pickles given, weight download is skipped entirely (``detector=False,
    recognizer=False`` cold start, then injection — the same pattern the
    self-trained eval uses); otherwise the stock zoo path runs (download +
    md5 + convert).
    """
    from ocrfa_tpu.api import OCR

    if args.cpu:
        # OCR(gpu=False) only records the device string; on this host the
        # axon plugin force-registers the TPU regardless of env vars, so
        # actually pin the platform (same move as tests/conftest.py).
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    inject_det = bool(args.detector_pickle)
    inject_rec = bool(args.recognizer_pickle)
    ocr = OCR(
        gpu=not args.cpu,
        recog_network=args.recog_network,
        detect_network=args.detect_network if not inject_det else "craft",
        detector=not inject_det,
        recognizer=not inject_rec,
        download_enabled=not args.no_download,
        model_storage_directory=args.model_dir,
        user_network_directory=args.user_network_dir,
        quantize=not args.no_quantize,
        verbose=args.verbose,
    )
    if inject_det:
        from ocrfa_tpu.checkpoints import build_detector_from_blob

        kind, detector, _meta = build_detector_from_blob(
            args.detector_pickle, default_kind=args.detect_network)
        ocr.detect_network = kind
        ocr.detector = detector
    if inject_rec:
        from ocrfa_tpu.checkpoints import build_recognizer_from_blob
        from ocrfa_tpu.registry import RECOGNITION_MODELS

        recognizer, charset, _meta = build_recognizer_from_blob(
            args.recognizer_pickle,
            default_charset=RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"])
        ocr.recognizer = recognizer
        ocr.converter = recognizer.converter
        # recognize() builds allowlist/ignore masks from these; leaving the
        # zoo charset here would map indices into the wrong class space
        ocr.character = charset
        ocr.lang_char = "".join(charset)
    return ocr


def _jsonable(obj):
    """Recursively coerce numpy scalars/arrays in readtext output."""
    import numpy as np

    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def cmd_read(args):
    reader = build_reader(args)
    kwargs = dict(
        decoder=args.decoder,
        beamWidth=args.beam_width,
        batch_size=args.batch_size,
        detail=args.detail,
        paragraph=args.paragraph,
        min_size=args.min_size,
        text_threshold=args.text_threshold,
        low_text=args.low_text,
        link_threshold=args.link_threshold,
        canvas_size=args.canvas_size,
        mag_ratio=args.mag_ratio,
        add_margin=args.add_margin,
        threshold=args.threshold,
        bbox_min_score=args.bbox_min_score,
        output_format=args.output_format,
    )
    if args.allowlist:
        kwargs["allowlist"] = args.allowlist
    if args.blocklist:
        kwargs["blocklist"] = args.blocklist
    if args.rotation:
        kwargs["rotation_info"] = args.rotation
    out = args.out or sys.stdout
    close = False
    if isinstance(out, str):
        out = open(out, "w", encoding="utf8")
        close = True
    try:
        for path in args.images:
            results = reader.readtext(path, **kwargs)
            line = {"image": path, "results": _jsonable(results)}
            out.write(json.dumps(line, ensure_ascii=False) + "\n")
            out.flush()
    finally:
        if close:
            out.close()
    return 0


def cmd_download(args):
    """Prefetch zoo weights into the model dir — no model construction."""
    import os

    from ocrfa_tpu import registry
    from ocrfa_tpu.io import calculate_md5, download_and_unzip

    model_dir = args.model_dir or registry.MODULE_PATH + "/model"
    os.makedirs(model_dir, exist_ok=True)
    entries = []
    det = registry.DETECTION_MODELS[args.detect_network]
    entries.append(("detection", det))
    for gen in ("gen1", "gen2"):
        rec = registry.RECOGNITION_MODELS[gen].get(args.recog_model)
        if rec is not None:
            entries.append(("recognition", rec))
            break
    else:
        raise SystemExit(f"unknown recognition model {args.recog_model!r}")
    for kind, entry in entries:
        path = os.path.join(model_dir, entry["filename"])
        if os.path.isfile(path) and calculate_md5(path) == entry["md5sum"]:
            print(f"{kind}: {entry['filename']} already present")
            continue
        print(f"{kind}: fetching {entry['url']}")
        download_and_unzip(entry["url"], entry["filename"], model_dir,
                           verbose=args.verbose)
        got = calculate_md5(path)
        if got != entry["md5sum"]:
            raise SystemExit(
                f"MD5 mismatch for {entry['filename']}: {got} != "
                f"{entry['md5sum']}")
    print(f"weights ready under {model_dir}")
    return 0


def _add_read_parser(sub):
    p = sub.add_parser("read", help="OCR image files -> JSON lines")
    p.add_argument("images", nargs="+", help="image paths (or URLs)")
    p.add_argument("--out", default=None, help="write JSON lines here "
                   "instead of stdout")
    # model selection / weights
    p.add_argument("--detect-network", default="craft",
                   choices=["craft", "dbnet18"])
    p.add_argument("--recog-network", default="standard")
    p.add_argument("--model-dir", default=None)
    p.add_argument("--user-network-dir", default=None)
    p.add_argument("--no-download", action="store_true")
    p.add_argument("--no-quantize", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force host execution")
    p.add_argument("--recognizer-pickle", default=None,
                   help="trained recognizer blob (scripts/eval_farsi.py "
                        "--save-params)")
    p.add_argument("--detector-pickle", default=None,
                   help="trained detector blob (scripts/eval_selftrained.py "
                        "--save-craft)")
    p.add_argument("--verbose", action="store_true")
    # readtext knobs (subset of the 30-kwarg surface; the rest keep their
    # reference defaults, api.py:525-558)
    p.add_argument("--decoder", default="greedy",
                   choices=["greedy", "beamsearch", "wordbeamsearch",
                            "beamsearch_fast", "wordbeamsearch_fast"])
    p.add_argument("--beam-width", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--detail", type=int, default=1, choices=[0, 1])
    p.add_argument("--paragraph", action="store_true")
    p.add_argument("--allowlist", default=None)
    p.add_argument("--blocklist", default=None)
    p.add_argument("--rotation", type=int, nargs="*", default=None,
                   help="rotation TTA angles, e.g. --rotation 90 180 270")
    p.add_argument("--min-size", type=int, default=20)
    p.add_argument("--text-threshold", type=float, default=0.7)
    p.add_argument("--low-text", type=float, default=0.4)
    p.add_argument("--link-threshold", type=float, default=0.4)
    p.add_argument("--canvas-size", type=int, default=2560)
    p.add_argument("--mag-ratio", type=float, default=1.0)
    p.add_argument("--add-margin", type=float, default=0.1)
    p.add_argument("--threshold", type=float, default=0.2,
                   help="DBNet binarization threshold")
    p.add_argument("--bbox-min-score", type=float, default=0.2)
    p.add_argument("--output-format", default="standard",
                   choices=["standard", "dict", "json", "free_merge"])
    p.set_defaults(func=cmd_read)


def _add_download_parser(sub):
    p = sub.add_parser("download", help="prefetch model-zoo weights")
    p.add_argument("--detect-network", default="craft",
                   choices=["craft", "dbnet18", "dbnet50"])
    p.add_argument("--recog-model", default="arabic_g1",
                   help="zoo name, e.g. arabic_g1 / english_g2 / latin_g2")
    p.add_argument("--model-dir", default=None)
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(func=cmd_download)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    ap = argparse.ArgumentParser(
        prog="ocrfa-tpu",
        description="TPU-native Farsi OCR (JAX/XLA/Pallas)")
    ap.add_argument("--version", action="store_true",
                    help="print version and exit")
    sub = ap.add_subparsers(dest="command")
    _add_read_parser(sub)
    _add_download_parser(sub)
    sub.add_parser("serve", add_help=False,
                   help="HTTP serving front-end (args -> ocrfa_tpu.server)")
    sub.add_parser("serve-grpc", add_help=False,
                   help="gRPC serving front-end (args -> ocrfa_tpu.server_grpc)")

    # serve/serve-grpc own their argument namespace: split before parsing
    if argv and argv[0] == "serve":
        from ocrfa_tpu.server import main as serve_main

        return serve_main(argv[1:])
    if argv and argv[0] == "serve-grpc":
        from ocrfa_tpu.server_grpc import main as serve_grpc_main

        return serve_grpc_main(argv[1:])

    args = ap.parse_args(argv)
    if args.version:
        from importlib.metadata import PackageNotFoundError, version

        try:
            print(version("ocrfa-tpu"))
        except PackageNotFoundError:
            print("0.1.0 (uninstalled tree)")
        return 0
    if not getattr(args, "command", None):
        ap.print_help()
        return 2
    return args.func(args)


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
