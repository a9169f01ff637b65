"""``python -m ocrfa_tpu`` entry point."""

from ocrfa_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
