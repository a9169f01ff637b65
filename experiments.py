"""Demo entry point (reference parity: ``experiments.py:1-17``).

Builds an ``OCR`` reader and runs ``readtext`` on a test image URL.
Requires network access for weight download; pass a local path to run on
an already-downloaded image.
"""

import sys


def main(url: str = "https://raw.githubusercontent.com/JaidedAI/EasyOCR/master/examples/persian.jpg"):
    from ocrfa_tpu import OCR

    ocr = OCR(gpu=False)
    res = ocr.readtext(url)
    for box, text, conf in res:
        print(f"{conf:.3f}  {text}")
    return res


if __name__ == "__main__":
    main(*sys.argv[1:2])
