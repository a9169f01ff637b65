"""Image input normalisation, downloads, and integrity checks (cv2-free).

Parity targets (``/root/reference/src/ocrfa/utils.py``): ``loadImage``
(:466-476), ``reformat_input`` (:1525-1565), ``reformat_input_batched``
(:1568-1596), ``download_and_unzip`` (:1421-1427), ``calculate_md5``
(:1430-1435).  PIL replaces cv2/skimage for decode and colour conversion;
greyscale uses the ITU-R 601 weights cv2 uses.
"""

from __future__ import annotations

import hashlib
import os
from urllib.request import urlretrieve
from zipfile import ZipFile

import numpy as np
from PIL import Image, JpegImagePlugin


def calculate_md5(fname: str) -> str:
    hash_md5 = hashlib.md5()
    with open(fname, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            hash_md5.update(chunk)
    return hash_md5.hexdigest()


def progress_hook(prefix: str = "", suffix: str = "Complete", decimals: int = 1,
                  length: int = 50, fill: str = "#"):
    """Terminal progress bar for urlretrieve (print_custom parity,
    utils.py:1512-1522)."""

    def hook(count, block_size, total_size):
        progress = count * block_size / max(total_size, 1)
        state = min(progress * 100, 100)
        percent = f"{state:.{decimals}f}"
        filled = int(length * min(progress, 1.0))
        bar = fill * filled + " " * (length - filled)
        print(f"\r{prefix} |{bar}| {percent}% {suffix}", end="")

    return hook


def download_and_unzip(url: str, filename: str, model_storage_directory: str, verbose: bool = True) -> None:
    zip_path = os.path.join(model_storage_directory, "temp.zip")
    reporthook = progress_hook(prefix="Progress:") if verbose else None
    urlretrieve(url, zip_path, reporthook=reporthook)
    with ZipFile(zip_path, "r") as zf:
        zf.extract(filename, model_storage_directory)
    os.remove(zip_path)


def rgb2grey(img: np.ndarray) -> np.ndarray:
    """BT.601 luma (cv2 BGR2GRAY/RGB2GRAY weights), rounded like cv2."""
    w = np.array([0.299, 0.587, 0.114], dtype=np.float64)
    grey = img[..., :3].astype(np.float64) @ w
    return np.clip(np.rint(grey), 0, 255).astype(np.uint8)


def load_image(img_file) -> np.ndarray:
    """Read an image file/URL to an RGB uint8 array (loadImage parity)."""
    if isinstance(img_file, str) and (
        img_file.startswith("http://") or img_file.startswith("https://")
    ):
        tmp, _ = urlretrieve(img_file)
        try:
            img = np.asarray(Image.open(tmp).convert("RGB"))
        finally:
            os.remove(tmp)
        return img
    img = np.asarray(Image.open(img_file))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    return np.array(img)


def reformat_input(image):
    """Accept path/URL/bytes/ndarray/PIL -> ``(img_rgb, img_grey)``
    (utils.py:1525-1565)."""
    if isinstance(image, str):
        img = load_image(image)
        return img, rgb2grey(img)
    if isinstance(image, bytes):
        import io as _io

        pil = Image.open(_io.BytesIO(image)).convert("RGB")
        img = np.asarray(pil)
        return img, rgb2grey(img)
    if isinstance(image, np.ndarray):
        if image.ndim == 2:
            img_grey = image
            img = np.stack([image] * 3, axis=-1)
        elif image.ndim == 3 and image.shape[2] == 1:
            img_grey = np.squeeze(image)
            img = np.stack([img_grey] * 3, axis=-1)
        elif image.ndim == 3 and image.shape[2] == 3:
            img = image
            img_grey = rgb2grey(image)
        elif image.ndim == 3 and image.shape[2] == 4:
            img = image[:, :, :3]
            img_grey = rgb2grey(img)
        else:
            raise ValueError("Unsupported ndarray shape %r" % (image.shape,))
        return img, img_grey
    if isinstance(image, JpegImagePlugin.JpegImageFile) or isinstance(image, Image.Image):
        img = np.asarray(image.convert("RGB"))
        return img, rgb2grey(img)
    raise ValueError(
        "Invalid input type. Supporting format = string(file path or url), "
        "bytes, numpy array"
    )


def reformat_input_batched(image, n_width=None, n_height=None):
    """Batch variant with optional uniform resize (utils.py:1568-1596)."""
    if (isinstance(image, np.ndarray) and image.ndim == 4) or isinstance(image, list):
        img, img_grey = [], []
        for single in image:
            clr, gry = reformat_input(single)
            if n_width is not None and n_height is not None:
                clr = np.asarray(Image.fromarray(clr).resize((n_width, n_height), Image.BILINEAR))
                gry = np.asarray(Image.fromarray(gry).resize((n_width, n_height), Image.BILINEAR))
            img.append(clr)
            img_grey.append(gry)
        img, img_grey = np.array(img), np.array(img_grey)
        if img.ndim == 1 and img_grey.ndim == 1:
            raise ValueError(
                "The input image array contains images of different sizes. "
                "Please resize all images to same shape or pass n_width, n_height "
                "to auto-resize"
            )
        return img, img_grey
    return reformat_input(image)


def make_rotated_img_list(rotation_info, img_list):
    """Append 90/180/270-degree rotated crops for TTA (utils.py:1599-1612)."""
    from scipy import ndimage

    result = img_list[:]
    for angle in rotation_info:
        for box, img in img_list:
            rotated = ndimage.rotate(img, angle, reshape=True)
            result.append((box, rotated))
    return result


def set_result_with_confidence(results):
    """Pick the highest-confidence augmentation per image (utils.py:1615-1631)."""
    final_result = []
    for col in range(len(results[0])):
        best_row = max(range(len(results)), key=lambda r: results[r][col][2])
        final_result.append(results[best_row][col])
    return final_result
