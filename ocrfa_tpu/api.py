"""Public API facade: the ``OCR`` class.

Mirrors the reference surface (``/root/reference/src/ocrfa/ocr.py:42-789``)
method-for-method and kwarg-for-kwarg: ``readtext``, ``recognize``,
``transform_ua``, ``readtext_batched``, ``readtextlang``, ``setDetector``,
``setModelLanguage``, ``getChar``, ``setLanguageList``, ``__repr__``.

Differences (TPU-native by design):
* ``gpu=...`` selects the JAX default backend (TPU when present); the kwarg
  is honoured for API compatibility and recorded in ``self.device``
  ("cpu" | "tpu").
* torch checkpoints are converted to JAX pytrees at load
  (:mod:`ocrfa_tpu.checkpoints`); ``quantize``/``cudnn_benchmark`` map to
  bf16 compute / no-op respectively.
* Recognition batches are width-bucketed and decoded on-device; outputs
  remain character-identical to the reference pipeline.
"""

from __future__ import annotations

import json
import os
import sys
from logging import getLogger
from pathlib import Path

import numpy as np

from ocrfa_tpu import registry
from ocrfa_tpu.decode import CTCLabelConverter
from ocrfa_tpu.geometry import get_image_list, get_paragraph, group_text_box, merge_to_free
from ocrfa_tpu.geometry.boxes import diff
from ocrfa_tpu.io import (
    calculate_md5,
    download_and_unzip,
    make_rotated_img_list,
    reformat_input,
    reformat_input_batched,
    set_result_with_confidence,
)
from ocrfa_tpu.pipeline import Recognizer, get_text
from ocrfa_tpu.utils.bidi import get_display
from ocrfa_tpu.utils.profiling import GLOBAL_TIMER

LOGGER = getLogger(__name__)


def build_recognizer(recog_network: str, network_params: dict, character: str,
                     separator_list, dict_list, model_path: str,
                     device: str = "tpu", quantize: bool = True):
    """Load + convert a reference recognition checkpoint -> Recognizer.

    Counterpart of ``get_recognizer`` (utils.py:665-695).
    """
    import jax.numpy as jnp

    from ocrfa_tpu import checkpoints

    converter = CTCLabelConverter(character, separator_list, dict_list)

    sd = checkpoints.load_torch_state_dict(model_path)
    if recog_network == "generation1":
        params = checkpoints.convert_crnn_gen1(sd)
        variant = "gen1"
    elif recog_network == "generation2":
        params = checkpoints.convert_crnn_gen2(sd)
        variant = "gen2"
    else:
        import importlib

        module = importlib.import_module(recog_network)
        return module.build_recognizer(sd, converter, network_params)

    # Reference semantics: dynamic int8 quantization applies on CPU only
    # (utils.py:679-693); the accelerator path runs full precision.  So the
    # TPU default stays f32-exact (character-identical decodes), CPU honours
    # ``quantize`` via the int8 tower, and throughput users can construct
    # ``Recognizer(..., compute_dtype=bfloat16)`` or ``quantized=True``
    # directly.
    quantized = bool(quantize) and device == "cpu" and variant == "gen1"
    return Recognizer(params, converter, variant=variant,
                      compute_dtype=jnp.float32, quantized=quantized)


def build_detector(detect_network: str, model_path: str, device: str = "tpu",
                   quantize: bool = True, cudnn_benchmark: bool = False,
                   dbnet_dcn_impl: str = "gather"):
    """Load + convert a detection checkpoint -> detector driver.

    Counterpart of ``get_detector`` (detectors.py:76-92) / ``get_detector_db``
    (detectors.py:166-187).  ``dbnet_dcn_impl`` selects the deformable-conv
    formulation for the dbnet families: ``"gather"`` (exact reference
    semantics) or ``"bounded2"``/``"bounded1"`` (clamped dense-shift, the
    TPU fast path — see :class:`ocrfa_tpu.detector_db.DBNetDetector`).
    """
    from ocrfa_tpu import checkpoints

    if detect_network == "craft":
        from ocrfa_tpu.detector import CraftDetector

        sd = checkpoints.load_torch_state_dict(model_path)
        params = checkpoints.convert_craft(sd)
        return CraftDetector(params)
    if detect_network in ("dbnet18", "dbnet50"):
        from ocrfa_tpu.detector_db import DBNetDetector

        backbone = "resnet18" if detect_network == "dbnet18" else "resnet50"
        sd = checkpoints.load_torch_state_dict(model_path)
        return DBNetDetector.from_torch(sd, backbone=backbone,
                                        dcn_impl=dbnet_dcn_impl)
    raise RuntimeError(
        "Unsupport detector network. Support networks are craft and dbnet18."
    )


class OCR:
    """Two-stage Farsi OCR: detection (CRAFT/DBNet) + recognition (CRNN)."""

    def __init__(
        self,
        gpu=True,
        recog_network="standard",
        download_enabled=True,
        detector=True,
        recognizer=True,
        model_storage_directory=None,
        user_network_directory=None,
        detect_network="craft",
        verbose=True,
        quantize=True,
        cudnn_benchmark=False,
    ):
        language_list = ["fa"]
        self.verbose = verbose
        self.download_enabled = download_enabled
        # Beyond-parity TPU knob (the ctor kwarg surface must stay
        # reference-identical): set to "bounded1"/"bounded2" BEFORE
        # setDetector("dbnet18") to build the detector on the clamped
        # dense-shift DCN fast path (1.27x CRAFT pages/s at 736^2,
        # eval_results/PAGES_r3.json).
        self.dbnet_dcn_impl = "gather"

        self.model_storage_directory = registry.MODULE_PATH + "/model"
        if model_storage_directory:
            self.model_storage_directory = model_storage_directory
        Path(self.model_storage_directory).mkdir(parents=True, exist_ok=True)

        self.user_network_directory = registry.MODULE_PATH + "/user_network"
        if user_network_directory:
            self.user_network_directory = user_network_directory
        Path(self.user_network_directory).mkdir(parents=True, exist_ok=True)
        sys.path.append(self.user_network_directory)

        # Device semantics: JAX picks TPU when present.  gpu=False pins host.
        if gpu is False:
            self.device = "cpu"
            if verbose:
                LOGGER.warning(
                    "Using CPU. Note: This module is much faster with a TPU."
                )
        elif gpu is True:
            import jax

            platform = jax.devices()[0].platform
            self.device = "cpu" if platform == "cpu" else "tpu"
            if self.device == "cpu" and verbose:
                LOGGER.warning(
                    "No accelerator available - defaulting to CPU. "
                    "Note: This module is much faster with a TPU."
                )
        else:
            self.device = gpu

        self.detection_models = registry.DETECTION_MODELS
        self.recognition_models = registry.RECOGNITION_MODELS
        self.support_detection_network = ["craft", "dbnet18"]
        self.quantize = quantize
        self.cudnn_benchmark = cudnn_benchmark

        if detector:
            detector_path = self.getDetectorPath(detect_network)

        separator_list = {}
        recog_config = None

        gen1_names = list(self.recognition_models["gen1"])
        gen2_names = list(self.recognition_models["gen2"])
        if recog_network in ["standard"] + gen1_names + gen2_names:
            if recog_network in gen1_names:
                model = self.recognition_models["gen1"][recog_network]
                recog_network = "generation1"
                self.model_lang = model["model_script"]
            elif recog_network in gen2_names:
                model = self.recognition_models["gen2"][recog_network]
                recog_network = "generation2"
                self.model_lang = model["model_script"]
            else:  # standard: route by language (Farsi -> arabic gen1)
                unknown = set(language_list) - set(registry.ALL_LANG_LIST)
                if unknown:
                    raise ValueError(unknown, "is not supported")
                if language_list == ["en"]:
                    self.setModelLanguage("english", language_list, ["en"], "['en']")
                    model = self.recognition_models["gen2"]["english_g2"]
                    recog_network = "generation2"
                elif set(language_list) & set(registry.ARABIC_LANG_LIST):
                    self.setModelLanguage(
                        "arabic", language_list,
                        registry.ARABIC_LANG_LIST + ["en"],
                        "['ar','fa','ur','ug','en']",
                    )
                    model = self.recognition_models["gen1"]["arabic_g1"]
                    recog_network = "generation1"
                else:
                    self.model_lang = "latin"
                    model = self.recognition_models["gen2"]["latin_g2"]
                    recog_network = "generation2"
            self.character = model["characters"]

            model_path = os.path.join(self.model_storage_directory, model["filename"])
            if recognizer:
                self._ensure_weights(
                    model_path, model["url"], model["filename"], model["md5sum"],
                    kind="recognition",
                )
            self.setLanguageList(language_list, model)
        else:  # user-defined network: <name>.yaml + <name>.py + <name>.pth
            import yaml

            with open(
                os.path.join(self.user_network_directory, recog_network + ".yaml"),
                encoding="utf8",
            ) as f:
                recog_config = yaml.safe_load(f)
            self.img_height = recog_config.get("imgH", 64)
            available_lang = recog_config["language_list"]
            self.setModelLanguage(
                recog_network, language_list, available_lang, str(available_lang)
            )
            self.character = recog_config["character_list"]
            model_path = os.path.join(
                self.model_storage_directory, recog_network + ".pth"
            )
            self.setLanguageList(language_list, recog_config)

        dict_list = {
            lang: os.path.join(registry.BASE_PATH, "dict", lang + ".txt")
            for lang in language_list
        }

        if detector:
            self.detector = self.initDetector(detector_path)

        if recognizer:
            if recog_network == "generation1":
                network_params = registry.NETWORK_PARAMS["generation1"]
            elif recog_network == "generation2":
                network_params = registry.NETWORK_PARAMS["generation2"]
            else:
                network_params = recog_config["network_params"]
            self.recognizer = build_recognizer(
                recog_network, network_params, self.character,
                separator_list, dict_list, model_path,
                device=self.device, quantize=quantize,
            )
            self.converter = self.recognizer.converter

    # ------------------------------------------------------------------
    # model management

    def _ensure_weights(self, path, url, filename, md5sum, kind):
        corrupt_msg = "MD5 hash mismatch, possible file corruption"
        if not os.path.isfile(path):
            if not self.download_enabled:
                raise FileNotFoundError(f"Missing {path} and downloads disabled")
            LOGGER.warning(
                "Downloading %s model, please wait. "
                "This may take several minutes depending upon your network connection.",
                kind,
            )
            download_and_unzip(url, filename, self.model_storage_directory, self.verbose)
            assert calculate_md5(path) == md5sum, corrupt_msg
            LOGGER.info("Download complete")
        elif calculate_md5(path) != md5sum:
            if not self.download_enabled:
                raise FileNotFoundError(f"MD5 mismatch for {path} and downloads disabled")
            LOGGER.warning(corrupt_msg)
            os.remove(path)
            LOGGER.warning("Re-downloading the %s model, please wait.", kind)
            download_and_unzip(url, filename, self.model_storage_directory, self.verbose)
            assert calculate_md5(path) == md5sum, corrupt_msg
            LOGGER.info("Download complete")

    def getDetectorPath(self, detect_network):
        if detect_network not in self.support_detection_network:
            raise RuntimeError(
                "Unsupport detector network. Support networks are {}.".format(
                    ", ".join(self.support_detection_network)
                )
            )
        self.detect_network = detect_network
        entry = self.detection_models[self.detect_network]
        detector_path = os.path.join(self.model_storage_directory, entry["filename"])
        self._ensure_weights(
            detector_path, entry["url"], entry["filename"], entry["md5sum"],
            kind="detection",
        )
        return detector_path

    def initDetector(self, detector_path):
        return build_detector(
            self.detect_network, detector_path, device=self.device,
            quantize=self.quantize, cudnn_benchmark=self.cudnn_benchmark,
            dbnet_dcn_impl=self.dbnet_dcn_impl,
        )

    def setDetector(self, detect_network):
        detector_path = self.getDetectorPath(detect_network)
        self.detector = self.initDetector(detector_path)

    def setModelLanguage(self, language, language_list, list_lang, list_lang_string):
        self.model_lang = language
        if set(language_list) - set(list_lang) != set():
            if language in ("ch_tra", "ch_sim"):
                language = "chinese"
            raise ValueError(
                language.capitalize()
                + " is only compatible with English, try language_list="
                + list_lang_string
            )

    def getChar(self, fileName):
        char_file = os.path.join(registry.BASE_PATH, "character", fileName)
        with open(char_file, encoding="utf-8-sig") as f:
            return "".join(f.read().splitlines())

    def setLanguageList(self, language_list, model):
        self.lang_char = list(registry.FARSI_LANG_CHARS)
        if model.get("symbols"):
            symbol = model["symbols"]
        elif model.get("character_list"):
            symbol = model["character_list"]
        else:
            symbol = "0123456789!"
        self.lang_char = set(self.lang_char).union(set(symbol))
        self.lang_char = "".join(self.lang_char)

    # ------------------------------------------------------------------
    # pipeline entry points

    def transform_ua(
        self,
        img,
        min_size=20,
        text_threshold=0.7,
        low_text=0.4,
        link_threshold=0.4,
        canvas_size=2560,
        mag_ratio=1.0,
        slope_ths=0.1,
        ycenter_ths=0.5,
        height_ths=0.5,
        width_ths=0.5,
        add_margin=0.1,
        reformat=True,
        optimal_num_chars=None,
        threshold=0.2,
        bbox_min_score=0.2,
        bbox_min_size=3,
        max_candidates=0,
    ):
        """Detection stage -> per-image (horizontal_list, free_list)
        (ocr.py:299-355)."""
        if reformat:
            img, _ = reformat_input(img)

        if self.detect_network == "craft":
            from ocrfa_tpu.detector import get_textbox

            text_box_list = get_textbox(
                self.detector, img, canvas_size=canvas_size, mag_ratio=mag_ratio,
                text_threshold=text_threshold, link_threshold=link_threshold,
                low_text=low_text, poly=False,
                optimal_num_chars=optimal_num_chars,
            )
        else:
            from ocrfa_tpu.detector_db import get_textbox_db

            text_box_list = get_textbox_db(
                self.detector, img, canvas_size=None,
                threshold=threshold, bbox_min_score=bbox_min_score,
                bbox_min_size=bbox_min_size, max_candidates=max_candidates,
            )

        horizontal_list_agg, free_list_agg = [], []
        for text_box in text_box_list:
            horizontal_list, free_list = group_text_box(
                text_box, slope_ths, ycenter_ths, height_ths, width_ths,
                add_margin, (optimal_num_chars is None),
            )
            if min_size:
                horizontal_list = [
                    i for i in horizontal_list if max(i[1] - i[0], i[3] - i[2]) > min_size
                ]
                free_list = [
                    i for i in free_list
                    if max(diff([c[0] for c in i]), diff([c[1] for c in i])) > min_size
                ]
            horizontal_list_agg.append(horizontal_list)
            free_list_agg.append(free_list)
        return horizontal_list_agg, free_list_agg

    def recognize(
        self,
        img_cv_grey,
        horizontal_list=None,
        free_list=None,
        decoder="greedy",
        beamWidth=5,
        batch_size=1,
        workers=0,
        allowlist=None,
        blocklist=None,
        detail=1,
        rotation_info=None,
        paragraph=False,
        contrast_ths=0.1,
        adjust_contrast=0.5,
        filter_ths=0.003,
        y_ths=0.5,
        x_ths=1.0,
        reformat=True,
        output_format="standard",
        img_height=64,
    ):
        """Recognition stage over detected boxes (ocr.py:357-502)."""
        if reformat:
            _, img_cv_grey = reformat_input(img_cv_grey)

        if allowlist:
            ignore_char = "".join(set(self.character) - set(allowlist))
        elif blocklist:
            ignore_char = "".join(set(blocklist))
        else:
            ignore_char = "".join(set(self.character) - set(self.lang_char))

        if self.model_lang in ["chinese_tra", "chinese_sim"]:
            decoder = "greedy"

        if horizontal_list is None and free_list is None:
            y_max, x_max = img_cv_grey.shape
            horizontal_list = [[0, x_max, 0, y_max]]
            free_list = []

        def _run(image_list, max_width):
            return get_text(
                self.character, img_height, int(max_width), self.recognizer,
                image_list, ignore_char, decoder, beamWidth,
                batch_size=batch_size, contrast_ths=contrast_ths,
                adjust_contrast=adjust_contrast, filter_ths=filter_ths,
                workers=workers,
            )

        if (batch_size == 1) and not rotation_info:
            # per-box pass keeps the reference's per-box max_width semantics
            # (ocr.py:399-444); crops of equal width share a compiled shape.
            result = []
            for bbox in horizontal_list:
                image_list, max_width = get_image_list(
                    [bbox], [], img_cv_grey, model_height=img_height
                )
                result += _run(image_list, max_width)
            for bbox in free_list:
                image_list, max_width = get_image_list(
                    [], [bbox], img_cv_grey, model_height=img_height
                )
                result += _run(image_list, max_width)
        else:
            image_list, max_width = get_image_list(
                horizontal_list, free_list, img_cv_grey, model_height=img_height
            )
            image_len = len(image_list)
            if rotation_info and image_list:
                image_list = make_rotated_img_list(rotation_info, image_list)
                max_width = max(max_width, img_height)

            result = _run(image_list, max_width)

            if rotation_info and (horizontal_list + free_list):
                result = set_result_with_confidence(
                    [result[image_len * i:image_len * (i + 1)]
                     for i in range(len(rotation_info) + 1)]
                )

        if self.model_lang == "arabic":
            direction_mode = "rtl"
            result = [list(item) for item in result]
            for item in result:
                item[1] = get_display(item[1])
        else:
            direction_mode = "ltr"

        if paragraph:
            result = get_paragraph(result, x_ths=x_ths, y_ths=y_ths, mode=direction_mode)

        if detail == 0:
            return [item[1] for item in result]
        elif output_format == "dict":
            if paragraph:
                return [{"boxes": item[0], "text": item[1]} for item in result]
            return [
                {"boxes": item[0], "text": item[1], "confident": item[2]}
                for item in result
            ]
        elif output_format == "json":
            if paragraph:
                return [
                    json.dumps(
                        {"boxes": [list(map(int, lst)) for lst in item[0]],
                         "text": item[1]},
                        ensure_ascii=False,
                    )
                    for item in result
                ]
            return [
                json.dumps(
                    {"boxes": [list(map(int, lst)) for lst in item[0]],
                     "text": item[1], "confident": item[2]},
                    ensure_ascii=False,
                )
                for item in result
            ]
        elif output_format == "free_merge":
            return merge_to_free(result, free_list)
        else:
            return result

    def readtext(
        self,
        image,
        decoder="greedy",
        beamWidth=5,
        batch_size=1,
        workers=0,
        allowlist=None,
        blocklist=None,
        detail=1,
        rotation_info=None,
        paragraph=False,
        min_size=20,
        contrast_ths=0.1,
        adjust_contrast=0.5,
        filter_ths=0.003,
        text_threshold=0.7,
        low_text=0.4,
        link_threshold=0.4,
        canvas_size=2560,
        mag_ratio=1.0,
        slope_ths=0.1,
        ycenter_ths=0.5,
        height_ths=0.5,
        width_ths=0.5,
        y_ths=0.5,
        x_ths=1.0,
        add_margin=0.1,
        threshold=0.2,
        bbox_min_score=0.2,
        bbox_min_size=3,
        max_candidates=0,
        output_format="standard",
    ):
        """Full-page OCR (ocr.py:504-582)."""
        with GLOBAL_TIMER.stage("readtext/reformat"):
            img, img_cv_grey = reformat_input(image)

        with GLOBAL_TIMER.stage("readtext/detect"):
            horizontal_list, free_list = self.transform_ua(
                img, min_size=min_size, text_threshold=text_threshold,
                low_text=low_text, link_threshold=link_threshold,
                canvas_size=canvas_size, mag_ratio=mag_ratio, slope_ths=slope_ths,
                ycenter_ths=ycenter_ths, height_ths=height_ths, width_ths=width_ths,
                add_margin=add_margin, reformat=False, threshold=threshold,
                bbox_min_score=bbox_min_score, bbox_min_size=bbox_min_size,
                max_candidates=max_candidates,
            )
        horizontal_list, free_list = horizontal_list[0], free_list[0]
        with GLOBAL_TIMER.stage("readtext/recognize"):
            return self.recognize(
                img_cv_grey, horizontal_list, free_list, decoder, beamWidth,
                batch_size, workers, allowlist, blocklist, detail, rotation_info,
                paragraph, contrast_ths, adjust_contrast, filter_ths, y_ths, x_ths,
                False, output_format,
            )

    def readtextlang(self, image, **kwargs):
        """Language-tagging variant (ocr.py:584-690).

        The reference implementation reads a cwd-relative ``characters/``
        directory that does not ship with the package and crashes when
        missing (SURVEY.md defect #3); here the language tag falls back to
        charset membership against the active model charset.
        """
        result = self.readtext(image, **kwargs)
        tagged = []
        for item in result:
            text = item[1]
            is_latin = all(ch in registry.SYMBOLS or ch.isascii() for ch in text)
            tagged.append(tuple(item) + ("en" if is_latin else "fa",))
        return tagged

    def readtext_batched(
        self,
        image,
        n_width=None,
        n_height=None,
        decoder="greedy",
        beamWidth=5,
        batch_size=1,
        workers=0,
        allowlist=None,
        blocklist=None,
        detail=1,
        rotation_info=None,
        paragraph=False,
        min_size=20,
        contrast_ths=0.1,
        adjust_contrast=0.5,
        filter_ths=0.003,
        text_threshold=0.7,
        low_text=0.4,
        link_threshold=0.4,
        canvas_size=2560,
        mag_ratio=1.0,
        slope_ths=0.1,
        ycenter_ths=0.5,
        height_ths=0.5,
        width_ths=0.5,
        y_ths=0.5,
        x_ths=1.0,
        add_margin=0.1,
        threshold=0.2,
        bbox_min_score=0.2,
        bbox_min_size=3,
        max_candidates=0,
        output_format="standard",
    ):
        """Batched full-page OCR (ocr.py:692-776); one detector forward for
        the whole page batch."""
        img, img_cv_grey = reformat_input_batched(image, n_width, n_height)

        horizontal_list_agg, free_list_agg = self.transform_ua(
            img, min_size=min_size, text_threshold=text_threshold,
            low_text=low_text, link_threshold=link_threshold,
            canvas_size=canvas_size, mag_ratio=mag_ratio, slope_ths=slope_ths,
            ycenter_ths=ycenter_ths, height_ths=height_ths, width_ths=width_ths,
            add_margin=add_margin, reformat=False, threshold=threshold,
            bbox_min_score=bbox_min_score, bbox_min_size=bbox_min_size,
            max_candidates=max_candidates,
        )
        result_agg = []
        img_cv_grey = [img_cv_grey] if img_cv_grey.ndim == 2 else img_cv_grey
        for grey_img, horizontal_list, free_list in zip(
            img_cv_grey, horizontal_list_agg, free_list_agg
        ):
            result_agg.append(
                self.recognize(
                    grey_img, horizontal_list, free_list, decoder, beamWidth,
                    batch_size, workers, allowlist, blocklist, detail,
                    rotation_info, paragraph, contrast_ths, adjust_contrast,
                    filter_ths, y_ths, x_ths, False, output_format,
                )
            )
        return result_agg

    def __repr__(self):
        from pprint import pformat

        detector_str = str(getattr(self, "detector", None)).replace("\n", "\n\t")
        return self.__class__.__name__ + (
            f"("
            f"\n\tdetection_models={pformat(self.detection_models)}"
            f"\n\tdetect_network=OCR-FA"
            f"\n\tdetector={detector_str}"
            f"\n)"
        )

    def __str__(self):
        return self.__repr__()
