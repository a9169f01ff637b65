"""Model zoo registry: weight URLs, MD5 checksums, and character sets.

Data constants are byte-identical to the reference registry
(``/root/reference/src/ocrfa/utils.py:354-443``) so that downloaded weights,
MD5 verification, and decoder charsets interoperate with the reference model
zoo.  The surrounding structure (helpers, env handling) is new.
"""

from __future__ import annotations

import os

# Weight-cache directory; honours the same env overrides as the reference
# (utils.py:355-357).
BASE_PATH = os.path.dirname(__file__)


def module_path() -> str:
    return (
        os.environ.get("OCR_FA_MODULE_PATH")
        or os.environ.get("MODULE_PATH")
        or os.path.expanduser("~/.OCR-FA/")
    )


MODULE_PATH = module_path()

# Line-crop model height in pixels (utils.py:388).
IMG_HEIGHT = 64

# Detection model zoo (utils.py:360-376).
DETECTION_MODELS = {
    'craft': {
        'filename': 'craft_mlt_25k.pth',
        'url': 'https://github.com/erfanzar/OCR-FA/releases/download/v0.0.0/craft_mlt_25k.zip',
        'md5sum': '2f8227d2def4037cdb3b34389dcf9ec1',
    },
    'dbnet18': {
        'filename': 'pretrained_ic15_res18.pt',
        'url': 'https://github.com/erfanzar/OCR-FA/releases/download/v0.0.0/pretrained_ic15_res18.zip',
        'md5sum': 'aee04f8ffe5fc5bd5abea73223800425',
    },
    'dbnet50': {
        'filename': 'pretrained_ic15_res50.pt',
        'url': 'https://github.com/erfanzar/OCR-FA/releases/download/v0.0.0/pretrained_ic15_res50.zip',
        'md5sum': 'a8e90144c131c2467d1eb7886c2e93a6',
    },
}

# Shared symbol set (utils.py:377).
SYMBOLS = "0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ "

# Language routing tables (utils.py:379-387).
LATIN_LANG_LIST = ["af", "az", "bs", "cs", "cy", "da", "de", "en", "es", "et", "fr", "ga", "hr", "hu", "id", "is", "it", "ku", "la", "lt", "lv", "mi", "ms", "mt", "nl", "no", "oc", "pi", "pl", "pt", "ro", "rs_latin", "sk", "sl", "sq", "sv", "sw", "tl", "tr", "uz", "vi"]
ARABIC_LANG_LIST = ["ar", "fa", "ug", "ur"]
ALL_LANG_LIST = LATIN_LANG_LIST + ARABIC_LANG_LIST

# Word-beam-search separators (utils.py:389-395).
SEPARATOR_LIST = {
    "th": ["\xa2", "\xa3"],
    "en": ["\xa4", "\xa5"],
}
SEPARATOR_CHAR = [ch for seps in SEPARATOR_LIST.values() for ch in seps]

# Recognition model zoo (utils.py:397-443).
RECOGNITION_MODELS = {
    'gen1': {
        'latin_g1': {
            'filename': 'latin.pth',
            'model_script': 'latin',
            'url': 'https://github.com/erfanzar/OCR-FA/releases/download/v0.0.0/latin.zip',
            'md5sum': 'fb91b9abf65aeeac95a172291b4a6176',
            'characters': '0123456789!"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~ ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyzÀÁÂÃÄÅÆÇÈÉÊËÍÎÑÒÓÔÕÖØÚÛÜÝÞßàáâãäåæçèéêëìíîïðñòóôõöøùúûüýþÿąęĮįıŁłŒœŠšųŽž',
            'symbols': '0123456789!"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~ ',
        },
        'arabic_g1': {
            'filename': 'arabic.pth',
            'model_script': 'arabic',
            'url': 'https://github.com/erfanzar/OCR-FA/releases/download/v0.0.0/arabic.zip',
            'md5sum': '993074555550e4e06a6077d55ff0449a',
            'symbols': '«»؟،؛٠١٢٣٤٥٦٧٨٩0123456789!"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~ ',
            'characters': '0123456789!"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~ abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ٠١٢٣٤٥٦٧٨٩«»؟،؛ءآأؤإئااًبةتثجحخدذرزسشصضطظعغفقكلمنهوىيًٌٍَُِّْٰٓٔٱٹپچڈڑژکڭگںھۀہۂۃۆۇۈۋیېےۓە',
        },
    },
    'gen2': {
        'english_g2': {
            'filename': 'english_g2.pth',
            'model_script': 'english',
            'url': 'https://github.com/erfanzar/OCR-FA/releases/download/v0.0.0/english_g2.zip',
            'md5sum': '5864788e1821be9e454ec108d61b887d',
            'symbols': '0123456789!"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~ €',
            'characters': '0123456789!"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~ €ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
        },
        'latin_g2': {
            'filename': 'latin_g2.pth',
            'model_script': 'latin',
            'url': 'https://github.com/erfanzar/OCR-FA/releases/download/v0.0.0/latin_g2.zip',
            'md5sum': '469869130aad1a34e8f9086f4262bc59',
            'symbols': ' !"#$%&\'()*+,-./0123456789:;<=>?@[\\]^_`{|}~ €',
            'characters': ' !"#$%&\'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~ªÀÁÂÃÄÅÆÇÈÉÊËÌÍÎÏÐÑÒÓÔÕÖØÙÚÛÜÝÞßàáâãäåæçèéêëìíîïðñòóôõöøùúûüýþÿĀāĂăĄąĆćČčĎďĐđĒēĖėĘęĚěĞğĨĩĪīĮįİıĶķĹĺĻļĽľŁłŃńŅņŇňŒœŔŕŘřŚśŞşŠšŤťŨũŪūŮůŲųŸŹźŻżŽžƏƠơƯưȘșȚțə̇ḌḍḶḷṀṁṂṃṄṅṆṇṬṭẠạẢảẤấẦầẨẩẪẫẬậẮắẰằẲẳẴẵẶặẸẹẺẻẼẽẾếỀềỂểỄễỆệỈỉỊịỌọỎỏỐốỒồỔổỖỗỘộỚớỜờỞởỠỡỢợỤụỦủỨứỪừỬửỮữỰựỲỳỴỵỶỷỸỹ€',
        },
    },
}

# Hardcoded Persian/Arabic charset used by ``OCR.setLanguageList``
# (ocr.py:274-284).
FARSI_LANG_CHARS = ["آ", "ا", "ب", "پ", "ت", "ث", "ج", "چ", "ح", "خ", "د", "ذ", "ر", "ز", "ژ", "س", "ش", "ص", "ض", "ط", "ظ", "ع", "غ", "ف", "ق", "ک", "گ", "ل", "م", "ن", "و", "ه", "ی", "ء", "ئ", "ِ", "ك", "ي", "ً", "ّ", "َ", "ة", "أ", "ٔ", "ؤ", "ُ", "ى", "إ", "ۀ", "ٍ", "ْ", "ٌ", "ٰ", "ٓ", "ٱ"]

# Architecture hyper-parameters per generation (ocr.py:180-191).
NETWORK_PARAMS = {
    "generation1": {"input_channel": 1, "output_channel": 512, "hidden_size": 512},
    "generation2": {"input_channel": 1, "output_channel": 256, "hidden_size": 256},
}
