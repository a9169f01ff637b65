"""StageTimer and API error-path tests."""

import time

import pytest

from ocrfa_tpu.utils.profiling import StageTimer


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        report = t.report()
        assert report["a"]["calls"] == 2
        assert report["a"]["total_s"] >= 0.01
        assert report["b"]["calls"] == 1
        t.reset()
        assert t.report() == {}

    def test_exception_still_recorded(self):
        t = StageTimer()
        with pytest.raises(ValueError):
            with t.stage("x"):
                raise ValueError
        assert t.report()["x"]["calls"] == 1


class TestAPIDownloadGuards:
    def test_missing_weights_raises(self, tmp_path):
        from ocrfa_tpu.api import OCR

        with pytest.raises(FileNotFoundError):
            OCR(gpu=False, download_enabled=False, detector=True, recognizer=False,
                model_storage_directory=str(tmp_path),
                user_network_directory=str(tmp_path), verbose=False)

    def test_unsupported_detector(self, tmp_path):
        from ocrfa_tpu.api import OCR

        with pytest.raises(RuntimeError):
            OCR(gpu=False, detector=True, recognizer=False,
                detect_network="east",
                model_storage_directory=str(tmp_path),
                user_network_directory=str(tmp_path), verbose=False)
