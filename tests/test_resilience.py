"""Retry wrapper and training checkpoint/resume."""

import numpy as np
import pytest

from ocrfa_tpu.utils.resilience import CheckpointManager, with_retries


class TestRetries:
    def test_succeeds_after_failures(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient")
            return "ok"

        assert with_retries(flaky, retries=3, backoff_s=0.0) == "ok"
        assert calls["n"] == 3

    def test_exhausts(self):
        def always_fails():
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            with_retries(always_fails, retries=2, backoff_s=0.0)

    def test_non_retriable_raises_immediately(self):
        calls = {"n": 0}

        def bad():
            calls["n"] += 1
            raise ValueError("logic error")

        with pytest.raises(ValueError):
            with_retries(bad, retries=3, backoff_s=0.0)
        assert calls["n"] == 1


class TestBackendProbe:
    def test_alive_on_cpu(self):
        from ocrfa_tpu.utils.resilience import backend_alive

        # conftest forces the CPU backend; a trivial dispatch completes
        assert backend_alive(timeout_s=120.0)

    def test_timeout_returns_false(self, monkeypatch):
        import time

        from ocrfa_tpu.utils import resilience

        # a hung relay = a dispatch that never returns; stub the probe
        # with a sleep far longer than the window (a real warm CPU
        # dispatch can finish before even a 1 ns join expires)
        monkeypatch.setattr(resilience, "_probe_dispatch",
                            lambda: time.sleep(30.0) or 0.0)
        assert resilience.backend_alive(timeout_s=0.05) is False

    def test_require_backend_raises_and_env_window(self, monkeypatch):
        import time

        from ocrfa_tpu.utils import resilience

        monkeypatch.setenv("OCRFA_BACKEND_PROBE_S", "0.05")
        monkeypatch.setattr(resilience, "_probe_dispatch",
                            lambda: time.sleep(30.0) or 0.0)
        with pytest.raises(RuntimeError, match="backend unreachable"):
            resilience.require_backend()
        monkeypatch.undo()
        monkeypatch.setenv("OCRFA_BACKEND_PROBE_S", "120")
        resilience.require_backend()  # does not raise


class TestAwaitRelaySupervisor:
    """The stable-probe gate + early-flap relaunch logic of
    scripts/await_relay.py, with relay_up stubbed."""

    @staticmethod
    def _load():
        import importlib.util
        from pathlib import Path

        path = (Path(__file__).parent.parent / "scripts" / "await_relay.py")
        spec = importlib.util.spec_from_file_location("await_relay", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_requires_consecutive_probes_and_relaunches(self, monkeypatch):
        mod = self._load()
        # relay: up, down (resets the streak), then stable
        seq = iter([True, False, True, True, True, True, True, True])
        monkeypatch.setattr(mod, "relay_up", lambda *a, **k: next(seq))
        monkeypatch.setattr(mod.time, "sleep", lambda s: None)
        calls = {"n": 0}

        def fake_call(cmd):
            calls["n"] += 1
            return 1 if calls["n"] == 1 else 0  # first launch flap-dies

        monkeypatch.setattr(mod.subprocess, "call", fake_call)
        monkeypatch.setattr(
            mod.sys, "argv",
            ["await_relay.py", "--stable-probes", "2", "--stable-gap-s",
             "0", "--poll-s", "0", "--", "echo", "hi"])
        assert mod.main() == 0
        assert calls["n"] == 2  # relaunched once after the flap death

    def test_usage_error_aborts_instead_of_relaunching(self, monkeypatch):
        """rc=2 within seconds is an argparse usage error (a typo'd flag),
        not a relay flap — the supervisor must abort, not loop forever
        re-awaiting (observed with a negative flag value passed without
        the `=` form)."""
        mod = self._load()
        monkeypatch.setattr(mod, "relay_up", lambda *a, **k: True)
        monkeypatch.setattr(mod.time, "sleep", lambda s: None)
        calls = {"n": 0}

        def fake_call(cmd):
            calls["n"] += 1
            return 2  # instant argparse death, every launch

        monkeypatch.setattr(mod.subprocess, "call", fake_call)
        monkeypatch.setattr(
            mod.sys, "argv",
            ["await_relay.py", "--stable-probes", "1", "--stable-gap-s",
             "0", "--poll-s", "0", "--", "prog", "--bogus"])
        assert mod.main() == 2
        assert calls["n"] == 1  # no relaunch loop

    def test_gives_up_after_max_wait(self, monkeypatch):
        mod = self._load()
        monkeypatch.setattr(mod, "relay_up", lambda *a, **k: False)
        t = {"now": 0.0}
        monkeypatch.setattr(mod.time, "time", lambda: t["now"])

        def advance(s):
            t["now"] += max(s, 1.0)

        monkeypatch.setattr(mod.time, "sleep", advance)
        monkeypatch.setattr(
            mod.sys, "argv",
            ["await_relay.py", "--max-wait-s", "5", "--poll-s", "1",
             "--", "echo", "hi"])
        assert mod.main() == 1


class TestBenchSupervisor:
    """bench.py's relay-flap shielding (supervise()): a relay-down start
    degrades to a late measurement, never a lost artifact (BENCH_r04)."""

    @staticmethod
    def _load():
        import importlib.util
        from pathlib import Path

        path = Path(__file__).parent.parent / "bench.py"
        spec = importlib.util.spec_from_file_location("bench_mod", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_retries_error_child_then_forwards_valid_json(self, monkeypatch,
                                                          capsys):
        mod = self._load()
        # relay: one down probe, then stable forever
        seq = iter([False] + [True] * 50)
        monkeypatch.setattr(mod, "_relay_up", lambda *a, **k: next(seq))
        monkeypatch.setattr(mod.time, "sleep", lambda s: None)
        runs = {"n": 0}

        class R:
            def __init__(self, rc, out):
                self.returncode, self.stdout, self.stderr = rc, out, ""

        def fake_run(cmd, **kw):
            runs["n"] += 1
            if runs["n"] == 1:  # child saw the relay die mid-measurement
                return R(3, '{"value": 0.0, "error": "backend unreachable"}')
            return R(0, 'warmup noise\n{"metric": "m", "value": 42.0}')

        monkeypatch.setattr(mod.subprocess, "run", fake_run)
        assert mod.supervise() == 0
        assert runs["n"] == 2
        out = capsys.readouterr().out.strip().splitlines()[-1]
        import json as _json

        assert _json.loads(out)["value"] == 42.0

    def test_emits_error_json_when_horizon_expires(self, monkeypatch,
                                                   capsys):
        mod = self._load()
        monkeypatch.setattr(mod, "_relay_up", lambda *a, **k: False)
        t = {"now": 0.0}
        monkeypatch.setattr(mod.time, "time", lambda: t["now"])

        def advance(s):
            t["now"] += max(s, 1.0)

        monkeypatch.setattr(mod.time, "sleep", advance)
        assert mod.supervise() == 1
        import json as _json

        parsed = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert parsed["value"] == 0.0 and "error" in parsed


class TestCheckpointManager:
    def test_save_restore_gc(self, tmp_path):
        import jax

        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.train import make_optimizer

        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=8,
                                output_channel=64, hidden_size=64)
        opt = make_optimizer()
        state = opt.init(params)

        mgr = CheckpointManager(str(tmp_path / "ckpts"), every_steps=10, keep=2)
        assert not mgr.maybe_save(5, params, state)
        assert mgr.maybe_save(10, params, state)
        mgr.save(20, params, state)
        mgr.save(30, params, state)

        assert mgr.latest_step() == 30
        step, p2, s2 = mgr.restore()
        assert step == 30
        flat1, _ = jax.tree.flatten(params)
        flat2, _ = jax.tree.flatten(p2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # gc keeps only the last 2
        assert mgr.restore(10) is None or step == 30

    def test_restore_empty(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "none"))
        assert mgr.restore() is None


class TestRecognizeCrops:
    def test_bucketed_multi_width(self):
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer, recognize_crops

        conv = CTCLabelConverter("ابت")
        rec = Recognizer(
            init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                           output_channel=64, hidden_size=64),
            conv,
        )
        rng = np.random.default_rng(0)
        crops = [rng.integers(0, 255, (64, w), dtype=np.uint8)
                 for w in (80, 300, 90, 260)]
        out = recognize_crops(rec, crops)
        assert len(out) == 4
        assert all(isinstance(t, str) for t, _ in out)
        # same crop content -> same text regardless of bucket placement
        out2 = recognize_crops(rec, [crops[0]])
        assert out2[0][0] == out[0][0]

    def test_empty(self):
        from ocrfa_tpu.pipeline import recognize_crops

        assert recognize_crops(None, []) == []


class TestQuantizedRecognizer:
    def test_int8_path_close_to_f32(self):
        import jax
        import numpy as np

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer

        conv = CTCLabelConverter("ابتثجچ")
        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                                output_channel=64, hidden_size=64)
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        rng = np.random.default_rng(0)
        batch = rng.integers(0, 255, (4, 64, 128, 1)).astype(np.uint8)

        exact = Recognizer(params, conv).predict(batch, keep)
        quant = Recognizer(params, conv, quantized=True).predict(batch, keep)
        assert len(quant) == 4
        # int8 is near-identical; confidences within a few percent
        for (t1, c1), (t2, c2) in zip(exact, quant):
            assert abs(c1 - c2) < 0.1


class TestBNCalibration:
    def test_calibrated_inference_matches_train_mode(self):
        import jax
        import numpy as np

        from ocrfa_tpu.models.crnn import crnn_apply, init_crnn_gen1
        from ocrfa_tpu.train import calibrate_bn_stats

        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=8,
                                output_channel=64, hidden_size=64)
        rng = np.random.default_rng(0)
        # shift/scale so batch moments differ from the (0, 1) BN defaults
        batch = (rng.standard_normal((4, 64, 64, 1)) * 3.0 + 2.0).astype(np.float32)

        # single calibration batch: running stats == that batch's moments,
        # so inference-mode output must equal train-mode output exactly
        calibrated = calibrate_bn_stats(
            params, lambda p, b: crnn_apply(p, b, train=True), [batch]
        )
        train_out = np.asarray(crnn_apply(params, batch, train=True))
        infer_out = np.asarray(crnn_apply(calibrated, batch, train=False))
        np.testing.assert_allclose(infer_out, train_out, atol=1e-6, rtol=1e-4)

        # and the stats were actually rewritten (defaults are mean 0, var 1)
        bn = calibrated["feat"]["bn0_1"]
        assert np.abs(np.asarray(bn["mean"])).max() > 1e-3
        assert np.abs(np.asarray(bn["var"]) - 1.0).max() > 1e-3


class TestRecognizeCropsVertical:
    def test_tall_crop_handled(self):
        """Vertical text crops (h > w) rotate into wide strips like the
        reference's calculate_ratio flip (utils.py:1351-1372)."""
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.pipeline import Recognizer, recognize_crops

        conv = CTCLabelConverter("اب")
        rec = Recognizer(
            init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                           output_channel=64, hidden_size=64),
            conv,
        )
        rng = np.random.default_rng(0)
        tall = rng.integers(0, 255, (200, 40), dtype=np.uint8)   # h > w
        wide = rng.integers(0, 255, (64, 150), dtype=np.uint8)
        out = recognize_crops(rec, [tall, wide])
        assert len(out) == 2
        assert all(isinstance(t, str) for t, _ in out)
