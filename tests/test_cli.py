"""CLI entry point (``python -m ocrfa_tpu``): read command, weight
injection pickles, serving builder routing."""

import json
import pickle

import numpy as np
import pytest

from ocrfa_tpu import cli


@pytest.fixture(scope="module")
def toy_blobs(tmp_path_factory):
    """Trained-artifact pickles in the exact shapes the training scripts
    emit (eval_farsi.save_trained / eval_selftrained --save-craft)."""
    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1

    d = tmp_path_factory.mktemp("blobs")
    charset = "0123456789abc"
    conv = CTCLabelConverter(charset)
    params = init_crnn_gen1(jax.random.PRNGKey(0),
                            num_class=conv.num_classes,
                            output_channel=64, hidden_size=64)
    rec = d / "recognizer.pkl"
    with open(rec, "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, params),
                     "loss": 0.0, "calib": [],
                     "meta": {"charset": charset, "oc": 64, "hs": 64}}, f)

    det = d / "craft.pkl"
    with open(det, "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray,
                                            init_craft(jax.random.PRNGKey(1))),
                     "losses": [], "meta": {"detector": "craft"}}, f)

    from ocrfa_tpu.models.dbnet import init_dbnet

    det_db = d / "dbnet.pkl"
    with open(det_db, "wb") as f:
        # meta detector="dbnet" — the exact spelling eval_selftrained's
        # --save-craft writes (its --detector choices are craft|dbnet)
        pickle.dump({"params": jax.tree.map(
                         np.asarray, init_dbnet(jax.random.PRNGKey(2))),
                     "losses": [], "meta": {"detector": "dbnet"}}, f)
    from ocrfa_tpu.models.trocr import init_trocr

    rec_trocr = d / "trocr.pkl"
    with open(rec_trocr, "wb") as f:
        # the pretrain_trocr --save-params contract
        pickle.dump({"params": jax.tree.map(np.asarray, init_trocr(
                         jax.random.PRNGKey(3), num_class=conv.num_classes,
                         d_model=32, heads=4, enc_layers=2, dec_layers=2,
                         max_src=64, max_tgt=16)),
                     "meta": {"family": "trocr", "charset": charset,
                              "d_model": 32, "layers": 2, "heads": 4,
                              "max_len": 8}}, f)
    return {"recognizer": str(rec), "detector": str(det),
            "detector_dbnet": str(det_db), "recognizer_trocr": str(rec_trocr),
            "charset": charset}


@pytest.fixture(scope="module")
def page_png(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    page = np.full((96, 128, 3), 235, dtype=np.uint8)
    page[20:40, 10:110] = rng.integers(0, 90, (20, 100, 3))
    path = tmp_path_factory.mktemp("imgs") / "page.png"
    Image.fromarray(page).save(path)
    return str(path)


class TestRead:
    def test_read_json_lines(self, toy_blobs, page_png, tmp_path):
        out = tmp_path / "out.jsonl"
        rc = cli.main([
            "read", page_png,
            "--recognizer-pickle", toy_blobs["recognizer"],
            "--detector-pickle", toy_blobs["detector"],
            "--cpu", "--no-download",
            "--canvas-size", "128", "--min-size", "5",
            "--out", str(out),
        ])
        assert rc == 0
        lines = out.read_text(encoding="utf8").splitlines()
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["image"] == page_png
        for box, text, conf in rec["results"]:
            assert len(box) == 4
            assert isinstance(text, str)
            assert 0.0 <= conf <= 1.0

    def test_read_dict_format_and_stdout(self, toy_blobs, page_png, capsys):
        rc = cli.main([
            "read", page_png,
            "--recognizer-pickle", toy_blobs["recognizer"],
            "--detector-pickle", toy_blobs["detector"],
            "--cpu", "--no-download",
            "--canvas-size", "128", "--min-size", "5",
            "--output-format", "dict",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.splitlines()[0])
        for item in rec["results"]:
            assert set(item) >= {"boxes", "text", "confident"}

    def test_charset_from_meta(self, toy_blobs):
        reader = cli.build_reader(_read_ns(toy_blobs))
        assert reader.converter.character[1:] == list(toy_blobs["charset"])

    def test_injected_charset_governs_masks(self, toy_blobs):
        """recognize() builds allowlist/ignore masks from ocr.character /
        ocr.lang_char; injection must swap those to the blob charset or
        indices land in the wrong class space."""
        reader = cli.build_reader(_read_ns(toy_blobs))
        assert list(reader.character) == list(toy_blobs["charset"])
        assert set(reader.lang_char) == set(toy_blobs["charset"])

    def test_trocr_blob_injects_transformer(self, toy_blobs):
        """A blob with meta family=trocr (pretrain_trocr --save-params)
        becomes a TrocrRecognizer behind the same facade."""
        from ocrfa_tpu.pipeline import TrocrRecognizer

        ns = _read_ns(toy_blobs)
        ns.recognizer_pickle = toy_blobs["recognizer_trocr"]
        reader = cli.build_reader(ns)
        assert isinstance(reader.recognizer, TrocrRecognizer)
        assert reader.converter.character[1:] == list(toy_blobs["charset"])

    def test_trocr_blob_rejected_by_serving(self, toy_blobs):
        import argparse

        from ocrfa_tpu.server import add_serving_args, build_pipeline_from_args

        ap = argparse.ArgumentParser()
        add_serving_args(ap, port=0)
        args = ap.parse_args(["--recognizer-pickle",
                              toy_blobs["recognizer_trocr"]])
        with pytest.raises(SystemExit, match="trocr"):
            build_pipeline_from_args(args)

    def test_dbnet_blob_injects_dbnet_detector(self, toy_blobs):
        """A blob whose meta says detector="dbnet" (eval_selftrained's
        spelling) must come back as a DBNetDetector, not CRAFT."""
        from ocrfa_tpu.detector_db import DBNetDetector

        ns = _read_ns(toy_blobs)
        ns.detector_pickle = toy_blobs["detector_dbnet"]
        reader = cli.build_reader(ns)
        assert reader.detect_network == "dbnet18"
        assert isinstance(reader.detector, DBNetDetector)

    def test_read_nonempty_results(self, toy_blobs, page_png, tmp_path,
                                   monkeypatch):
        """With a detector that actually fires, results flow through the
        crop -> recognize -> JSON path (random weights detect nothing, so
        the other read tests only cover the empty-page shape)."""
        import ocrfa_tpu.detector

        from helpers import OracleCraftDetector

        monkeypatch.setattr(ocrfa_tpu.detector, "CraftDetector",
                            lambda params: OracleCraftDetector())
        out = tmp_path / "out.jsonl"
        rc = cli.main([
            "read", page_png,
            "--recognizer-pickle", toy_blobs["recognizer"],
            "--detector-pickle", toy_blobs["detector"],
            "--cpu", "--no-download",
            "--canvas-size", "128", "--min-size", "5",
            "--out", str(out),
        ])
        assert rc == 0
        rec = json.loads(out.read_text(encoding="utf8").splitlines()[0])
        assert len(rec["results"]) >= 1
        box, text, conf = rec["results"][0]
        assert len(box) == 4 and isinstance(text, str)
        assert isinstance(conf, (int, float))


def _read_ns(toy_blobs):
    """An argparse namespace matching the read subcommand defaults."""
    import argparse

    sub = argparse.ArgumentParser().add_subparsers()
    cli._add_read_parser(sub)
    p = sub.choices["read"]
    return p.parse_args([
        "x.png",
        "--recognizer-pickle", toy_blobs["recognizer"],
        "--detector-pickle", toy_blobs["detector"],
        "--cpu", "--no-download",
    ])


class TestMisc:
    def test_version(self, capsys):
        assert cli.main(["--version"]) == 0
        assert capsys.readouterr().out.strip()

    def test_no_command_prints_help(self, capsys):
        assert cli.main([]) == 2
        assert "read" in capsys.readouterr().out

    def test_jsonable_numpy(self):
        obj = {"a": np.int32(3), "b": [np.float64(0.5), np.arange(2)]}
        out = cli._jsonable(obj)
        json.dumps(out)  # must not raise


class TestServingBuilder:
    def test_pipeline_from_pickles(self, toy_blobs):
        import argparse

        from ocrfa_tpu.server import add_serving_args, build_pipeline_from_args

        ap = argparse.ArgumentParser()
        add_serving_args(ap, port=0)
        args = ap.parse_args([
            "--recognizer-pickle", toy_blobs["recognizer"],
            "--detector-pickle", toy_blobs["detector"],
            "--canvas-size", "256",
        ])
        pipeline = build_pipeline_from_args(args)
        assert pipeline.family == "craft"
        assert pipeline.canvas_size == 256
        # converter picked up the blob charset, not the zoo default
        n_chars = len(toy_blobs["charset"])
        assert pipeline.recognizer.converter.num_classes == n_chars + 1

    def test_dbnet_blob_serves_dbnet_family(self, toy_blobs):
        import argparse

        from ocrfa_tpu.server import add_serving_args, build_pipeline_from_args

        ap = argparse.ArgumentParser()
        add_serving_args(ap, port=0)
        args = ap.parse_args([
            "--recognizer-pickle", toy_blobs["recognizer"],
            "--detector-pickle", toy_blobs["detector_dbnet"],
            "--canvas-size", "256",
        ])
        assert build_pipeline_from_args(args).family == "dbnet"

    def test_unknown_detector_kind_rejected(self, toy_blobs, tmp_path):
        from ocrfa_tpu.checkpoints import load_detector_blob

        bad = tmp_path / "bad.pkl"
        with open(bad, "wb") as f:
            pickle.dump({"params": {}, "meta": {"detector": "yolo"}}, f)
        with pytest.raises(ValueError, match="yolo"):
            load_detector_blob(str(bad))

    def test_auth_from_args(self):
        import argparse

        from ocrfa_tpu.server import add_serving_args, auth_from_args

        ap = argparse.ArgumentParser()
        add_serving_args(ap, port=0)
        assert auth_from_args(ap.parse_args([])) is None
        policy = auth_from_args(ap.parse_args(["--api-keys", "k1,k2",
                                               "--rate", "5"]))
        assert policy.check("k1", "caller") is None
        assert policy.check("nope", "caller") == "unauthenticated"
