"""HTTP serving front-end: request decode, batching dispatcher, endpoints."""

import http.client
import io
import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.server import OCRServer
    from ocrfa_tpu.serving import ServingPipeline

    conv = CTCLabelConverter("ابتث")
    recognizer = Recognizer(
        init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                       output_channel=64, hidden_size=64), conv)
    pipeline = ServingPipeline(init_craft(jax.random.PRNGKey(1)), recognizer,
                               canvas_size=128)
    with OCRServer(pipeline, port=0) as srv:
        yield srv


def _request(srv, method, path, body=b"", headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    data = json.loads(resp.read().decode("utf-8"))
    conn.close()
    return resp.status, data


class TestOCRServer:
    def test_healthz(self, server):
        status, data = _request(server, "GET", "/healthz")
        assert status == 200 and data["ok"] is True

    def test_raw_grey_post(self, server):
        page = np.random.default_rng(0).integers(
            0, 255, (96, 128), dtype=np.uint8)
        status, data = _request(
            server, "POST", "/ocr", body=page.tobytes(),
            headers={"X-Height": "96", "X-Width": "128"})
        assert status == 200
        assert isinstance(data["results"], list)
        for r in data["results"]:
            assert set(r) == {"box", "text", "confidence"}
            assert len(r["box"]) == 4

    def test_png_post(self, server):
        from PIL import Image

        page = np.full((96, 128), 240, dtype=np.uint8)
        page[30:60, 20:100] = 20
        buf = io.BytesIO()
        Image.fromarray(page).save(buf, format="PNG")
        status, data = _request(server, "POST", "/ocr", body=buf.getvalue())
        assert status == 200 and "results" in data

    def test_bad_raw_size_is_400(self, server):
        status, data = _request(
            server, "POST", "/ocr", body=b"123",
            headers={"X-Height": "10", "X-Width": "10"})
        assert status == 400 and "error" in data

    def test_unknown_path_404(self, server):
        status, _ = _request(server, "GET", "/nope")
        assert status == 404

    def test_concurrent_requests(self, server):
        import threading

        page = np.random.default_rng(1).integers(
            0, 255, (96, 128), dtype=np.uint8)
        results = [None] * 4

        def worker(i):
            results[i] = _request(
                server, "POST", "/ocr", body=page.tobytes(),
                headers={"X-Height": "96", "X-Width": "128"})

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert all(r is not None and r[0] == 200 for r in results)
        # same page -> same result through the batching dispatcher
        texts = [tuple(x["text"] for x in r[1]["results"]) for r in results]
        assert len(set(texts)) == 1


class TestDynamicBatching:
    class FakePipeline:
        """Records submit calls; finish blocks on an event so the queue
        can build up deterministically."""

        def __init__(self):
            import threading

            self.release = threading.Event()
            self.submit_calls = []

        def submit_page(self, page):
            self.submit_calls.append(1)
            return ("h", page.shape)

        def submit_page_batch(self, pages):
            self.submit_calls.append(len(pages))
            return [("h", p.shape) for p in pages]

        def finish_page(self, handle):
            self.release.wait(30)
            return [handle[1]]

    def test_same_shape_jobs_batch(self):
        import threading

        from ocrfa_tpu.server import PipelineDispatcher

        fake = self.FakePipeline()
        disp = PipelineDispatcher(fake, depth=1, max_batch=8)
        try:
            pages = [np.zeros((32, 32), np.uint8) for _ in range(5)]
            threads = [threading.Thread(target=disp.submit, args=(p,))
                       for p in pages]
            threads[0].start()
            # wait until job 0 is submitted and the dispatcher blocks in
            # finish_page (depth=1 forces immediate collection)
            for _ in range(200):
                if fake.submit_calls:
                    break
                threading.Event().wait(0.01)
            for t in threads[1:]:
                t.start()
            # let the remaining four accumulate in the queue
            for _ in range(200):
                if disp.qsize() == 4:
                    break
                threading.Event().wait(0.01)
            fake.release.set()
            for t in threads:
                t.join(timeout=30)
            assert fake.submit_calls[0] == 1
            # the four queued same-shape pages went out as one batch
            assert max(fake.submit_calls) == 4
            assert disp.stats["batched_pages"] >= 4
            assert disp.stats["pages"] == 5
        finally:
            fake.release.set()
            disp.close()

    def test_mixed_shapes_split_groups(self):
        import threading

        from ocrfa_tpu.server import PipelineDispatcher

        fake = self.FakePipeline()
        fake.release.set()  # no blocking; shapes split within one drain
        disp = PipelineDispatcher(fake, depth=8, max_batch=8)
        try:
            # stuff the queue directly so one _drain sees all four
            from ocrfa_tpu.server import _Job

            a = _Job(np.zeros((32, 32), np.uint8))
            b = _Job(np.zeros((32, 32), np.uint8))
            c = _Job(np.zeros((16, 16), np.uint8))
            d = _Job(np.zeros((16, 16), np.uint8))
            batch = disp._dispatch([a, b, c, d])
            assert [len(g) for g in ([a, b], [c, d])] == [2, 2]
            assert fake.submit_calls == [2, 2]
            assert len(batch) == 4
        finally:
            disp.close()


class TestDispatcherFuzz:
    def test_concurrent_mixed_shapes_all_complete(self):
        """Hammer the dispatcher from many threads with mixed page shapes
        and a pipeline that fails on a marker shape: every job must get
        either its result or the error — none dropped, none cross-wired."""
        import threading

        from ocrfa_tpu.server import PipelineDispatcher

        class Pipe:
            def submit_page(self, page):
                if page.shape == (13, 13):
                    raise ValueError("bad page")
                return ("h", page.shape, int(page[0, 0]))

            def submit_page_batch(self, pages):
                return [self.submit_page(p) for p in pages]

            def finish_page(self, handle):
                return [handle[2]]

        disp = PipelineDispatcher(Pipe(), depth=3, max_batch=4)
        rng = np.random.default_rng(0)
        shapes = [(32, 32), (16, 16), (13, 13), (64, 32)]
        n = 40
        results = [None] * n
        errors = [None] * n

        def worker(i):
            shape = shapes[i % len(shapes)]
            page = np.full(shape, i, np.uint8)
            try:
                results[i] = disp.submit(page, timeout=60)
            except Exception as exc:
                errors[i] = exc

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
            if rng.random() < 0.3:
                threading.Event().wait(0.002)
        for t in threads:
            t.join(timeout=60)
        disp.close()

        for i in range(n):
            if shapes[i % len(shapes)] == (13, 13):
                assert isinstance(errors[i], ValueError), (i, results[i])
            else:
                # payload round-trips: job i's result carries page value i
                assert results[i] == [i], (i, results[i], errors[i])
        assert disp.stats["pages"] + 10 == n  # 10 markers failed dispatch


class TestSinglesFailureIsolation:
    def test_bad_page_fails_alone_without_batch_support(self):
        """Non-batchable pipeline: a raising submit must error only its own
        job, not same-shape neighbours dispatched in the same drain."""
        import threading

        from ocrfa_tpu.server import PipelineDispatcher

        class Pipe:  # no submit_page_batch
            def __init__(self):
                self.release = threading.Event()

            def submit_page(self, page):
                if int(page[0, 0]) == 2:
                    raise ValueError("bad page")
                return int(page[0, 0])

            def finish_page(self, handle):
                self.release.wait(30)
                return [handle]

        pipe = Pipe()
        disp = PipelineDispatcher(pipe, depth=1, max_batch=8)
        try:
            results = [None] * 4
            errors = [None] * 4

            def worker(i):
                try:
                    results[i] = disp.submit(
                        np.full((8, 8), i, np.uint8), timeout=60)
                except Exception as exc:
                    errors[i] = exc

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(4)]
            threads[0].start()
            for _ in range(200):
                if disp.qsize() == 0 and results[0] is None:
                    break
                threading.Event().wait(0.01)
            for t in threads[1:]:
                t.start()
            for _ in range(200):
                if disp.qsize() == 3:
                    break
                threading.Event().wait(0.01)
            pipe.release.set()
            for t in threads:
                t.join(timeout=60)
            assert results[0] == [0] and results[1] == [1]
            assert isinstance(errors[2], ValueError)
            assert results[3] == [3]
        finally:
            pipe.release.set()
            disp.close()


class TestMetricsEndpoint:
    def _scrape(self, srv):
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        text = resp.read().decode("utf-8")
        conn.close()
        return resp.status, text

    def test_prometheus_exposition(self, server):
        # drive one page through so the counters are non-zero
        page = np.random.default_rng(5).integers(
            0, 255, (96, 128), dtype=np.uint8)
        status, _ = _request(server, "POST", "/ocr", body=page.tobytes(),
                             headers={"X-Height": "96", "X-Width": "128"})
        assert status == 200
        status, text = self._scrape(server)
        assert status == 200
        values = {}
        for line in text.splitlines():
            if line and not line.startswith("#"):
                name, val = line.split()
                values[name] = float(val)
        # counters carry the conventional _total suffix (promtool lint)
        assert values["ocrfa_pages_total"] >= 1
        assert values["ocrfa_errors_total"] == 0
        assert values["ocrfa_latency_samples"] >= 1
        assert values["ocrfa_latency_p50_s"] > 0
        assert values["ocrfa_latency_p95_s"] >= values["ocrfa_latency_p50_s"]
        assert "# TYPE ocrfa_pages_total counter" in text
        assert "# TYPE ocrfa_queued gauge" in text

    def test_error_counter_and_quantiles(self):
        from ocrfa_tpu.server import PipelineDispatcher

        class Pipe:  # no submit_page_batch
            def submit_page(self, page):
                if int(page[0, 0]) == 9:
                    raise ValueError("bad page")
                return int(page[0, 0])

            def finish_page(self, handle):
                return [handle]

        disp = PipelineDispatcher(Pipe(), depth=1)
        try:
            assert disp.submit(np.full((4, 4), 1, np.uint8)) == [1]
            with pytest.raises(ValueError):
                disp.submit(np.full((4, 4), 9, np.uint8))
            m = disp.metrics()
            assert m["errors"] == 1
            assert m["pages"] == 1
            assert m["latency_samples"] == 1  # errors don't pollute latency
            assert m["latency_p99_s"] >= m["latency_p50_s"] > 0
        finally:
            disp.close()


class TestQuantizeFlag:
    def test_static_quant_from_blob_calib(self, tmp_path):
        """--quantize static builds the calibrated int8 recognizer from the
        blob's own training-time calibration batches."""
        import argparse
        import pickle

        import jax

        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.server import build_pipeline_from_args

        charset = "ابتثجخدذرزس"
        params = init_crnn_gen1(jax.random.PRNGKey(0),
                                num_class=len(charset) + 1,
                                output_channel=64, hidden_size=64)
        rng = np.random.default_rng(0)
        calib = ((rng.integers(0, 255, (8, 64, 64, 1)) / 255.0 - 0.5)
                 / 0.5).astype(np.float32)
        blob = {"params": jax.tree.map(np.asarray, params),
                "calib": [calib],
                "meta": {"charset": charset}}
        path = tmp_path / "rec.pkl"
        with open(path, "wb") as f:
            pickle.dump(blob, f)

        args = argparse.Namespace(
            recognizer_pickle=str(path), detector_pickle=None,
            canvas_size=128, quantize="static")
        pipeline = build_pipeline_from_args(args)
        assert pipeline.recognizer.quantized == "static"
        assert pipeline.recognizer.act_amax

    def test_static_quant_calibless_blob_synthesizes(self, tmp_path):
        """A blob with no stored calibration batches: static quant falls
        back to synthetic charset renders as calibration content."""
        import argparse
        import pickle

        import jax

        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.server import build_pipeline_from_args

        charset = "ابتثجخدذرزس"
        params = init_crnn_gen1(jax.random.PRNGKey(2),
                                num_class=len(charset) + 1,
                                output_channel=64, hidden_size=64)
        blob = {"params": jax.tree.map(np.asarray, params),
                "meta": {"charset": charset}}
        path = tmp_path / "rec_nocalib.pkl"
        with open(path, "wb") as f:
            pickle.dump(blob, f)

        args = argparse.Namespace(
            recognizer_pickle=str(path), detector_pickle=None,
            canvas_size=128, quantize="static")
        pipeline = build_pipeline_from_args(args)
        assert pipeline.recognizer.quantized == "static"
        assert pipeline.recognizer.act_amax
