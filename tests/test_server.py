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
