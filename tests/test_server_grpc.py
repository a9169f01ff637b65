"""gRPC serving front-end: proto round-trip, service calls, error mapping."""

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")


@pytest.fixture(scope="module")
def server():
    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.server_grpc import OCRGrpcServer
    from ocrfa_tpu.serving import ServingPipeline

    conv = CTCLabelConverter("ابتث")
    recognizer = Recognizer(
        init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                       output_channel=64, hidden_size=64), conv)
    pipeline = ServingPipeline(init_craft(jax.random.PRNGKey(1)), recognizer,
                               canvas_size=128)
    with OCRGrpcServer(pipeline, port=0) as srv:
        yield srv


@pytest.fixture(scope="module")
def client(server):
    from ocrfa_tpu.server_grpc import OCRClient

    c = OCRClient(f"127.0.0.1:{server.port}")
    yield c
    c.close()


class TestProto:
    def test_message_roundtrip(self):
        from ocrfa_tpu.proto import ocr_pb2

        req = ocr_pb2.OCRRequest(image=b"\x01\x02", height=1, width=2)
        back = ocr_pb2.OCRRequest.FromString(req.SerializeToString())
        assert back.height == 1 and back.image == b"\x01\x02"

        resp = ocr_pb2.OCRResponse()
        r = resp.results.add()
        r.box.extend([0, 0, 4, 0, 4, 2, 0, 2])
        r.text = "سلام"
        r.confidence = 0.5
        back = ocr_pb2.OCRResponse.FromString(resp.SerializeToString())
        assert back.results[0].text == "سلام"
        assert list(back.results[0].box) == [0, 0, 4, 0, 4, 2, 0, 2]


class TestService:
    def test_health(self, client):
        h = client.health()
        assert h["ok"] is True and h["queued"] >= 0

    def test_recognize_raw(self, client):
        page = np.random.default_rng(0).integers(
            0, 255, (96, 128), dtype=np.uint8)
        results = client.recognize(page)
        assert isinstance(results, list)
        for box, text, conf in results:
            assert len(box) == 4 and all(len(pt) == 2 for pt in box)
            assert isinstance(text, str)
            assert 0.0 <= conf <= 1.0

    def test_recognize_png(self, client):
        import io

        from PIL import Image

        page = np.full((96, 128), 250, dtype=np.uint8)
        page[40:60, 20:100] = 10
        buf = io.BytesIO()
        Image.fromarray(page).save(buf, format="PNG")
        results = client.recognize(None, encoded=buf.getvalue())
        assert isinstance(results, list)

    def test_bad_dims_rejected(self, client):
        from ocrfa_tpu.proto import ocr_pb2

        req = ocr_pb2.OCRRequest(image=b"\x00" * 10, height=4, width=4)
        with pytest.raises(grpc.RpcError) as err:
            client._recognize(req, timeout=30)
        assert err.value.code() == grpc.StatusCode.INVALID_ARGUMENT

    def test_bad_image_bytes_rejected(self, client):
        from ocrfa_tpu.proto import ocr_pb2

        req = ocr_pb2.OCRRequest(image=b"not an image")
        with pytest.raises(grpc.RpcError) as err:
            client._recognize(req, timeout=30)
        assert err.value.code() == grpc.StatusCode.INVALID_ARGUMENT
