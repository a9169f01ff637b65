"""gRPC serving front-end over :class:`ocrfa_tpu.serving.ServingPipeline`.

RPC twin of the HTTP server (``ocrfa_tpu/server.py``): the same
single-dispatcher pipelining discipline (detection for page k+1 overlaps
recognition collection for page k), exposed as a proto-typed service for
production fleets where HTTP/JSON framing is too loose.  The reference has
no serving layer at all (library only, ``src/ocrfa/ocr.py``).

Service (``ocrfa_tpu/proto/ocr.proto``)::

    service ocrfa.OCRService {
      rpc Recognize(OCRRequest) returns (OCRResponse);
      rpc Health(HealthRequest) returns (HealthResponse);
    }

The image ships grpcio but not grpcio-tools, so the service is wired with
:func:`grpc.method_handlers_generic_handler` over the checked-in protoc
message classes instead of generated ``_pb2_grpc`` stubs; the client side
gets an equivalent typed stub via :class:`OCRClient`.
"""

from __future__ import annotations

import io
from concurrent import futures

import numpy as np

from ocrfa_tpu.proto import ocr_pb2
from ocrfa_tpu.server import PipelineDispatcher

_SERVICE = "ocrfa.OCRService"


def _decode_request(req: ocr_pb2.OCRRequest) -> np.ndarray:
    if bool(req.height) != bool(req.width):
        raise ValueError("set both height and width for raw greyscale "
                         "pixels (or neither for an encoded image)")
    if req.height and req.width:
        if req.height * req.width != len(req.image):
            raise ValueError(
                f"raw image is {len(req.image)} bytes, "
                f"expected {req.height * req.width}")
        return np.frombuffer(req.image, dtype=np.uint8).reshape(
            req.height, req.width)
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(req.image)).convert("L"))


def _encode_results(results) -> ocr_pb2.OCRResponse:
    resp = ocr_pb2.OCRResponse()
    for box, text, conf in results:
        r = resp.results.add()
        r.box.extend(int(v) for pt in box for v in pt)
        r.text = text
        r.confidence = float(conf)
    return resp


class OCRGrpcServer:
    """Threaded gRPC server; use as a context manager or ``wait`` explicitly.

    Args:
      pipeline: a :class:`~ocrfa_tpu.serving.ServingPipeline` (already
        holding device-resident detector + recognizer).
      host/port: bind address; port 0 picks a free port (``self.port``).
      depth: device pipelining depth for the shared dispatcher.
      max_workers: gRPC handler threads (requests beyond the dispatcher
        queue block here, providing natural backpressure).
    """

    def __init__(self, pipeline, host: str = "127.0.0.1", port: int = 0,
                 depth: int = 2, max_workers: int = 8, auth=None):
        """``auth``: optional :class:`ocrfa_tpu.utils.ratelimit.AuthPolicy`
        checked against ``authorization`` request metadata on Recognize
        (Health stays open for liveness probes)."""
        import grpc

        self.dispatcher = PipelineDispatcher(pipeline, depth=depth)

        def _authorize(context):
            if auth is None:
                return
            meta = dict(context.invocation_metadata())
            token = auth.bearer(meta.get("authorization")
                                or meta.get("x-api-key"))
            # peer() is 'ipv4:addr:port' — strip the ephemeral port or
            # every new connection gets a fresh rate bucket
            caller = context.peer().rsplit(":", 1)[0]
            verdict = auth.check(token, caller=caller)
            if verdict == "unauthenticated":
                context.abort(grpc.StatusCode.UNAUTHENTICATED,
                              "invalid or missing API key")
            if verdict == "rate_limited":
                context.abort(grpc.StatusCode.RESOURCE_EXHAUSTED,
                              "rate limit exceeded")

        def recognize(request, context):
            import queue

            _authorize(context)
            try:
                page = _decode_request(request)
                return _encode_results(self.dispatcher.submit(page))
            except (ValueError, OSError) as exc:
                context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(exc))
            except queue.Full:
                context.abort(grpc.StatusCode.RESOURCE_EXHAUSTED,
                              "server overloaded (queue full)")
            except TimeoutError as exc:
                context.abort(grpc.StatusCode.DEADLINE_EXCEEDED, str(exc))

        def health(request, context):
            return ocr_pb2.HealthResponse(
                ok=True, queued=self.dispatcher.qsize())

        handler = grpc.method_handlers_generic_handler(_SERVICE, {
            "Recognize": grpc.unary_unary_rpc_method_handler(
                recognize,
                request_deserializer=ocr_pb2.OCRRequest.FromString,
                response_serializer=ocr_pb2.OCRResponse.SerializeToString),
            "Health": grpc.unary_unary_rpc_method_handler(
                health,
                request_deserializer=ocr_pb2.HealthRequest.FromString,
                response_serializer=ocr_pb2.HealthResponse.SerializeToString),
        })
        self.server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers))
        self.server.add_generic_rpc_handlers((handler,))
        self.port = self.server.add_insecure_port(f"{host}:{port}")
        self.server.start()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    def wait(self):
        self.server.wait_for_termination()

    def shutdown(self, grace: float = 2.0):
        self.server.stop(grace).wait()
        self.dispatcher.close()


class OCRClient:
    """Typed client for :class:`OCRGrpcServer` (no generated stubs needed)."""

    def __init__(self, target: str, timeout: float = 120.0,
                 api_key: str | None = None):
        import grpc

        self.channel = grpc.insecure_channel(target)
        self.timeout = timeout
        self._metadata = (
            (("authorization", f"Bearer {api_key}"),) if api_key else None)
        self._recognize = self.channel.unary_unary(
            f"/{_SERVICE}/Recognize",
            request_serializer=ocr_pb2.OCRRequest.SerializeToString,
            response_deserializer=ocr_pb2.OCRResponse.FromString)
        self._health = self.channel.unary_unary(
            f"/{_SERVICE}/Health",
            request_serializer=ocr_pb2.HealthRequest.SerializeToString,
            response_deserializer=ocr_pb2.HealthResponse.FromString)

    def recognize(self, page, encoded: bytes | None = None):
        """OCR one page.

        ``page`` is a (H, W) uint8 greyscale array, or pass ``encoded``
        (PNG/JPEG bytes) instead.  Returns ``[(box, text, confidence)]``
        with ``box`` as a (4, 2) int list, matching
        ``ServingPipeline.process`` output.
        """
        if encoded is not None:
            req = ocr_pb2.OCRRequest(image=encoded)
        else:
            page = np.ascontiguousarray(page, dtype=np.uint8)
            req = ocr_pb2.OCRRequest(image=page.tobytes(),
                                     height=page.shape[0],
                                     width=page.shape[1])
        resp = self._recognize(req, timeout=self.timeout,
                               metadata=self._metadata)
        return [
            ([[r.box[i], r.box[i + 1]] for i in range(0, 8, 2)],
             r.text, r.confidence)
            for r in resp.results
        ]

    def health(self):
        resp = self._health(ocr_pb2.HealthRequest(), timeout=self.timeout,
                            metadata=self._metadata)
        return {"ok": resp.ok, "queued": resp.queued}

    def close(self):
        self.channel.close()


def main(argv=None):  # pragma: no cover - manual entry point
    import argparse

    from ocrfa_tpu.server import (add_serving_args, auth_from_args,
                                  build_pipeline_from_args)

    ap = argparse.ArgumentParser(prog="ocrfa-tpu serve-grpc")
    add_serving_args(ap, port=50051)
    args = ap.parse_args(argv)

    pipeline = build_pipeline_from_args(args)
    server = OCRGrpcServer(pipeline, host=args.host, port=args.port,
                           depth=args.depth, auth=auth_from_args(args))
    print(f"serving on {args.host}:{server.port} (gRPC)")
    server.wait()


if __name__ == "__main__":  # pragma: no cover
    main()
