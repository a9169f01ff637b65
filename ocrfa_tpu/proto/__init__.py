"""Protobuf message definitions for the gRPC serving front-end.

``ocr_pb2`` is generated from ``ocr.proto`` and checked in so the package
imports without protoc; regenerate with the command in the .proto header.
"""

from ocrfa_tpu.proto import ocr_pb2

__all__ = ["ocr_pb2"]
