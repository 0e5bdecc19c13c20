"""Evaluation & inference layer (L5): the end-to-end transfer pipeline,
reconstruction/transfer metrics, and the two evaluation drivers."""

from ast_tpu.eval.inference import (
    ID_TO_NAME,
    NAME_TO_ID,
    StyleTransferPipeline,
    generate_class_embeddings,
)
from ast_tpu.eval.streaming import StreamingTransfer, StreamState

__all__ = [
    "ID_TO_NAME", "NAME_TO_ID", "StyleTransferPipeline",
    "generate_class_embeddings", "StreamingTransfer", "StreamState",
]
