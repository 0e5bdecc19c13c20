"""Model layer (L2): Flax modules for the style-transfer stack.

Capability map to the reference:
  StyleEncoder   <- style_encoder.py:147-258
  ContentEncoder <- content_encoder.py:9-99
  Decoder(codec='linear') <- SimpleDecoder_TransformerOnly.py:9-133 (primary)
  Decoder(codec='conv')   <- new_decoder.py:9-345
  Discriminator  <- discriminator.py:14-28
"""

from ast_tpu.models.attention import (
    MultiheadAttention,
    TransformerDecoder,
    TransformerEncoder,
    causal_mask,
)
from ast_tpu.models.blocks import (
    DeepCNN,
    ResBlock,
    SinusoidalPositionalEncoding,
    SNConv,
    adaptive_avg_pool2d,
    sinusoidal_position_encoding,
)
from ast_tpu.models.content_encoder import ContentEncoder
from ast_tpu.models.decoder import (
    ConvFrameCodec,
    Decoder,
    LinearFrameCodec,
    autoregressive_decode,
)
from ast_tpu.models.discriminator import Discriminator
from ast_tpu.models.init import reference_initialize
from ast_tpu.models.style_encoder import StyleEncoder, class_prototypes

__all__ = [
    "MultiheadAttention", "TransformerDecoder", "TransformerEncoder", "causal_mask",
    "DeepCNN", "ResBlock", "SinusoidalPositionalEncoding", "SNConv",
    "adaptive_avg_pool2d", "sinusoidal_position_encoding",
    "ContentEncoder", "ConvFrameCodec", "Decoder", "LinearFrameCodec",
    "autoregressive_decode", "Discriminator", "StyleEncoder", "class_prototypes",
    "reference_initialize",
]
