"""PyTorch checkpoint import.

Converts the reference's torch.save checkpoint format — a dict of four
state_dicts {content_encoder, style_encoder, decoder, discriminator}
(reference: evaluation_style_transfer.py:246-252, checkpoints/read.txt) —
into this framework's Flax variable collections, for numerical parity testing
and for users migrating trained weights.

Layout transforms:
  torch Conv2d   (out, in, kh, kw)  -> NHWC kernel (kh, kw, in, out)
  torch Linear   (out, in)          -> kernel (in, out)
  in_proj_weight (3d, d)            -> in_proj_kernel (d, 3d)
  spectral_norm:  weight_orig -> kernel, weight_u -> spectral/u (same dim:
                  torch power-iterates u over the out-channel axis, as we do)
  BatchNorm:      weight/bias -> scale/bias; running_* -> batch_stats
  InstanceNorm(affine): weight/bias -> scale/bias
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _convT(w) -> np.ndarray:
    # torch ConvTranspose2d weight (in, out, kh, kw) -> ours (kh, kw, out, in)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _sn_conv(sd: Dict, prefix: str) -> Dict:
    """Spectral-norm conv params + u vector from torch names."""
    out = {"params": {
        "kernel": _conv(sd[f"{prefix}.weight_orig"]),
    }}
    if f"{prefix}.bias" in sd:
        out["params"]["bias"] = np.asarray(sd[f"{prefix}.bias"])
    out["spectral"] = {"u": np.asarray(sd[f"{prefix}.weight_u"])}
    return out


def _bn(sd: Dict, prefix: str) -> Dict:
    return {
        "params": {"scale": np.asarray(sd[f"{prefix}.weight"]),
                   "bias": np.asarray(sd[f"{prefix}.bias"])},
        "batch_stats": {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
                        "var": np.asarray(sd[f"{prefix}.running_var"])},
    }


def _norm(sd: Dict, prefix: str) -> Dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _dense(sd: Dict, prefix: str) -> Dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _merge(dst: Dict, path: tuple, sub: Dict) -> None:
    """Insert {'params':…, 'spectral':…, 'batch_stats':…} under path in the
    per-collection trees of dst."""
    for coll, tree in sub.items():
        node = dst.setdefault(coll, {})
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = tree


def _resblock(sd: Dict, prefix: str, dst: Dict, path: tuple) -> None:
    _merge(dst, path + ("conv1",), _sn_conv(sd, f"{prefix}.conv1"))
    _merge(dst, path + ("bn1",), _bn(sd, f"{prefix}.bn1"))
    _merge(dst, path + ("conv2",), _sn_conv(sd, f"{prefix}.conv2"))
    _merge(dst, path + ("bn2",), _bn(sd, f"{prefix}.bn2"))
    if f"{prefix}.downsample.0.weight_orig" in sd:
        _merge(dst, path + ("shortcut_conv",), _sn_conv(sd, f"{prefix}.downsample.0"))
        _merge(dst, path + ("shortcut_norm",),
               {"params": _norm(sd, f"{prefix}.downsample.1")})


def _encoder_layer(sd: Dict, prefix: str, dst: Dict, path: tuple) -> None:
    _merge(dst, path + ("self_attn",), {"params": {
        "in_proj_kernel": _t(sd[f"{prefix}.self_attn.in_proj_weight"]),
        "in_proj_bias": np.asarray(sd[f"{prefix}.self_attn.in_proj_bias"]),
        "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
    }})
    _merge(dst, path + ("ff",), {"params": {
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
    }})
    _merge(dst, path + ("norm1",), {"params": _norm(sd, f"{prefix}.norm1")})
    _merge(dst, path + ("norm2",), {"params": _norm(sd, f"{prefix}.norm2")})


def _decoder_layer(sd: Dict, prefix: str, dst: Dict, path: tuple) -> None:
    for ours, theirs in (("self_attn", "self_attn"),
                         ("cross_attn", "multihead_attn")):
        _merge(dst, path + (ours,), {"params": {
            "in_proj_kernel": _t(sd[f"{prefix}.{theirs}.in_proj_weight"]),
            "in_proj_bias": np.asarray(sd[f"{prefix}.{theirs}.in_proj_bias"]),
            "out_proj": _dense(sd, f"{prefix}.{theirs}.out_proj"),
        }})
    _merge(dst, path + ("ff",), {"params": {
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
    }})
    for n in ("norm1", "norm2", "norm3"):
        _merge(dst, path + (n,), {"params": _norm(sd, f"{prefix}.{n}")})


def convert_style_encoder(sd: Dict, num_blocks: int = 6,
                          num_layers: int = 4) -> Dict:
    """reference style_encoder.py state_dict -> our StyleEncoder variables."""
    dst: Dict = {}
    for i in range(num_blocks):
        _resblock(sd, f"cnn.net.{i}", dst, ("cnn", f"block{i}"))
    _merge(dst, ("cnn", "proj"), {"params": _dense(sd, "cnn.proj")})
    _merge(dst, ("norm",), {"params": _norm(sd, "norm")})
    for i in range(num_layers):
        _encoder_layer(sd, f"transformer.layers.{i}", dst,
                       ("transformer", f"layer{i}"))
    dst.setdefault("params", {})["cls_token"] = np.asarray(sd["cls_token"])
    if "input_proj.weight" in sd:
        _merge(dst, ("input_proj",), {"params": _dense(sd, "input_proj")})
    return dst


def convert_content_encoder(sd: Dict, num_blocks: int = 6,
                            num_layers: int = 4) -> Dict:
    """reference content_encoder.py state_dict -> our ContentEncoder
    variables. The reference keeps its CNN blocks in `cnn.{i}` and the
    projection separately in `proj` (content_encoder.py:38,46); ours nests
    both under the DeepCNN module."""
    dst: Dict = {}
    for i in range(num_blocks):
        _resblock(sd, f"cnn.{i}", dst, ("cnn", f"block{i}"))
    _merge(dst, ("cnn", "proj"), {"params": _dense(sd, "proj")})
    _merge(dst, ("norm",), {"params": _norm(sd, "norm")})
    for i in range(num_layers):
        _encoder_layer(sd, f"transformer.layers.{i}", dst,
                       ("transformer", f"layer{i}"))
    if "input_proj.weight" in sd:
        _merge(dst, ("input_proj",), {"params": _dense(sd, "input_proj")})
    return dst


def convert_simple_decoder(sd: Dict, num_layers: int = 4) -> Dict:
    """reference SimpleDecoder_TransformerOnly.py state_dict -> our
    Decoder(codec='linear') variables."""
    dst: Dict = {}
    _merge(dst, ("frame_codec", "stft_to_embedding"),
           {"params": _dense(sd, "stft_to_embedding")})
    _merge(dst, ("frame_codec", "embedding_to_stft"),
           {"params": _dense(sd, "embedding_to_stft")})
    _merge(dst, ("content_proj",), {"params": _dense(sd, "content_proj")})
    _merge(dst, ("class_proj",), {"params": _dense(sd, "class_proj")})
    for i in range(num_layers):
        _decoder_layer(sd, f"transformer_decoder.layers.{i}", dst,
                       ("core", f"layer{i}"))
    _merge(dst, ("input_norm",), {"params": _norm(sd, "input_norm")})
    _merge(dst, ("output_norm",), {"params": _norm(sd, "output_norm")})
    dst.setdefault("params", {})["start_token"] = np.asarray(sd["start_token"])
    return dst


def convert_discriminator(sd: Dict) -> Dict:
    """reference discriminator.py state_dict -> our Discriminator variables."""
    return {"params": {
        "fc1": _dense(sd, "net.0"),
        "fc2": _dense(sd, "net.2"),
        "fc3": _dense(sd, "net.4"),
    }}


def load_torch_checkpoint(path: str,
                          decoder_codec: str = "linear") -> Dict[str, Dict]:
    """Load a reference .pth and convert all four modules. Returns
    {'content': vars, 'style': vars, 'decoder': vars, 'disc': vars}.

    `decoder_codec` selects the decoder variant stored in the checkpoint:
    "linear" for the primary SimpleDecoder_TransformerOnly epoch-100
    checkpoint, "conv" for the new_decoder epoch-70 one
    (checkpoints/read.txt:3-4)."""
    import torch

    if decoder_codec not in ("linear", "conv"):
        raise ValueError(f"decoder_codec must be 'linear' or 'conv', "
                         f"got {decoder_codec!r}")
    convert_decoder = (convert_simple_decoder if decoder_codec == "linear"
                       else convert_conv_decoder)
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    as_np = lambda sd: {k: v.numpy() for k, v in sd.items()}
    return {
        "content": convert_content_encoder(as_np(ckpt["content_encoder"])),
        "style": convert_style_encoder(as_np(ckpt["style_encoder"])),
        "decoder": convert_decoder(as_np(ckpt["decoder"])),
        "disc": convert_discriminator(as_np(ckpt["discriminator"])),
    }


def _sn_convT(sd: Dict, prefix: str) -> Dict:
    """Spectral-norm ConvTranspose2d params from torch names.

    torch power-iterates ConvTranspose weights along dim=1 — u in R^out for
    the (in, out, kh, kw) weight. SNConvTranspose unfolds its (kh, kw, out,
    in) kernel by the same out axis, so torch's weight_u imports verbatim."""
    w = sd[f"{prefix}.weight_orig"]
    return {
        "params": {"kernel": _convT(w),
                   "bias": np.asarray(sd[f"{prefix}.bias"])},
        "spectral": {"u": np.asarray(sd[f"{prefix}.weight_u"])},
    }


def convert_conv_decoder(sd: Dict, num_layers: int = 4) -> Dict:
    """reference new_decoder.py state_dict -> our Decoder(codec='conv')
    variables. Sequential indices in torch: conv_encoder {0,3,6,9} convs with
    BN at {1,4,7,10}; spatial_projection {0 conv3x3, 1 BN? no — {0 conv, 1 BN,
    3 conv1x1}}; conv_decoder convT at {0,3,6,9,12} with BN at {1,4,7,10}
    (new_decoder.py:27-100)."""
    dst: Dict = {}
    fc = ("frame_codec",)
    for i, seq_idx in enumerate((0, 3, 6, 9)):
        _merge(dst, fc + (f"enc_conv{i}",), _sn_conv(sd, f"conv_encoder.{seq_idx}"))
        _merge(dst, fc + (f"enc_bn{i}",), _bn(sd, f"conv_encoder.{seq_idx + 1}"))
    _merge(dst, fc + ("spatial_conv",), _sn_conv(sd, "spatial_projection.0"))
    _merge(dst, fc + ("spatial_bn",), _bn(sd, "spatial_projection.1"))
    _merge(dst, fc + ("spatial_out",), _sn_conv(sd, "spatial_projection.3"))
    _merge(dst, fc + ("feature_to_sequence",),
           {"params": _dense(sd, "feature_to_sequence")})
    _merge(dst, fc + ("sequence_to_feature",),
           {"params": _dense(sd, "sequence_to_feature")})
    for i, seq_idx in enumerate((0, 3, 6, 9)):
        _merge(dst, fc + (f"dec_conv{i}",), _sn_convT(sd, f"conv_decoder.{seq_idx}"))
        _merge(dst, fc + (f"dec_bn{i}",), _bn(sd, f"conv_decoder.{seq_idx + 1}"))
    _merge(dst, fc + ("dec_out",), _sn_convT(sd, "conv_decoder.12"))

    _merge(dst, ("content_proj",), {"params": _dense(sd, "content_proj")})
    _merge(dst, ("class_proj",), {"params": _dense(sd, "class_proj")})
    for i in range(num_layers):
        _decoder_layer(sd, f"transformer_decoder.layers.{i}", dst,
                       ("core", f"layer{i}"))
    _merge(dst, ("input_norm",), {"params": _norm(sd, "input_norm")})
    _merge(dst, ("output_norm",), {"params": _norm(sd, "output_norm")})
    dst.setdefault("params", {})["start_token"] = np.asarray(sd["start_token"])
    return dst
