"""SNAC: multi-scale residual VQ codec (24 kHz speech / 44 kHz music).

Parity: /root/reference/mlx_audio/codec/models/snac (snac.py, layers.py,
vq.py, attention.py; shape contract codec/tests/test_snac.py:25-36 — a
120 000-sample input encodes to 3 code levels of strides [4,2,1] and decodes
to 120 907 samples). Functional channel-last rebuild; weight-norm folded at
load; the multi-scale VQ pool/repeat ops are plain reshapes (MXU-friendly).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_embedding,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
)
from ..blocks import (
    apply_residual_unit,
    apply_snake,
    avg_pool_time,
    init_residual_unit,
    init_snake,
    repeat_time,
    vq_encode,
)

Array = jax.Array


def _is_decoder_upsampler(base: str) -> bool:
    """decoder.N.block.1 is the transposed upsampler in the descript/snac
    Sequential layout. A substring test on '.block.1.' also matches the
    *inner* res-unit conv at ...block.K.block.1, so anchor the pattern to
    the block directly under a decoder stage index."""
    import re

    return re.search(r"decoder\.(?:model\.)?\d+\.block\.1$", base) is not None

from dataclasses import dataclass, field


@dataclass
class ModelConfig(BaseModelArgs):
    sampling_rate: int = 24000
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [3, 3, 7, 7])
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: List[int] = field(default_factory=lambda: [7, 7, 3, 3])
    attn_window_size: Optional[int] = 32
    codebook_size: int = 4096
    codebook_dim: int = 8
    vq_strides: List[int] = field(default_factory=lambda: [8, 4, 2, 1])
    noise: bool = True
    depthwise: bool = True
    model_path: str = ""


# ---------------------------------------------------------------------------
# encoder / decoder inits
# ---------------------------------------------------------------------------


def _init_encoder_block(key, output_dim: int, stride: int, groups: int) -> dict:
    ks = iter(jax.random.split(key, 8))
    input_dim = output_dim // 2
    return {"block": {
        "0": init_residual_unit(next(ks), input_dim, 1, groups=groups),
        "1": init_residual_unit(next(ks), input_dim, 3, groups=groups),
        "2": init_residual_unit(next(ks), input_dim, 9, groups=groups),
        "3": init_snake(input_dim),
        "4": init_conv1d(next(ks), input_dim, output_dim, 2 * stride),
    }}


def _init_decoder_block(key, input_dim: int, output_dim: int, stride: int,
                        noise: bool, groups: int) -> dict:
    ks = iter(jax.random.split(key, 8))
    p = {"block": {
        "0": init_snake(input_dim),
        "1": init_conv_transpose1d(next(ks), input_dim, output_dim,
                                   2 * stride),
    }}
    idx = 2
    if noise:
        p["block"][str(idx)] = {"linear": init_conv1d(
            next(ks), output_dim, output_dim, 1, bias=False)}
        idx += 1
    for dil in (1, 3, 9):
        p["block"][str(idx)] = init_residual_unit(next(ks), output_dim, dil,
                                                  groups=groups)
        idx += 1
    return p


class SNAC(FunctionalModel):
    """Multi-scale RVQ codec. encode/decode public surface matches the
    reference (snac.py:87-163)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        c = config
        self.hop_length = int(np.prod(c.encoder_rates))
        self.latent_dim = (c.latent_dim if c.latent_dim is not None
                           else c.encoder_dim * (2 ** len(c.encoder_rates)))

    # -- init ---------------------------------------------------------------

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 64))
        d_model = c.encoder_dim
        enc_layers = {"0": init_conv1d(next(ks), 1, d_model, 7)}
        idx = 1
        for stride in c.encoder_rates:
            d_model *= 2
            groups = d_model // 2 if c.depthwise else 1
            enc_layers[str(idx)] = _init_encoder_block(next(ks), d_model,
                                                       stride, groups)
            idx += 1
        groups = d_model if c.depthwise else 1
        enc_layers[str(idx)] = init_conv1d(next(ks), d_model, d_model, 7,
                                           groups=groups)

        # quantizers
        quant = {}
        for i, stride in enumerate(c.vq_strides):
            quant[str(i)] = {
                "in_proj": init_conv1d(next(ks), self.latent_dim,
                                       c.codebook_dim, 1),
                "out_proj": init_conv1d(next(ks), c.codebook_dim,
                                        self.latent_dim, 1),
                "codebook": init_embedding(next(ks), c.codebook_size,
                                           c.codebook_dim),
            }

        # decoder
        dec_layers = {}
        idx = 0
        if c.depthwise:
            dec_layers["0"] = init_conv1d(next(ks), self.latent_dim,
                                          self.latent_dim, 7,
                                          groups=self.latent_dim)
            dec_layers["1"] = init_conv1d(next(ks), self.latent_dim,
                                          c.decoder_dim, 1)
            idx = 2
        else:
            dec_layers["0"] = init_conv1d(next(ks), self.latent_dim,
                                          c.decoder_dim, 7)
            idx = 1
        output_dim = c.decoder_dim
        for i, stride in enumerate(c.decoder_rates):
            input_dim = c.decoder_dim // (2 ** i)
            output_dim = c.decoder_dim // (2 ** (i + 1))
            groups = output_dim if c.depthwise else 1
            dec_layers[str(idx)] = _init_decoder_block(
                next(ks), input_dim, output_dim, stride, c.noise, groups)
            idx += 1
        dec_layers[str(idx)] = init_snake(output_dim)
        dec_layers[str(idx + 1)] = init_conv1d(next(ks), output_dim, 1, 7)
        return {"encoder": enc_layers, "quantizer": quant,
                "decoder": dec_layers}

    # -- pipeline -----------------------------------------------------------

    def preprocess(self, audio: Array) -> Array:
        c = self.config
        lcm = np.lcm(c.vq_strides[0], 1) * self.hop_length
        t = audio.shape[-1]
        pad = (lcm - t % lcm) % lcm
        return jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])

    def _encode_latent(self, audio: Array) -> Array:
        """audio (B, T) -> latent (B, T/hop, D)."""
        c = self.config
        p = self.params["encoder"]
        x = apply_conv1d(p["0"], audio[..., None], padding=3)
        idx = 1
        d_model = c.encoder_dim
        for stride in c.encoder_rates:
            d_model *= 2
            groups = d_model // 2 if c.depthwise else 1
            blk = p[str(idx)]["block"]
            for j, dil in zip(("0", "1", "2"), (1, 3, 9)):
                x = apply_residual_unit(blk[j], x, dil, groups=groups)
            x = apply_snake(blk["3"], x)
            x = apply_conv1d(blk["4"], x, stride=stride,
                             padding=math.ceil(stride / 2))
            idx += 1
        groups = d_model if c.depthwise else 1
        x = apply_conv1d(p[str(idx)], x, padding=3, groups=groups)
        return x

    def encode(self, audio) -> List[Array]:
        """(B, 1, T) or (B, T) or (T,) -> list of per-level codes (B, T_i)."""
        audio = jnp.asarray(audio)
        if audio.ndim == 3:
            audio = audio[:, 0]
        elif audio.ndim == 1:
            audio = audio[None]
        audio = self.preprocess(audio)
        z = self._encode_latent(audio)
        c = self.config
        codes = []
        residual = z
        for i, stride in enumerate(c.vq_strides):
            q = self.params["quantizer"][str(i)]
            zi = avg_pool_time(residual, stride) if stride > 1 else residual
            z_e = apply_conv1d(q["in_proj"], zi)
            idx = vq_encode(z_e, q["codebook"]["weight"], normalized=True)
            codes.append(idx)
            z_q = apply_embedding(q["codebook"], idx)
            z_q = apply_conv1d(q["out_proj"], z_q)
            if stride > 1:
                z_q = repeat_time(z_q, stride)
            residual = residual - z_q
        return codes

    def codes_to_latent(self, codes: List[Array]) -> Array:
        c = self.config
        z = None
        for i, stride in enumerate(c.vq_strides):
            q = self.params["quantizer"][str(i)]
            z_q = apply_embedding(q["codebook"], jnp.asarray(codes[i]))
            z_q = apply_conv1d(q["out_proj"], z_q)
            if stride > 1:
                z_q = repeat_time(z_q, stride)
            z = z_q if z is None else z + z_q
        return z

    def decode(self, codes: List[Array]) -> Array:
        """codes -> audio (B, samples, 1) (reference returns NLC)."""
        c = self.config
        z = self.codes_to_latent(codes)
        p = self.params["decoder"]
        if c.depthwise:
            x = apply_conv1d(p["0"], z, padding=3, groups=self.latent_dim)
            x = apply_conv1d(p["1"], x)
            idx = 2
        else:
            x = apply_conv1d(p["0"], z, padding=3)
            idx = 1
        for i, stride in enumerate(c.decoder_rates):
            input_dim = c.decoder_dim // (2 ** i)
            output_dim = c.decoder_dim // (2 ** (i + 1))
            groups = output_dim if c.depthwise else 1
            blk = p[str(idx)]["block"]
            x = apply_snake(blk["0"], x)
            x = apply_conv_transpose1d(blk["1"], x, stride=stride,
                                       padding=math.ceil(stride / 2),
                                       output_padding=stride % 2)
            j = 2
            if c.noise:
                h = apply_conv1d(blk[str(j)]["linear"], x)
                noise = jax.random.normal(jax.random.PRNGKey(0),
                                          (x.shape[0], x.shape[1], 1))
                x = x + noise * h
                j += 1
            for dil in (1, 3, 9):
                x = apply_residual_unit(blk[str(j)], x, dil, groups=groups)
                j += 1
            idx += 1
        x = apply_snake(p[str(idx)], x)
        x = apply_conv1d(p[str(idx + 1)], x, padding=3)
        return jnp.tanh(x)

    def decode_stream(
        self,
        codes: List[Array],
        prev_codes: Optional[List[Array]] = None,
        context_frames: int = 8,
    ) -> Tuple[Array, List[Array]]:
        """Streaming decode with latent-frame context for smooth chunk
        boundaries (reference snac.py:106-162). `codes` are the NEW frames
        only; `context_frames` counts latent steps, so layer i contributes
        its last context_frames // vq_strides[i] codes as context. Returns
        (new_audio, context_codes_for_next_call)."""
        c = self.config
        codes = [jnp.asarray(x) for x in codes]
        if prev_codes is None:
            audio = self.decode(codes)
            new_context = [
                x[:, -context_frames:] if x.shape[1] > context_frames else x
                for x in codes
            ]
            return audio, new_context

        combined = []
        for i, (prev, new) in enumerate(zip(prev_codes, codes)):
            layer_ctx = max(1, context_frames // c.vq_strides[i])
            if prev.shape[1] > layer_ctx:
                prev = prev[:, -layer_ctx:]
            combined.append(jnp.concatenate([jnp.asarray(prev), new], axis=1))
        full_audio = self.decode(combined)
        context_samples = context_frames * self.hop_length
        if full_audio.shape[1] > context_samples:
            full_audio = full_audio[:, context_samples:]
        new_context = [
            x[:, -context_frames:] if x.shape[1] > context_frames else x
            for x in codes
        ]
        return full_audio, new_context

    def __call__(self, audio) -> Tuple[Array, List[Array]]:
        codes = self.encode(audio)
        return self.decode(codes), codes

    # -- weights ------------------------------------------------------------

    def sanitize(self, weights):
        """Fold weight-norm (g, v); convert torch conv layouts to WIO and
        transposed convs to pre-flipped kernels; snake alphas to (C,)."""
        from ....nn.layers import convert_torch_conv_transpose_weight
        from ....tts.models.kokoro.istftnet import fold_weight_norm

        out = {}
        gs = {k: v for k, v in weights.items() if k.endswith("weight_g")}
        for k, w in weights.items():
            if k.endswith("weight_g") or k.endswith("parametrizations.weight.original0"):
                continue
            if k.endswith("parametrizations.weight.original1"):
                base = k[: -len(".parametrizations.weight.original1")]
                g = weights.get(base + ".parametrizations.weight.original0")
                k, w = base + ".weight_v", w
                if g is not None:
                    gs[base + ".weight_g"] = g
            if k.endswith("weight_v"):
                base = k[: -len(".weight_v")]
                g = gs.get(base + ".weight_g")
                folded = fold_weight_norm(g, w) if g is not None else np.asarray(w)
                if _is_decoder_upsampler(base):
                    out[base + ".weight"] = convert_torch_conv_transpose_weight(
                        jnp.asarray(folded))
                else:
                    out[base + ".weight"] = jnp.transpose(
                        jnp.asarray(folded), (2, 1, 0))
                continue
            if k.endswith("alpha") and w.ndim == 3:
                out[k] = w.reshape(-1)
                continue
            if k.endswith(".weight") and w.ndim == 3:
                if _is_decoder_upsampler(k[: -len(".weight")]):
                    out[k] = convert_torch_conv_transpose_weight(w)
                else:
                    out[k] = jnp.transpose(w, (2, 1, 0))
                continue
            out[k] = w
        return out


Model = SNAC
