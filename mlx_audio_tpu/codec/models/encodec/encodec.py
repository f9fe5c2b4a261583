"""EnCodec (Meta): SEANet + 2-layer LSTM + euclidean RVQ codec.

Parity: /root/reference/mlx_audio/codec/models/encodec/encodec.py (config :22,
causal/reflect conv padding :172-254, resnet :305, encoder :340, decoder :391,
euclidean codebook :447+). Layer numbering matches HF transformers'
EncodecModel state dict (ELU modules occupy indices), so checkpoint keys map
1:1 after conv layout conversion.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_lstm,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
    init_lstm,
)
from ..blocks import vq_encode
from ..mimi.mimi import _causal_conv, _causal_tconv

Array = jax.Array

elu = lambda x: jax.nn.elu(x, alpha=1.0)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "encodec"
    audio_channels: int = 1
    num_filters: int = 32
    kernel_size: int = 7
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    codebook_size: int = 1024
    codebook_dim: int = 128
    hidden_size: int = 128
    num_lstm_layers: int = 2
    residual_kernel_size: int = 3
    use_causal_conv: bool = True
    normalize: bool = False
    pad_mode: str = "reflect"
    last_kernel_size: int = 7
    trim_right_ratio: float = 1.0
    compress: int = 2
    upsampling_ratios: List[int] = field(default_factory=lambda: [8, 5, 4, 2])
    sampling_rate: int = 24000
    num_quantizers: int = 32
    model_path: str = ""


class Encodec(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.hop_length = int(np.prod(config.upsampling_ratios))

    # -- init ----------------------------------------------------------------

    def _init_resnet(self, ks, dim) -> dict:
        c = self.config
        hidden = dim // c.compress
        return {
            "block": {
                "1": init_conv1d(next(ks), dim, hidden,
                                 c.residual_kernel_size),
                "3": init_conv1d(next(ks), hidden, dim, 1),
            },
            "shortcut": init_conv1d(next(ks), dim, dim, 1),
        }

    def _init_lstm_stack(self, ks, dim) -> dict:
        return {"lstm": {str(i): init_lstm(next(ks), dim, dim)
                         for i in range(self.config.num_lstm_layers)}}

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 128))
        enc = {"0": init_conv1d(next(ks), c.audio_channels, c.num_filters,
                                c.kernel_size)}
        idx = 1
        scaling = 1
        for ratio in reversed(c.upsampling_ratios):
            cur = scaling * c.num_filters
            for _ in range(c.num_residual_layers):
                enc[str(idx)] = self._init_resnet(ks, cur)
                idx += 1
            idx += 1  # ELU
            enc[str(idx)] = init_conv1d(next(ks), cur, cur * 2, ratio * 2)
            idx += 1
            scaling *= 2
        enc[str(idx)] = self._init_lstm_stack(ks, scaling * c.num_filters)
        idx += 2  # lstm + ELU
        enc[str(idx)] = init_conv1d(next(ks), scaling * c.num_filters,
                                    c.hidden_size, c.last_kernel_size)

        dec = {"0": init_conv1d(next(ks), c.hidden_size,
                                scaling * c.num_filters, c.kernel_size)}
        dec["1"] = self._init_lstm_stack(ks, scaling * c.num_filters)
        idx = 2
        for ratio in c.upsampling_ratios:
            cur = scaling * c.num_filters
            idx += 1  # ELU
            dec[str(idx)] = init_conv_transpose1d(next(ks), cur, cur // 2,
                                                  ratio * 2)
            idx += 1
            for _ in range(c.num_residual_layers):
                dec[str(idx)] = self._init_resnet(ks, cur // 2)
                idx += 1
            scaling //= 2
        idx += 1  # ELU
        dec[str(idx)] = init_conv1d(next(ks), c.num_filters, c.audio_channels,
                                    c.last_kernel_size)

        quant = {"layers": {
            str(i): {"codebook": {"embed": init_embedding(
                next(ks), c.codebook_size, c.codebook_dim)}}
            for i in range(c.num_quantizers)}}
        return {"encoder": {"layers": enc}, "decoder": {"layers": dec},
                "quantizer": quant}

    # -- building blocks -----------------------------------------------------

    def _resnet(self, p, x, dilation):
        c = self.config
        h = _causal_conv(p["block"]["1"], elu(x), c.residual_kernel_size,
                         dilation=dilation, pad_mode=c.pad_mode)
        h = _causal_conv(p["block"]["3"], elu(h), 1, pad_mode=c.pad_mode)
        return _causal_conv(p["shortcut"], x, 1, pad_mode=c.pad_mode) + h

    def _lstm(self, p, x):
        h = x
        for i in range(self.config.num_lstm_layers):
            h = apply_lstm(p["lstm"][str(i)], h)
        return x + h  # residual skip (HF EncodecLSTM)

    # -- encode/decode -------------------------------------------------------

    def encode_latent(self, audio: Array) -> Array:
        """(B, T, 1) -> (B, frames, hidden)."""
        c = self.config
        p = self.params["encoder"]["layers"]
        x = _causal_conv(p["0"], audio, c.kernel_size, pad_mode=c.pad_mode)
        idx = 1
        scaling = 1
        for ratio in reversed(c.upsampling_ratios):
            for j in range(c.num_residual_layers):
                x = self._resnet(p[str(idx)], x, c.dilation_growth_rate ** j)
                idx += 1
            idx += 1
            x = _causal_conv(p[str(idx)], elu(x), ratio * 2, stride=ratio,
                             pad_mode=c.pad_mode)
            idx += 1
            scaling *= 2
        x = self._lstm(p[str(idx)], x)
        idx += 2
        return _causal_conv(p[str(idx)], elu(x), c.last_kernel_size,
                            pad_mode=c.pad_mode)

    def decode_latent(self, x: Array) -> Array:
        c = self.config
        p = self.params["decoder"]["layers"]
        scaling = int(2 ** len(c.upsampling_ratios))
        x = _causal_conv(p["0"], x, c.kernel_size, pad_mode=c.pad_mode)
        x = self._lstm(p["1"], x)
        idx = 2
        for ratio in c.upsampling_ratios:
            idx += 1
            x = _causal_tconv(p[str(idx)], elu(x), ratio * 2, ratio)
            idx += 1
            for j in range(c.num_residual_layers):
                x = self._resnet(p[str(idx)], x, c.dilation_growth_rate ** j)
                idx += 1
            scaling //= 2
        idx += 1
        return _causal_conv(p[str(idx)], elu(x), c.last_kernel_size,
                            pad_mode=c.pad_mode)

    def encode(self, audio, n_quantizers: Optional[int] = None) -> Array:
        """-> codes (B, nq, frames)."""
        audio = jnp.asarray(audio, jnp.float32)
        if audio.ndim == 3:
            audio = audio[:, 0]
        elif audio.ndim == 1:
            audio = audio[None]
        z = self.encode_latent(audio[..., None])
        nq = n_quantizers or self.config.num_quantizers
        codes = []
        residual = z
        for i in range(nq):
            cb = self.params["quantizer"]["layers"][str(i)]["codebook"][
                "embed"]["weight"]
            idx = vq_encode(residual, cb, normalized=False)
            codes.append(idx)
            residual = residual - cb[idx]
        return jnp.stack(codes, axis=1)

    def decode(self, codes) -> Array:
        """codes (B, nq, T) -> audio (B, samples, 1)."""
        codes = jnp.asarray(codes)
        acc = None
        for i in range(codes.shape[1]):
            cb = self.params["quantizer"]["layers"][str(i)]["codebook"][
                "embed"]["weight"]
            q = cb[codes[:, i]]
            acc = q if acc is None else acc + q
        return self.decode_latent(acc)

    def __call__(self, audio) -> Tuple[Array, Array]:
        codes = self.encode(audio)
        return self.decode(codes), codes

    # -- weights -------------------------------------------------------------

    def sanitize(self, weights):
        """HF EncodecModel keys -> functional tree: conv layouts, LSTM
        sublayer remap, codebook embed_sum/cluster_size reconstruction."""
        from ....nn.layers import (convert_torch_conv_transpose_weight,
                                   fold_torch_weight_norm)

        weights = fold_torch_weight_norm(weights)
        out = {}
        codebooks = {}
        n_up = len(self.config.upsampling_ratios)
        # decoder transposed-conv layer indices: 3, 3+1+num_res+1, ...
        tconv_idx = set()
        idx = 2
        for _ in self.config.upsampling_ratios:
            idx += 1
            tconv_idx.add(idx)
            idx += 1 + self.config.num_residual_layers
        for k, w in weights.items():
            if "codebook.embed_sum" in k or "codebook.cluster_size" in k \
                    or "codebook.cluster_usage" in k:
                base = k.split(".codebook.")[0]
                codebooks.setdefault(base, {})[
                    "sum" if "embed_sum" in k else "usage"] = np.asarray(w)
                continue
            if "codebook.inited" in k or "codebook.initialized" in k:
                continue
            if k.endswith(".codebook.embed"):  # direct codebook buffer
                out[k + ".weight"] = w
                continue
            # LSTM: HF weight_ih_l{n} -> lstm.{n}.weight_ih
            for n in range(self.config.num_lstm_layers):
                for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                    suf = f".lstm.{part}_l{n}"
                    if k.endswith(suf):
                        k = k[: -len(suf)] + f".lstm.{n}.{part}"
                        break
            if k.endswith(".conv.weight"):
                k = k.replace(".conv.weight", ".weight")
            if k.endswith(".conv.bias"):
                k = k.replace(".conv.bias", ".bias")
            if k.endswith(".weight") and w.ndim == 3:
                parts = k.split(".")
                is_dec_tconv = ("decoder" in k and len(parts) >= 3
                                and parts[2].isdigit()
                                and int(parts[2]) in tconv_idx)
                if is_dec_tconv:
                    out[k] = convert_torch_conv_transpose_weight(w)
                else:
                    out[k] = jnp.transpose(w, (2, 1, 0))
                continue
            out[k] = w
        for base, d in codebooks.items():
            if "sum" in d and "usage" in d:
                emb = d["sum"] / np.clip(d["usage"][:, None], 1e-5, None)
                out[f"{base}.codebook.embed.weight"] = jnp.asarray(emb)
        return out


Model = Encodec
