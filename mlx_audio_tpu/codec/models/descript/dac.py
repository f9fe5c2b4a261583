"""Descript Audio Codec (DAC): RVQ codec at 16/24/44.1 kHz.

Parity: /root/reference/mlx_audio/codec/models/descript (dac.py Encoder :57,
Decoder :104, DAC :132; nn/quantize.py RVQ :66, from_codes :122). DAC is the
ancestor architecture of SNAC: same Snake/WN-conv residual blocks without the
multi-scale VQ strides, noise, or depthwise variants — implemented here on
the shared functional codec blocks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

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
    init_residual_unit,
    init_snake,
    vq_encode,
)

Array = jax.Array


@dataclass
class ModelConfig(BaseModelArgs):
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [2, 4, 5, 8])
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: List[int] = field(default_factory=lambda: [8, 5, 4, 2])
    n_codebooks: int = 32
    codebook_size: int = 1024
    codebook_dim: int = 8
    sample_rate: int = 44100
    model_path: str = ""

    @classmethod
    def from_dict(cls, config: dict):
        """Accept both the native descript field names and the HF
        transformers `DacConfig` schema (descript/dac_* hub repos)."""
        if isinstance(config, dict) and ("encoder_hidden_size" in config
                                         or "downsampling_ratios" in config):
            return cls(
                encoder_dim=config.get("encoder_hidden_size", 64),
                encoder_rates=list(config.get("downsampling_ratios",
                                              [2, 4, 8, 8])),
                latent_dim=config.get("hidden_size"),
                decoder_dim=config.get("decoder_hidden_size", 1536),
                decoder_rates=list(config.get("upsampling_ratios",
                                              [8, 8, 4, 2])),
                n_codebooks=config.get("n_codebooks", 9),
                codebook_size=config.get("codebook_size", 1024),
                codebook_dim=config.get("codebook_dim", 8),
                sample_rate=config.get("sampling_rate", 44100),
                model_path=config.get("model_path", ""))
        return super().from_dict(config)


class DAC(FunctionalModel):
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
        self.sample_rate = c.sample_rate

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 64))
        d = c.encoder_dim
        enc = {"0": init_conv1d(next(ks), 1, d, 7)}
        idx = 1
        for stride in c.encoder_rates:
            d *= 2
            enc[str(idx)] = {"block": {
                "0": init_residual_unit(next(ks), d // 2, 1),
                "1": init_residual_unit(next(ks), d // 2, 3),
                "2": init_residual_unit(next(ks), d // 2, 9),
                "3": init_snake(d // 2),
                "4": init_conv1d(next(ks), d // 2, d, 2 * stride),
            }}
            idx += 1
        enc[str(idx)] = init_snake(d)
        enc[str(idx + 1)] = init_conv1d(next(ks), d, self.latent_dim, 3)

        quant = {}
        for i in range(c.n_codebooks):
            quant[str(i)] = {
                "in_proj": init_conv1d(next(ks), self.latent_dim,
                                       c.codebook_dim, 1),
                "out_proj": init_conv1d(next(ks), c.codebook_dim,
                                        self.latent_dim, 1),
                "codebook": init_embedding(next(ks), c.codebook_size,
                                           c.codebook_dim),
            }

        dec = {"0": init_conv1d(next(ks), self.latent_dim, c.decoder_dim, 7)}
        idx = 1
        out_dim = c.decoder_dim
        for i, stride in enumerate(c.decoder_rates):
            in_dim = c.decoder_dim // (2 ** i)
            out_dim = c.decoder_dim // (2 ** (i + 1))
            dec[str(idx)] = {"block": {
                "0": init_snake(in_dim),
                "1": init_conv_transpose1d(next(ks), in_dim, out_dim,
                                           2 * stride),
                "2": init_residual_unit(next(ks), out_dim, 1),
                "3": init_residual_unit(next(ks), out_dim, 3),
                "4": init_residual_unit(next(ks), out_dim, 9),
            }}
            idx += 1
        dec[str(idx)] = init_snake(out_dim)
        dec[str(idx + 1)] = init_conv1d(next(ks), out_dim, 1, 7)
        return {"encoder": enc, "quantizer": quant, "decoder": dec}

    # -- pipeline -----------------------------------------------------------

    def preprocess(self, audio: Array) -> Array:
        t = audio.shape[-1]
        pad = math.ceil(t / self.hop_length) * self.hop_length - t
        return jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])

    def encode_latent(self, audio: Array) -> Array:
        c = self.config
        p = self.params["encoder"]
        x = apply_conv1d(p["0"], audio[..., None], padding=3)
        idx = 1
        for stride in c.encoder_rates:
            blk = p[str(idx)]["block"]
            for j, dil in zip(("0", "1", "2"), (1, 3, 9)):
                x = apply_residual_unit(blk[j], x, dil)
            x = apply_snake(blk["3"], x)
            x = apply_conv1d(blk["4"], x, stride=stride,
                             padding=math.ceil(stride / 2))
            idx += 1
        x = apply_snake(p[str(idx)], x)
        return apply_conv1d(p[str(idx + 1)], x, padding=1)

    def encode(self, audio, n_quantizers: Optional[int] = None):
        """-> (z_q (B,T,D), codes (B, n_codebooks, T))."""
        audio = jnp.asarray(audio)
        if audio.ndim == 3:
            audio = audio[:, 0]
        elif audio.ndim == 1:
            audio = audio[None]
        audio = self.preprocess(audio)
        z = self.encode_latent(audio)
        c = self.config
        nq = n_quantizers or c.n_codebooks
        codes = []
        z_q = jnp.zeros_like(z)
        residual = z
        for i in range(nq):
            q = self.params["quantizer"][str(i)]
            z_e = apply_conv1d(q["in_proj"], residual)
            idx = vq_encode(z_e, q["codebook"]["weight"], normalized=True)
            codes.append(idx)
            z_q_i = apply_conv1d(
                q["out_proj"], apply_embedding(q["codebook"], idx))
            z_q = z_q + z_q_i
            residual = residual - z_q_i
        return z_q, jnp.stack(codes, axis=1)

    def from_codes(self, codes: Array) -> Array:
        """codes (B, nq, T) -> latent z_q (B, T, D)."""
        z_q = None
        for i in range(codes.shape[1]):
            q = self.params["quantizer"][str(i)]
            z_q_i = apply_conv1d(
                q["out_proj"], apply_embedding(q["codebook"], codes[:, i]))
            z_q = z_q_i if z_q is None else z_q + z_q_i
        return z_q

    def decode(self, z: Array) -> Array:
        """latent (B, T, D) -> audio (B, samples, 1)."""
        c = self.config
        p = self.params["decoder"]
        x = apply_conv1d(p["0"], z, padding=3)
        idx = 1
        for i, stride in enumerate(c.decoder_rates):
            blk = p[str(idx)]["block"]
            x = apply_snake(blk["0"], x)
            x = apply_conv_transpose1d(blk["1"], x, stride=stride,
                                       padding=math.ceil(stride / 2),
                                       output_padding=stride % 2)
            for j, dil in zip(("2", "3", "4"), (1, 3, 9)):
                x = apply_residual_unit(blk[j], x, dil)
            idx += 1
        x = apply_snake(p[str(idx)], x)
        x = apply_conv1d(p[str(idx + 1)], x, padding=3)
        return jnp.tanh(x)

    def __call__(self, audio) -> Tuple[Array, Array]:
        z_q, codes = self.encode(audio)
        return self.decode(z_q), codes

    def _remap_hf(self, weights):
        """HF-transformers `DacModel` keys (descript/dac_* hub repos) ->
        the native descript Sequential-index names this tree uses; layout
        conversion happens in the shared snac sanitize loop."""
        import re

        R_enc = len(self.config.encoder_rates)
        R_dec = len(self.config.decoder_rates)
        out = {}
        for k, w in weights.items():
            m = re.match(
                r"^(encoder|decoder)\.block\.(\d+)\."
                r"(?:res_unit(\d)\.(snake|conv)(\d)|"
                r"(snake1)\.alpha|(conv1|conv_t1)\.(weight|bias))"
                r"(?:\.(alpha|weight|bias))?$", k)
            if m:
                side, i = m.group(1), int(m.group(2))
                stage = f"{side}.{i + 1}.block"
                if m.group(3):  # res_unitR.snakeN/convN
                    r = int(m.group(3)) - 1
                    base = r if side == "encoder" else r + 2
                    kind, n = m.group(4), int(m.group(5))
                    inner = {("snake", 1): "0.alpha", ("conv", 1): "1",
                             ("snake", 2): "2.alpha", ("conv", 2): "3"}[
                                 (kind, n)]
                    leaf = m.group(9)
                    key = f"{stage}.{base}.block.{inner}"
                    out[key if kind == "snake" else f"{key}.{leaf}"] = w
                elif m.group(6):  # stage snake1
                    out[f"{stage}.{3 if side == 'encoder' else 0}.alpha"] = w
                else:  # stage conv1 / conv_t1
                    idx = 4 if side == "encoder" else 1
                    out[f"{stage}.{idx}.{m.group(8)}"] = w
                continue
            m = re.match(r"^(encoder|decoder)\.(conv1|conv2|snake1)\."
                         r"(weight|bias|alpha)$", k)
            if m:
                side, part, leaf = m.groups()
                last = R_enc if side == "encoder" else R_dec
                idx = {"conv1": 0, "snake1": last + 1, "conv2": last + 2}[
                    part]
                out[f"{side}.{idx}.{leaf}"] = w
                continue
            m = re.match(r"^quantizer\.quantizers\.(\d+)\.(.+)$", k)
            if m:
                out[f"quantizer.{m.group(1)}.{m.group(2)}"] = w
                continue
            out[k] = w
        return out

    def sanitize(self, weights):
        from ..snac.snac import SNAC

        if any(k.startswith("quantizer.quantizers.")
               or ".res_unit1." in k for k in weights):
            weights = self._remap_hf(weights)

        return SNAC.sanitize(self, weights)


Model = DAC
