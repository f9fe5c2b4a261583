"""Speaker-conditioned BigVGAN vocoder for IndexTTS.

Parity: /root/reference/mlx_audio/tts/models/indextts/bigvgan.py
(BigVGANConditioning :19 — GPT latents replace mel at conv_pre; an
ECAPA-TDNN speaker embedding from the reference mel is injected at
conv_pre and optionally at every upsample stage).

Reuses the shared functional BigVGAN (codec/models/bigvgan) for the
AMP resblock/upsample machinery and the shared ECAPA-TDNN backbone.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ....codec.models.bigvgan.bigvgan import BigVGAN, ModelConfig, activation1d
from ....codec.models.ecapa_tdnn.ecapa_tdnn import (
    EcapaTdnnConfig,
    ecapa_backbone,
    init_ecapa_backbone,
)
from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    init_conv1d,
)

Array = jax.Array


@dataclass
class BigVGANConditioningConfig(ModelConfig):
    gpt_dim: int = 1024
    speaker_embedding_dim: int = 512
    cond_d_vector_in_each_upsampling_layer: bool = True

    @property
    def ecapa_config(self) -> EcapaTdnnConfig:
        return EcapaTdnnConfig(
            input_size=self.num_mels, channels=512,
            embed_dim=self.speaker_embedding_dim, global_context=True)


class BigVGANConditioning(BigVGAN):
    def __init__(self, config: BigVGANConditioningConfig = None, **kwargs):
        if config is None:
            config = BigVGANConditioningConfig.from_dict(kwargs) \
                if kwargs else BigVGANConditioningConfig()
        elif isinstance(config, dict):
            config = BigVGANConditioningConfig.from_dict(config)
        super().__init__(config)

    def init_params(self, key):
        c = self.config
        p = super().init_params(key)
        keys = jax.random.split(key, 4 + len(c.upsample_rates))
        # conv_pre consumes GPT latents, not mels
        p["conv_pre"] = init_conv1d(keys[0], c.gpt_dim,
                                    c.upsample_initial_channel, 7)
        p["speaker_encoder"] = init_ecapa_backbone(keys[1], c.ecapa_config)
        p["cond_layer"] = init_conv1d(keys[2], c.speaker_embedding_dim,
                                      c.upsample_initial_channel, 1)
        if c.cond_d_vector_in_each_upsampling_layer:
            p["conds"] = {
                str(i): init_conv1d(
                    keys[3 + i], c.speaker_embedding_dim,
                    c.upsample_initial_channel // (2 ** (i + 1)), 1)
                for i in range(len(c.upsample_rates))}
        return p

    def decode_conditioned(self, p: dict, latents: Array,
                           ref_mel: Array) -> Array:
        """latents (B, T, gpt_dim) + ref log-mel (B, Tm, num_mels)
        -> audio (B, samples, 1)."""
        c = self.config
        num_kernels = len(c.resblock_kernel_sizes)
        spk = ecapa_backbone(p["speaker_encoder"], c.ecapa_config,
                             ref_mel)[:, None, :]  # (B, 1, D)
        x = apply_conv1d(p["conv_pre"], latents, padding=3)
        x = x + apply_conv1d(p["cond_layer"], spk)
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            x = apply_conv_transpose1d(p["ups"][str(i)]["0"], x, stride=u,
                                       padding=(k - u) // 2)
            if c.cond_d_vector_in_each_upsampling_layer:
                x = x + apply_conv1d(p["conds"][str(i)], spk)
            xs = None
            for j in range(num_kernels):
                blk = p["resblocks"][str(i * num_kernels + j)]
                out = self._amp_block(blk, x, c.resblock_kernel_sizes[j],
                                      c.resblock_dilation_sizes[j])
                xs = out if xs is None else xs + out
            x = xs / num_kernels
        x = activation1d(p["activation_post"]["act"], x, c.snake_logscale)
        x = apply_conv1d(p["conv_post"], x, padding=3)
        return jnp.tanh(x) if c.use_tanh_at_final else jnp.clip(x, -1, 1)
