"""Spark-TTS configuration.

Parity: /root/reference/mlx_audio/tts/models/spark/spark.py:28-52 (Qwen2 LM
config) and the BiCodec sub-configs consumed by bicodec.py:91-136
(encoder/quantizer/prenet/postnet/decoder/speaker_encoder sections of the
checkpoint's config.yaml).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

from ....base import BaseModelArgs
from ..llama import ModelConfig as LlamaConfig


@dataclass
class MelParams(BaseModelArgs):
    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int = 640
    hop_length: int = 320
    num_mels: int = 128
    mel_fmin: float = 10.0
    mel_fmax: Optional[float] = None


@dataclass
class EncoderConfig(BaseModelArgs):
    """Feat encoder (wav2vec2 features -> semantic latents).

    Ref: spark/modules/encoder_decoder/feat_encoder.py:26-76.
    """
    input_channels: int = 1024
    vocos_dim: int = 384
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 12
    out_channels: int = 1024
    sample_ratios: Tuple[int, ...] = (1, 1)


@dataclass
class QuantizerConfig(BaseModelArgs):
    """Factorized VQ. Ref: spark/modules/residual.py:17-54."""
    input_dim: int = 1024
    codebook_size: int = 8192
    codebook_dim: int = 8
    commitment: float = 0.25


@dataclass
class FeatDecoderConfig(BaseModelArgs):
    """Vocos-style decoder used for prenet/postnet.

    Ref: spark/modules/encoder_decoder/feat_decoder.py:27-76.
    """
    input_channels: int = 1024
    vocos_dim: int = 384
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 12
    out_channels: int = 1024
    condition_dim: Optional[int] = None
    sample_ratios: Tuple[int, ...] = (1, 1)
    use_tanh_at_final: bool = False


@dataclass
class WaveGeneratorConfig(BaseModelArgs):
    """DAC-style wave generator. Ref: wave_generator.py:39-66."""
    input_channel: int = 1024
    channels: int = 1536
    rates: Tuple[int, ...] = (8, 5, 4, 2)
    kernel_sizes: Tuple[int, ...] = (16, 11, 8, 4)
    d_out: int = 1


@dataclass
class SpeakerEncoderConfig(BaseModelArgs):
    """x-vector + d-vector speaker encoder.

    Ref: spark/modules/speaker/speaker_encoder.py:35-62.
    """
    input_dim: int = 128
    out_dim: int = 1024
    latent_dim: int = 128
    token_num: int = 32
    fsq_levels: Tuple[int, ...] = (4, 4, 4, 4, 4, 4)
    fsq_num_quantizers: int = 1
    # ECAPA width (512 for the shipped ECAPA_TDNN_GLOB_c512)
    ecapa_channels: int = 512


@dataclass
class BiCodecConfig(BaseModelArgs):
    mel_params: MelParams = field(default_factory=MelParams)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    quantizer: QuantizerConfig = field(default_factory=QuantizerConfig)
    prenet: FeatDecoderConfig = field(default_factory=FeatDecoderConfig)
    postnet: FeatDecoderConfig = field(default_factory=FeatDecoderConfig)
    decoder: WaveGeneratorConfig = field(
        default_factory=WaveGeneratorConfig)
    speaker_encoder: SpeakerEncoderConfig = field(
        default_factory=SpeakerEncoderConfig)
    # audio_tokenizer_config.yaml fields (ref audio_tokenizer.py:40-53)
    sample_rate: int = 16000
    ref_segment_duration: float = 6.0
    latent_hop_length: int = 320
    volume_normalize: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "BiCodecConfig":
        d = dict(d)
        for k, sub in (("mel_params", MelParams),
                       ("encoder", EncoderConfig),
                       ("quantizer", QuantizerConfig),
                       ("prenet", FeatDecoderConfig),
                       ("postnet", FeatDecoderConfig),
                       ("decoder", WaveGeneratorConfig),
                       ("speaker_encoder", SpeakerEncoderConfig)):
            if isinstance(d.get(k), dict):
                d[k] = sub.from_dict(d[k])
        return super(BiCodecConfig, cls).from_dict(d)


@dataclass
class ModelConfig(LlamaConfig):
    """Qwen2-0.5B token LM. Ref: spark.py:28-52."""
    model_type: str = "spark"
    sample_rate: int = 16000
    bos_token_id: int = 151643
    eos_token_id: int = 151645
    hidden_size: int = 896
    num_hidden_layers: int = 24
    intermediate_size: int = 4864
    num_attention_heads: int = 14
    num_key_value_heads: int = 2
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    vocab_size: int = 166000
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = True
    attention_bias: bool = True


__all__ = [
    "MelParams", "EncoderConfig", "QuantizerConfig", "FeatDecoderConfig",
    "WaveGeneratorConfig", "SpeakerEncoderConfig", "BiCodecConfig",
    "ModelConfig",
]
