"""Dia configs (reference tts/models/dia/config.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from ....base import BaseModelArgs


@dataclass
class DataConfig(BaseModelArgs):
    text_length: int = 1024
    audio_length: int = 3072
    channels: int = 9
    text_pad_value: int = 0
    audio_eos_value: int = 1024
    audio_pad_value: int = 1025
    audio_bos_value: int = 1026
    delay_pattern: List[int] = field(
        default_factory=lambda: [0, 8, 9, 10, 11, 12, 13, 14, 15])

    def __post_init__(self):
        self.text_length = (self.text_length + 127) // 128 * 128
        self.audio_length = (self.audio_length + 127) // 128 * 128


@dataclass
class EncoderConfig(BaseModelArgs):
    n_layer: int = 12
    n_embd: int = 1024
    n_hidden: int = 4096
    n_head: int = 16
    head_dim: int = 128


@dataclass
class DecoderConfig(BaseModelArgs):
    n_layer: int = 18
    n_embd: int = 2048
    n_hidden: int = 8192
    gqa_query_heads: int = 16
    kv_heads: int = 4
    gqa_head_dim: int = 128
    cross_query_heads: int = 16
    cross_head_dim: int = 128
    # The original nari-labs modeling applies RoPE inside cross-attention
    # (reference layers.py:317,678); the HF transformers DiaCrossAttention
    # does not.  HF-layout checkpoints (Dia-1.6B-0626) are published against
    # the transformers semantics, so the HF config path sets this False.
    cross_rope: bool = True


@dataclass
class ModelConfig(BaseModelArgs):
    encoder: Optional[EncoderConfig] = None
    decoder: Optional[DecoderConfig] = None
    src_vocab_size: int = 128
    tgt_vocab_size: int = 1028
    dropout: float = 0.0
    normalization_layer_epsilon: float = 1e-5
    weight_dtype: str = "float32"
    rope_min_timescale: int = 1
    rope_max_timescale: int = 10000
    sample_rate: int = 44100

    def __post_init__(self):
        if isinstance(self.encoder, dict):
            self.encoder = EncoderConfig.from_dict(self.encoder)
        if self.encoder is None:
            self.encoder = EncoderConfig()
        if isinstance(self.decoder, dict):
            self.decoder = DecoderConfig.from_dict(self.decoder)
        if self.decoder is None:
            self.decoder = DecoderConfig()


@dataclass
class DiaConfig(BaseModelArgs):
    model_type: str = "dia"
    model: Optional[ModelConfig] = None
    data: Optional[DataConfig] = None

    def __post_init__(self):
        if isinstance(self.model, dict):
            self.model = ModelConfig.from_dict(self.model)
        if self.model is None:
            self.model = ModelConfig()
        if isinstance(self.data, dict):
            self.data = DataConfig.from_dict(self.data)
        if self.data is None:
            self.data = DataConfig()

    @classmethod
    def from_dict(cls, config: dict):
        """Accept both the original nari-labs nested schema and the HF
        transformers `DiaConfig` schema (nari-labs/Dia-1.6B-0626:
        encoder_config/decoder_config with hidden_size etc.)."""
        if isinstance(config, dict) and isinstance(
                config.get("encoder_config"), dict) and \
                "hidden_size" in config["encoder_config"]:
            enc, dec = config["encoder_config"], config["decoder_config"]
            return cls(
                model=ModelConfig(
                    encoder=EncoderConfig(
                        n_layer=enc.get("num_hidden_layers", 12),
                        n_embd=enc.get("hidden_size", 1024),
                        n_hidden=enc.get("intermediate_size", 4096),
                        n_head=enc.get("num_attention_heads", 16),
                        head_dim=enc.get("head_dim", 128)),
                    decoder=DecoderConfig(
                        n_layer=dec.get("num_hidden_layers", 18),
                        n_embd=dec.get("hidden_size", 2048),
                        n_hidden=dec.get("intermediate_size", 8192),
                        gqa_query_heads=dec.get("num_attention_heads", 16),
                        kv_heads=dec.get("num_key_value_heads", 4),
                        gqa_head_dim=dec.get("head_dim", 128),
                        cross_query_heads=dec.get(
                            "cross_num_attention_heads", 16),
                        cross_head_dim=dec.get("cross_head_dim", 128),
                        cross_rope=False),
                    src_vocab_size=enc.get("vocab_size", 128),
                    tgt_vocab_size=dec.get("vocab_size", 1028),
                    rope_max_timescale=dec.get("rope_theta", 10000)),
                data=DataConfig(
                    channels=dec.get("num_channels", 9),
                    text_length=enc.get("max_position_embeddings", 1024),
                    audio_length=dec.get("max_position_embeddings", 3072),
                    delay_pattern=list(config.get(
                        "delay_pattern",
                        [0, 8, 9, 10, 11, 12, 13, 14, 15]))))
        return super().from_dict(config)
