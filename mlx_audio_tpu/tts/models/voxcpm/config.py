"""VoxCPM config (parity: reference tts/models/voxcpm/config.py)."""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

from ....base import BaseModelArgs
from .minicpm import LMConfig
from .vae import AudioVAEConfig


@dataclass
class EncoderConfig(BaseModelArgs):
    hidden_dim: int = 1024
    ffn_dim: int = 4096
    num_heads: int = 16
    num_layers: int = 8
    kv_channels: Optional[int] = None


@dataclass
class CFMConfig(BaseModelArgs):
    sigma_min: float = 1e-6
    solver: str = "euler"
    t_scheduler: str = "log-norm"
    inference_cfg_rate: float = 2.0


@dataclass
class DiTConfig(BaseModelArgs):
    hidden_dim: int = 1024
    ffn_dim: int = 4096
    num_heads: int = 16
    num_layers: int = 8
    kv_channels: Optional[int] = None
    dit_mean_mode: bool = False
    cfm_config: CFMConfig = field(default_factory=CFMConfig)

    def __post_init__(self):
        if isinstance(self.cfm_config, dict):
            self.cfm_config = CFMConfig.from_dict(self.cfm_config)


@dataclass
class ModelArgs(BaseModelArgs):
    model_type: str = "voxcpm"
    lm_config: LMConfig = field(default_factory=LMConfig)
    encoder_config: EncoderConfig = field(default_factory=EncoderConfig)
    dit_config: DiTConfig = field(default_factory=DiTConfig)
    audio_vae_config: AudioVAEConfig = field(default_factory=AudioVAEConfig)
    patch_size: int = 4
    feat_dim: int = 64
    scalar_quantization_latent_dim: int = 256
    scalar_quantization_scale: int = 9
    residual_lm_num_layers: int = 8
    residual_lm_no_rope: bool = False
    max_length: int = 8192
    model_path: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.lm_config, dict):
            lm = dict(self.lm_config)
            rs = lm.pop("rope_scaling", None)
            if isinstance(rs, dict):
                lm["rope_scaling_type"] = rs.get("type", "longrope")
                lm["rope_long_factor"] = rs.get("long_factor", [])
                lm["rope_short_factor"] = rs.get("short_factor", [])
                lm["original_max_position_embeddings"] = rs.get(
                    "original_max_position_embeddings", 32768)
            self.lm_config = LMConfig.from_dict(lm)
        if isinstance(self.encoder_config, dict):
            self.encoder_config = EncoderConfig.from_dict(
                self.encoder_config)
        if isinstance(self.dit_config, dict):
            self.dit_config = DiTConfig.from_dict(self.dit_config)
        if isinstance(self.audio_vae_config, dict):
            self.audio_vae_config = AudioVAEConfig.from_dict(
                self.audio_vae_config)

    def enc_lm_config(self) -> LMConfig:
        return replace(
            self.lm_config, hidden_size=self.encoder_config.hidden_dim,
            intermediate_size=self.encoder_config.ffn_dim,
            num_attention_heads=self.encoder_config.num_heads,
            num_hidden_layers=self.encoder_config.num_layers,
            kv_channels=self.encoder_config.kv_channels, vocab_size=0)

    def dit_lm_config(self) -> LMConfig:
        return replace(
            self.lm_config, hidden_size=self.dit_config.hidden_dim,
            intermediate_size=self.dit_config.ffn_dim,
            num_attention_heads=self.dit_config.num_heads,
            num_hidden_layers=self.dit_config.num_layers,
            kv_channels=self.dit_config.kv_channels, vocab_size=0)

    def res_lm_config(self) -> LMConfig:
        return replace(self.lm_config,
                       num_hidden_layers=self.residual_lm_num_layers,
                       vocab_size=0, no_rope=self.residual_lm_no_rope)


__all__ = ["ModelArgs", "EncoderConfig", "DiTConfig", "CFMConfig",
           "LMConfig", "AudioVAEConfig"]
