"""MOSS-TTS-Nano config.

Parity: /root/reference/mlx_audio/tts/models/moss_tts_nano/config.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional

from ....base import BaseModelArgs
from .gpt2 import GPT2Config

DEFAULT_AUDIO_TOKENIZER_REPO = "mlx-community/MOSS-Audio-Tokenizer-Nano"


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "moss_tts_nano"
    model_path: Optional[str] = None
    gpt2_config: GPT2Config = field(default_factory=GPT2Config)
    n_vq: int = 16
    audio_vocab_size: int = 1024
    audio_codebook_sizes: List[int] = field(
        default_factory=lambda: [1024] * 16)
    audio_pad_token_id: int = 1024
    pad_token_id: int = 3
    im_start_token_id: int = 4
    im_end_token_id: int = 5
    audio_start_token_id: int = 6
    audio_end_token_id: int = 7
    audio_user_slot_token_id: int = 8
    audio_assistant_slot_token_id: int = 9
    audio_tokenizer_type: str = "moss-audio-tokenizer-nano"
    audio_tokenizer_pretrained_name_or_path: Optional[str] = None
    audio_tokenizer_sample_rate: int = 48000
    local_transformer_layers: int = 1

    def __post_init__(self):
        if isinstance(self.gpt2_config, dict):
            self.gpt2_config = GPT2Config.from_dict(self.gpt2_config)
        if self.audio_codebook_sizes is None:
            self.audio_codebook_sizes = [self.audio_vocab_size] * self.n_vq
        if len(self.audio_codebook_sizes) != self.n_vq:
            raise ValueError(
                "audio_codebook_sizes must have one entry per VQ channel "
                f"(expected {self.n_vq}, got {len(self.audio_codebook_sizes)})")
        if self.audio_tokenizer_pretrained_name_or_path is None:
            self.audio_tokenizer_pretrained_name_or_path = \
                DEFAULT_AUDIO_TOKENIZER_REPO

    def local_gpt2_config(self) -> GPT2Config:
        return replace(
            self.gpt2_config,
            n_positions=self.n_vq + 1,
            n_ctx=self.n_vq + 1,
            n_layer=self.local_transformer_layers,
            pad_token_id=self.pad_token_id,
        )


__all__ = ["ModelConfig", "GPT2Config", "DEFAULT_AUDIO_TOKENIZER_REPO"]
