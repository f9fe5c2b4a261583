"""ZONOS2 prompt construction (host-side numpy).

Parity: /root/reference/mlx_audio/tts/models/zonos2/prompt.py — byte-level
text ids offset past 192 legacy symbols, conditioning marker tokens
(speaking-rate / quality / speaker-background / accurate-mode) packed at
the top of the text vocab, a fixed sheared 0.2 s silence-code prefix, and
the shear/shear_up delay-pattern transforms.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence

import numpy as np

PAD_ID, UNK_ID, BOS_ID, EOS_ID = 0, 1, 2, 3
LEGACY_SYMBOL_VOCAB_SIZE = 192
BYTE_VOCAB_SIZE = 256
BYTE_TEXT_VOCAB_SIZE = LEGACY_SYMBOL_VOCAB_SIZE + BYTE_VOCAB_SIZE

# DAC codes of ~0.2s of silence (checkpoint constant, ref prompt.py:14)
_SILENCE_TOKENS_0_2S = np.asarray(
    [[568, 778, 338, 524, 967, 360, 728, 550, 90]]
    + [[568, 778, 10, 674, 364, 981, 741, 378, 731]]
    + [[568, 804, 10, 674, 364, 981, 568, 378, 731]] * 14
    + [[568, 778, 721, 842, 264, 974, 989, 507, 308]], np.int32)


@dataclass(frozen=True)
class TTSPromptConfig:
    n_codebooks: int = 9
    audio_pad_id: int = 1025
    text_vocab: int = 519
    speaking_rate_num_buckets: int = 8
    quality_bucket_counts: tuple = (12, 12, 12, 8, 8, 8)
    speaker_background_num_buckets: int = 2
    accurate_mode_num_buckets: int = 1
    prepend_silence: bool = True


def text_to_byte_ids(text: str) -> List[int]:
    return [BOS_ID,
            *(b + LEGACY_SYMBOL_VOCAB_SIZE for b in text.encode("utf-8")),
            EOS_ID]


def _base_vocab(cfg: TTSPromptConfig) -> int:
    base = (cfg.text_vocab - cfg.speaking_rate_num_buckets
            - sum(cfg.quality_bucket_counts)
            - cfg.speaker_background_num_buckets
            - cfg.accurate_mode_num_buckets)
    if base < 0:
        raise ValueError("text_vocab too small for conditioning tokens")
    return base


def speaking_rate_token_id(cfg: TTSPromptConfig, bucket: int) -> int:
    if not 0 <= bucket < cfg.speaking_rate_num_buckets:
        raise ValueError("speaking_rate_bucket out of range")
    return _base_vocab(cfg) + bucket


def quality_token_id(cfg: TTSPromptConfig, feature_idx: int,
                     bucket: int) -> int:
    counts = cfg.quality_bucket_counts
    if not 0 <= feature_idx < len(counts):
        raise ValueError("quality feature index out of range")
    if not 0 <= bucket < counts[feature_idx]:
        raise ValueError("quality bucket out of range")
    return _base_vocab(cfg) + cfg.speaking_rate_num_buckets + \
        sum(counts[:feature_idx]) + bucket


def speaker_background_token_id(cfg: TTSPromptConfig, clean: bool) -> int:
    return _base_vocab(cfg) + cfg.speaking_rate_num_buckets + \
        sum(cfg.quality_bucket_counts) + (0 if clean else 1)


def accurate_mode_token_id(cfg: TTSPromptConfig) -> int:
    return _base_vocab(cfg) + cfg.speaking_rate_num_buckets + \
        sum(cfg.quality_bucket_counts) + cfg.speaker_background_num_buckets


def shear(x: np.ndarray, pad: int) -> np.ndarray:
    """Apply the per-codebook delay pattern: column c is shifted down by
    c rows, pad-filled (ref prompt.py:307)."""
    t, c = x.shape
    padded = np.concatenate(
        [np.full((c - 1, c), pad, x.dtype), np.asarray(x)], axis=0)
    rows = (c - 1) + np.arange(t)[:, None] - np.arange(c)[None, :]
    return padded[rows, np.arange(c)[None, :]]


def shear_up(x: np.ndarray, pad: int) -> np.ndarray:
    """Invert the delay pattern (ref prompt.py:320)."""
    x = np.asarray(x)
    h, w = x.shape[-2:]
    rows = np.arange(h)[:, None] + np.arange(w)[None, :]
    valid = rows < h
    gathered = np.take_along_axis(
        x, np.broadcast_to(np.minimum(rows, h - 1), x.shape), axis=-2)
    return np.where(np.broadcast_to(valid, x.shape), gathered, pad)


def make_marker_slot(cfg: TTSPromptConfig, text_token: int) -> List[int]:
    return [cfg.audio_pad_id] * cfg.n_codebooks + [int(text_token)]


class TTSPromptBuilder:
    def __init__(self, config: TTSPromptConfig):
        self.config = config
        if config.prepend_silence:
            sheared = shear(_SILENCE_TOKENS_0_2S[:, :config.n_codebooks],
                            config.audio_pad_id)
            text_col = np.full((sheared.shape[0], 1), config.text_vocab,
                               np.int32)
            self._silence = np.concatenate([sheared, text_col],
                                           axis=1).tolist()
        else:
            self._silence = []

    def build_list(self, text: str, *,
                   speaking_rate_bucket: Optional[int] = None,
                   quality_buckets: Optional[Sequence] = None
                   ) -> List[List[int]]:
        cfg = self.config
        rows: List[List[int]] = []
        if speaking_rate_bucket is not None:
            rows.append(make_marker_slot(
                cfg, speaking_rate_token_id(cfg, speaking_rate_bucket)))
        if quality_buckets is not None:
            for fi, bucket in enumerate(quality_buckets):
                if bucket is None:
                    continue
                rows.append(make_marker_slot(
                    cfg, quality_token_id(cfg, fi, int(bucket))))
        rows.extend(make_marker_slot(cfg, t)
                    for t in text_to_byte_ids(text))
        rows.extend([list(r) for r in self._silence])
        return rows

    def speaker_slot(self) -> List[int]:
        return [self.config.audio_pad_id] * self.config.n_codebooks + \
            [self.config.text_vocab]

    def speaker_marker_prefix(self, *, clean_speaker_background=False,
                              accurate_mode=True) -> List[List[int]]:
        cfg = self.config
        rows = [self.speaker_slot()]
        if cfg.speaker_background_num_buckets > 0:
            rows.append(make_marker_slot(cfg, speaker_background_token_id(
                cfg, clean_speaker_background)))
            if accurate_mode and cfg.accurate_mode_num_buckets > 0:
                rows.append(make_marker_slot(cfg,
                                             accurate_mode_token_id(cfg)))
        return rows
