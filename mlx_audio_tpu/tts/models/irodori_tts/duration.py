"""Duration-predictor aux features (host-side numpy).

Parity: /root/reference/mlx_audio/tts/models/irodori_tts/duration.py —
14 normalized script/punctuation statistics per text.
"""

from __future__ import annotations

import math
import re
from typing import Sequence

import numpy as np

ALLOWED_ANNOTATION_EMOJIS = (
    "⏩", "⏱️", "⏸️", "🌬️", "🍭", "🎛️", "🎭", "🎵", "🐢", "🐱", "👂", "👃",
    "👅", "👌", "👏", "💋", "💥", "💦", "💪", "📄", "📞", "📢", "📣", "😆",
    "😊", "😌", "😎", "😏", "😒", "😖", "😟", "😠", "😪", "😭", "😮",
    "😮‍💨", "😰", "😱", "😲", "😴", "🙄", "🙏", "🤐", "🤔", "🤢",
    "🤧", "🤭", "🥤", "🥱", "🥴", "🥵", "🥹", "🥺", "🫣", "🫶", "📖",
)
_EMOJI_RE = re.compile("|".join(sorted(
    (re.escape(x) for x in ALLOWED_ANNOTATION_EMOJIS),
    key=len, reverse=True)))


def _log1p_cap(count, cap) -> float:
    v = min(max(float(count), 0.0), float(cap))
    return math.log1p(v) / math.log1p(float(cap))


def _is_kana(ch: str) -> bool:
    c = ord(ch)
    return 0x3040 <= c <= 0x309F or 0x30A0 <= c <= 0x30FF


def _is_kanji(ch: str) -> bool:
    c = ord(ch)
    return (0x3400 <= c <= 0x4DBF or 0x4E00 <= c <= 0x9FFF
            or 0xF900 <= c <= 0xFAFF or 0x20000 <= c <= 0x2FA1F)


def count_annotation_emojis(text: str) -> int:
    return len(_EMOJI_RE.findall(text))


def build_duration_features(texts: Sequence[str], *,
                            token_counts: Sequence[int],
                            max_text_len: int,
                            has_speaker: Sequence[bool]) -> np.ndarray:
    rows = []
    for text, tc, spk in zip(texts, token_counts, has_speaker):
        n = max(len(text), 1)
        kana = sum(1 for ch in text if _is_kana(ch))
        kanji = sum(1 for ch in text if _is_kanji(ch))
        alnum = sum(1 for ch in text if ch.isascii() and ch.isalnum())
        rows.append([
            min(max(float(tc), 0.0), float(max_text_len))
            / float(max_text_len),
            _log1p_cap(float(n), 512.0),
            float(tc) / float(n),
            _log1p_cap(text.count("。") + text.count("."), 8),
            _log1p_cap(text.count("、") + text.count(","), 16),
            _log1p_cap(text.count("ー"), 8),
            _log1p_cap(text.count("…"), 8),
            _log1p_cap(text.count("！") + text.count("!"), 8),
            _log1p_cap(text.count("？") + text.count("?"), 8),
            _log1p_cap(count_annotation_emojis(text), 8),
            float(kana) / float(n),
            float(kanji) / float(n),
            float(alnum) / float(n),
            1.0 if spk else 0.0,
        ])
    return np.asarray(rows, np.float32)
