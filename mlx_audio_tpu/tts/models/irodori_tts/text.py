"""Irodori-TTS Japanese text normalization + tokenization (host-side).

Parity: /root/reference/mlx_audio/tts/models/irodori_tts/text.py —
fullwidth->halfwidth alnum, halfwidth->fullwidth katakana, noise-char
strip, bracket unwrap, manual BOS + right-pad to max_length.
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np

_REPLACE_MAP = {
    r"\t": "",
    r"\[n\]": "",
    " ": "",
    "　": "",
    r"[;▼♀♂《》≪≫①②③④⑤⑥]": "",
    "[˗‐-―⁃−⎯⏤─━"
    "⸺⸻]": "",
    "[～〜]": "ー",
    "？": "?",
    "！": "!",
    "[●◯〇]": "○",
    "♥": "♡",
}

_FW_ALPHA = str.maketrans({
    chr(full): chr(half)
    for full, half in zip(list(range(0xFF21, 0xFF3B))
                          + list(range(0xFF41, 0xFF5B)),
                          list(range(0x41, 0x5B))
                          + list(range(0x61, 0x7B)))})
_FW_DIGITS = str.maketrans({
    chr(full): chr(half)
    for full, half in zip(range(0xFF10, 0xFF1A), range(0x30, 0x3A))})
_HW_KANA = "ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝ"
_FW_KANA = "ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテトナニヌネノ" \
    "ハヒフヘホマミムメモヤユヨラリルレロワン"
_HW_TO_FW_KANA = str.maketrans(_HW_KANA, _FW_KANA)


def normalize_text(text: str) -> str:
    for pattern, repl in _REPLACE_MAP.items():
        text = re.sub(pattern, repl, text)
    text = text.translate(_FW_ALPHA)
    text = text.translate(_FW_DIGITS)
    text = text.translate(_HW_TO_FW_KANA)
    text = re.sub(r"…{3,}", "……", text)
    for ob, cb in (("「", "」"), ("『", "』"), ("（", "）"), ("【", "】"),
                   ("(", ")")):
        if text.startswith(ob) and text.endswith(cb):
            text = text[1:-1]
    if text.endswith(("。", "、")):
        text = text.rstrip("。、")
    return text


def encode_text(text: str, tokenizer, max_length: int,
                add_bos: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """-> (input_ids (1, max_length) int32, mask (1, max_length) bool)."""
    tokenizer.padding_side = "right"
    if getattr(tokenizer, "pad_token_id", None) is None:
        if getattr(tokenizer, "eos_token_id", None) is not None:
            tokenizer.pad_token = tokenizer.eos_token
        else:
            raise ValueError("Tokenizer has no pad_token_id")
    ids = list(tokenizer.encode(text, add_special_tokens=False))
    if add_bos:
        if getattr(tokenizer, "bos_token_id", None) is None:
            raise ValueError("Tokenizer has no bos_token_id but "
                             "add_bos=True")
        ids.insert(0, int(tokenizer.bos_token_id))
    ids = ids[:max_length]
    n = len(ids)
    padded = ids + [int(tokenizer.pad_token_id)] * (max_length - n)
    mask = np.zeros((1, max_length), bool)
    mask[0, :n] = True
    return np.asarray([padded], np.int32), mask
