"""IndexTTS text normalization (host-side, pure Python).

Parity: /root/reference/mlx_audio/tts/models/indextts/normalize.py —
language routing (Chinese vs English), pinyin/name placeholder protection,
English number/currency verbalization, punctuation folding, and CJK
char-level spacing for the sentencepiece tokenizer.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

_PUNCT_MAP = {
    "：": ",", "；": ",", ";": ",", "，": ",", "。": ".", "！": "!",
    "？": "?", "\n": " ", "·": "-", "、": ",", "...": "…", ",,,": "…",
    "，，，": "…", "……": "…", "“": "'", "”": "'", '"': "'", "'": "'",
    "（": "'", "）": "'", "(": "'", ")": "'", "《": "'", "》": "'",
    "【": "'", "】": "'", "[": "'", "]": "'", "—": "-", "～": "-",
    "~": "-", "「": "'", "」": "'", ":": ",",
}
_PUNCT_MAP_ZH = dict(_PUNCT_MAP, **{"$": "."})

PINYIN_RE = re.compile(
    r"(?<![a-z])((?:[bpmfdtnlgkhjqxzcsryw]|[zcs]h)?"
    r"(?:[aeiouüv]|[ae]i|u[aio]|ao|ou|i[aue]|[uüv]e|[uvü]ang?|uai|"
    r"[aeiuv]n|[aeio]ng|ia[no]|i[ao]ng)|ng|er)([1-5])",
    re.IGNORECASE)
_NAME_RE = re.compile(r"[一-鿿]+(?:[-·—][一-鿿]+){1,2}")
_CONTRACTION_RE = re.compile(
    r"(what|where|who|which|how|t?here|it|s?he|that|this)'s", re.IGNORECASE)
_EMAIL_RE = re.compile(r"^[a-zA-Z0-9]+@[a-zA-Z0-9]+\.[a-zA-Z]+$")
_CJK_SPLIT_RE = re.compile(
    "([\u1100-\u11ff\u2e80-\ua4cf\ua840-\uD7AF\uF900-\uFAFF"
    "\uFE30-\uFE4F\uFF65-\uFFDC\U00020000-\U0002FFFF])")

_ONES = ["", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine"]
_TEENS = ["ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
          "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_GROUPS = ["", "thousand", "million", "billion", "trillion"]


def use_chinese(text: str) -> bool:
    if re.search(r"[一-鿿]", text):
        return True
    if not re.search(r"[a-zA-Z]", text):
        return True
    if _EMAIL_RE.match(text):
        return True
    return bool(PINYIN_RE.search(text))


def _fold_punct(text: str, table: Dict[str, str]) -> str:
    pat = re.compile("|".join(re.escape(k) for k in table))
    return pat.sub(lambda m: table[m.group()], text)


def _expand_contractions(text: str) -> str:
    return _CONTRACTION_RE.sub(r"\1 is", text)


def number_to_words(n: int) -> str:
    if n == 0:
        return "zero"

    def under_1000(num: int) -> str:
        if num == 0:
            return ""
        if num < 10:
            return _ONES[num]
        if num < 20:
            return _TEENS[num - 10]
        if num < 100:
            rem = " " + _ONES[num % 10] if num % 10 else ""
            return _TENS[num // 10] + rem
        rem = " " + under_1000(num % 100) if num % 100 else ""
        return _ONES[num // 100] + " hundred" + rem

    parts: List[str] = []
    gi = 0
    while n > 0:
        g = n % 1000
        if g:
            word = under_1000(g)
            if _GROUPS[gi]:
                word += " " + _GROUPS[gi]
            parts.append(word)
        n //= 1000
        gi += 1
    return " ".join(reversed(parts))


def correct_pinyin(py: str) -> str:
    """jqx + u/ü -> v spelling, uppercased (ref normalize.py:88)."""
    if py[0] not in "jqxJQX":
        return py
    return re.sub(r"([jqx])[uü](n|e|an)*(\d)", r"\g<1>v\g<2>\g<3>", py,
                  flags=re.IGNORECASE).upper()


def _protect(text: str, pattern: re.Pattern, prefix: str
             ) -> Tuple[str, Dict[str, str]]:
    found = list(dict.fromkeys("".join(m) if isinstance(m, tuple) else m
                               for m in pattern.findall(text)))
    table = {item: f"<{prefix}_{chr(ord('a') + i)}>"
             for i, item in enumerate(found)}
    for item, ph in table.items():
        text = text.replace(item, ph)
    return text, table


def _restore(text: str, table: Dict[str, str], fn=None) -> str:
    for item, ph in table.items():
        text = text.replace(ph, fn(item) if fn else item)
    return text


def normalize_chinese(text: str) -> str:
    text = _expand_contractions(text.rstrip())
    text, pinyin_tbl = _protect(text, PINYIN_RE, "pinyin")
    text, name_tbl = _protect(text, _NAME_RE, "n")
    text = _restore(text, name_tbl)
    text = _restore(text, pinyin_tbl, correct_pinyin)
    return _fold_punct(text, _PUNCT_MAP_ZH)


def normalize_english(text: str) -> str:
    text = _expand_contractions(text)

    def digits_of(s: str) -> str:
        return "".join(c for c in s if c.isdigit())

    def currency(m: re.Match) -> str:
        digs = digits_of(m.group(0))
        if not digs:
            return m.group(0)
        n = int(digs)
        return f"{number_to_words(n)} dollar{'s' if n != 1 else ''} "

    text = re.sub(r"\$\s*[0-9,.\s]+", currency, text).rstrip()

    def spaced_digits(m: re.Match) -> str:
        parts = m.group(0).split()
        if all(len(p) == 1 and p.isdigit() for p in parts):
            return " ".join(number_to_words(int(p)) for p in parts)
        return number_to_words(int(digits_of(m.group(0))))

    text = re.sub(r"\b\d(\s+\d)+\b", spaced_digits, text)
    text = re.sub(r"\b\d+(?:,\d+)*\b",
                  lambda m: number_to_words(int(digits_of(m.group(0))))
                  if digits_of(m.group(0)) else m.group(0), text)
    text = re.sub(r"\s+", " ", text).strip()
    return _fold_punct(text, _PUNCT_MAP)


def normalize(text: str) -> str:
    return normalize_chinese(text) if use_chinese(text) else \
        normalize_english(text)


def tokenize_by_CJK_char(line: str, do_upper_case: bool = True) -> str:
    """Space-separate CJK chars; uppercase latin words (ref :268-294)."""
    parts = _CJK_SPLIT_RE.split(line.strip())
    out = [p.strip().upper() if do_upper_case else p.strip()
           for p in parts if p.strip()]
    return " ".join(out)
