"""MeloTTS English text frontend: normalize -> ARPA G2P -> ids + BERT.

Parity: reference tts/models/melotts/text.py — symbol tables + language /
tone-offset maps (:14-106), number + abbreviation normalization
(:175-283), wordpiece-grouped G2P with CMU-dict priority and even phone
distribution over sub-tokens (:337-421), blank interleaving and sequence
building (:424-519).

g2p_en (and its CMU dict) is optional here: when absent, a compact
rule-based ARPA letter-to-sound fallback keeps the pipeline functional
offline (clearly lower quality than the CMU dict path the reference
requires — install g2p_en for production use).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np

punctuation = ["!", "?", "...", ",", ".", "'", "-"]
pu_symbols = punctuation + ["SP", "UNK"]
pad = "_"

en_symbols = [
    "aa", "ae", "ah", "ao", "aw", "ay", "b", "ch", "d", "dh", "eh", "er",
    "ey", "f", "g", "hh", "ih", "iy", "jh", "k", "l", "m", "n", "ng",
    "ow", "oy", "p", "r", "s", "sh", "t", "th", "uh", "uw", "V", "w",
    "y", "z", "zh",
]

symbols = [pad] + sorted(set(en_symbols)) + pu_symbols
_symbol_to_id = {s: i for i, s in enumerate(symbols)}


def load_symbols_from_config(config_symbols: List[str]) -> None:
    global symbols, _symbol_to_id
    symbols = list(config_symbols)
    _symbol_to_id = {s: i for i, s in enumerate(symbols)}


language_id_map = {"ZH": 0, "JP": 1, "EN": 2, "ZH_MIX_EN": 3, "KR": 4,
                   "ES": 5, "SP": 5, "FR": 6}
language_tone_start_map = {"ZH": 0, "ZH_MIX_EN": 0, "JP": 6, "EN": 7,
                           "KR": 11, "ES": 12, "SP": 12, "FR": 13}


# ------------------------------------------------------- normalization

_ONES = ["", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen",
         "fourteen", "fifteen", "sixteen", "seventeen", "eighteen",
         "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty",
         "seventy", "eighty", "ninety"]


def _number_to_words(n: int) -> str:
    if n == 0:
        return "zero"
    if n < 0:
        return "minus " + _number_to_words(-n)
    parts = []
    if n >= 1000:
        parts.append(_number_to_words(n // 1000) + " thousand")
        n %= 1000
    if n >= 100:
        parts.append(_ONES[n // 100] + " hundred")
        n %= 100
    if n >= 20:
        word = _TENS[n // 10]
        if n % 10:
            word += " " + _ONES[n % 10]
        parts.append(word)
    elif n > 0:
        parts.append(_ONES[n])
    return " ".join(parts)


_ABBREV = [(re.compile(rf"\b{a}\.", re.IGNORECASE), b) for a, b in [
    ("mrs", "missis"), ("mr", "mister"), ("dr", "doctor"),
    ("st", "saint"), ("co", "company"), ("jr", "junior"),
    ("maj", "major"), ("gen", "general"), ("drs", "doctors"),
    ("rev", "reverend"), ("lt", "lieutenant"), ("hon", "honorable"),
    ("sgt", "sergeant"), ("capt", "captain"), ("esq", "esquire"),
    ("ltd", "limited"), ("col", "colonel"), ("ft", "fort")]]


def text_normalize(text: str) -> str:
    text = text.lower()
    for rx, rep in _ABBREV:
        text = rx.sub(rep, text)
    text = re.sub(r"(\d{1,3}(,\d{3})+)",
                  lambda m: m.group(0).replace(",", ""), text)
    text = re.sub(
        r"(\d+\.\d+)",
        lambda m: (_number_to_words(int(m.group(0).split(".")[0]))
                   + " point " + " ".join(
                       _ONES[int(d)] if int(d) else "zero"
                       for d in m.group(0).split(".")[1])), text)
    text = re.sub(r"\d+", lambda m: _number_to_words(int(m.group(0))),
                  text)
    return text


# -------------------------------------------------------------- G2P

def _refine_ph(phn: str) -> Tuple[str, int]:
    if phn and phn[-1].isdigit():
        return phn[:-1].lower(), int(phn[-1]) + 1
    return phn.lower(), 0


def _post_replace_ph(ph: str) -> str:
    if ph == "v":
        return "V"
    if ph in _symbol_to_id or ph in punctuation:
        return ph
    return "UNK"


# Minimal rule-based ARPA fallback (used only without g2p_en): digraphs
# first, then single letters. Stress always 1 for the first vowel.
_DIGRAPHS = [("tion", ["SH", "AH0", "N"]), ("ough", ["AO1"]),
             ("ight", ["AY1", "T"]), ("th", ["TH"]), ("sh", ["SH"]),
             ("ch", ["CH"]), ("ph", ["F"]), ("wh", ["W"]),
             ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
             ("ee", ["IY1"]), ("oo", ["UW1"]), ("ou", ["AW1"]),
             ("ai", ["EY1"]), ("ay", ["EY1"]), ("oa", ["OW1"]),
             ("ea", ["IY1"]), ("oi", ["OY1"]), ("oy", ["OY1"]),
             ("ar", ["AA1", "R"]), ("er", ["ER0"]), ("or", ["AO1", "R"])]
_LETTER = {"a": ["AE1"], "b": ["B"], "c": ["K"], "d": ["D"],
           "e": ["EH1"], "f": ["F"], "g": ["G"], "h": ["HH"],
           "i": ["IH1"], "j": ["JH"], "k": ["K"], "l": ["L"],
           "m": ["M"], "n": ["N"], "o": ["AA1"], "p": ["P"],
           "q": ["K"], "r": ["R"], "s": ["S"], "t": ["T"],
           "u": ["AH1"], "v": ["V"], "w": ["W"], "x": ["K", "S"],
           "y": ["Y"], "z": ["Z"]}


def _fallback_word_to_arpa(word: str) -> List[str]:
    out: List[str] = []
    i = 0
    w = word.lower()
    while i < len(w):
        for dig, phs in _DIGRAPHS:
            if w.startswith(dig, i):
                out.extend(phs)
                i += len(dig)
                break
        else:
            out.extend(_LETTER.get(w[i], []))
            i += 1
    # silent trailing e heuristic
    if w.endswith("e") and len(w) > 2 and out and out[-1] == "EH1":
        out = out[:-1]
    return out or ["AH0"]


_g2p_instance = None


def _get_g2p():
    global _g2p_instance
    if _g2p_instance is None:
        try:
            from g2p_en import G2p
            _g2p_instance = G2p()
        except ImportError:
            _g2p_instance = False
    return _g2p_instance or None


def _word_tokens(text: str) -> List[str]:
    """Whitespace+punct tokenization (used when no BERT tokenizer)."""
    return [t for t in re.findall(r"[a-z']+|[!?,.-]|\.\.\.", text) if t]


def g2p(text: str, pad_start_end: bool = True,
        tokenizer=None) -> Tuple[List[str], List[int], List[int]]:
    g2p_fn = _get_g2p()
    if tokenizer is not None:
        tokenized = tokenizer.tokenize(text)
        groups: List[List[str]] = []
        for t in tokenized:
            if t.startswith("##") and groups:
                groups[-1].append(t[2:])
            else:
                groups.append([t])
    else:
        groups = [[w] for w in _word_tokens(text)]

    phones: List[str] = []
    tones: List[int] = []
    word2ph: List[int] = []
    for group in groups:
        word = "".join(group)
        if word in punctuation or word in (".", "!", "?", ",", "-"):
            phones.append(word)
            tones.append(0)
            word2ph += _distribute_phone(1, len(group))
            continue
        if g2p_fn is not None:
            arpa_list = [p for p in g2p_fn(word) if p.strip()]
        else:
            arpa_list = _fallback_word_to_arpa(word)
        n = 0
        for ph in arpa_list:
            p, t = _refine_ph(ph)
            phones.append(p)
            tones.append(t)
            n += 1
        word2ph += _distribute_phone(n, len(group))

    phones = [_post_replace_ph(p) for p in phones]
    if pad_start_end:
        phones = ["_"] + phones + ["_"]
        tones = [0] + tones + [0]
        word2ph = [1] + word2ph + [1]
    return phones, tones, word2ph


def _distribute_phone(n_phone: int, n_word: int) -> List[int]:
    per = [0] * n_word
    for _ in range(n_phone):
        per[per.index(min(per))] += 1
    return per


def cleaned_text_to_sequence(phones: List[str], tones: List[int],
                             language: str = "EN"
                             ) -> Tuple[List[int], List[int], List[int]]:
    ids = [_symbol_to_id.get(p, _symbol_to_id.get("UNK", 0))
           for p in phones]
    start = language_tone_start_map[language]
    tone_ids = [t + start for t in tones]
    lang_ids = [language_id_map[language]] * len(ids)
    return ids, tone_ids, lang_ids


def process_text(text: str, bert_features_fn=None, language: str = "EN",
                 add_blank: bool = True, tokenizer=None) -> dict:
    norm = text_normalize(text)
    phones, tones, word2ph = g2p(norm, tokenizer=tokenizer)
    if add_blank:
        ip, it = [pad], [0]
        for p, t in zip(phones, tones):
            ip.extend([p, pad])
            it.extend([t, 0])
        phones, tones = ip, it
    ids, tone_ids, lang_ids = cleaned_text_to_sequence(phones, tones,
                                                       language)
    n = len(ids)
    if bert_features_fn is not None:
        bert = np.asarray(bert_features_fn(norm, word2ph, add_blank))
        if bert.shape[1] < n:
            bert = np.pad(bert, ((0, 0), (0, n - bert.shape[1])))
        bert = bert[:, :n]
    else:
        bert = np.zeros((768, n), np.float32)
    return {"phone_ids": ids, "tone_ids": tone_ids, "lang_ids": lang_ids,
            "bert_features": bert, "phones": phones, "norm_text": norm}
