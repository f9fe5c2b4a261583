"""Dependency-free English text normalizer for ZONOS2 prompts.

Parity: /root/reference/mlx_audio/tts/models/zonos2/textnorm.py — dates
(ISO/slash/month-name), clock times, US phone numbers, money with k/m/bn
quantities, percent, measurement units, fractions, ordinals, decimals,
integers (leading-zero digit spelling), acronym letterization.
"""

from __future__ import annotations

import re

ENGLISH_LANGS = {"en", "en_us", "en_gb"}

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine"]
_TEENS = ["ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
          "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = {2: "twenty", 3: "thirty", 4: "forty", 5: "fifty", 6: "sixty",
         7: "seventy", 8: "eighty", 9: "ninety"}
_SCALES = ((10 ** 12, "trillion"), (10 ** 9, "billion"),
           (10 ** 6, "million"), (10 ** 3, "thousand"))
_ORDINAL_EXC = {"zero": "zeroth", "one": "first", "two": "second",
                "three": "third", "five": "fifth", "eight": "eighth",
                "nine": "ninth", "twelve": "twelfth"}
_MONTHS_BY_NUM = ["", "january", "february", "march", "april", "may",
                  "june", "july", "august", "september", "october",
                  "november", "december"]
_CURRENCIES = {"$": ("dollar", "dollars", "cent", "cents"),
               "€": ("euro", "euros", "cent", "cents"),
               "£": ("pound", "pounds", "penny", "pence")}
_QUANTITIES = {"k": "thousand", "m": "million", "b": "billion",
               "bn": "billion", "thousand": "thousand",
               "million": "million", "billion": "billion",
               "trillion": "trillion"}
_UNITS = {
    "kg": ("kilogram", "kilograms"), "g": ("gram", "grams"),
    "mg": ("milligram", "milligrams"), "km": ("kilometer", "kilometers"),
    "cm": ("centimeter", "centimeters"),
    "mm": ("millimeter", "millimeters"), "m": ("meter", "meters"),
    "mi": ("mile", "miles"), "mph": ("mile per hour", "miles per hour"),
    "lb": ("pound", "pounds"), "lbs": ("pound", "pounds"),
    "ft": ("foot", "feet"), "in": ("inch", "inches"),
    "l": ("liter", "liters"), "ml": ("milliliter", "milliliters"),
    "hz": ("hertz", "hertz"), "khz": ("kilohertz", "kilohertz"),
    "mhz": ("megahertz", "megahertz"), "ghz": ("gigahertz", "gigahertz"),
    "kbps": ("kilobit per second", "kilobits per second"),
    "mbps": ("megabit per second", "megabits per second"),
    "gbps": ("gigabit per second", "gigabits per second"),
    "°c": ("degree celsius", "degrees celsius"),
    "°f": ("degree fahrenheit", "degrees fahrenheit"),
}
_UNIT_PAT = "|".join(re.escape(u)
                     for u in sorted(_UNITS, key=len, reverse=True))
_NUM_PAT = r"-?(?:\d{1,3}(?:,\d{3})+|\d+)(?:\.\d+)?"

_ISO_DATE_RE = re.compile(
    r"\b(?P<year>\d{4})-(?P<month>\d{1,2})-(?P<day>\d{1,2})\b")
_SLASH_DATE_RE = re.compile(
    r"\b(?P<month>\d{1,2})/(?P<day>\d{1,2})/(?P<year>\d{2,4})\b")
_MONTH_DATE_RE = re.compile(
    r"\b(?P<month>jan(?:uary)?|feb(?:ruary)?|mar(?:ch)?|apr(?:il)?|may|"
    r"jun(?:e)?|jul(?:y)?|aug(?:ust)?|sept?(?:ember)?|oct(?:ober)?|"
    r"nov(?:ember)?|dec(?:ember)?)\.?\s+"
    r"(?P<day>\d{1,2})(?:st|nd|rd|th)?(?:,\s*|\s+)?(?P<year>\d{4})?\b",
    re.IGNORECASE)
_TIME_RE = re.compile(
    r"(?<!\w)(?P<hour>[01]?\d|2[0-3]):(?P<minute>[0-5]\d)"
    r"(?::(?P<second>[0-5]\d))?\s*(?P<suffix>[aApP]\.?\s?[mM]\.?)?\b")
_MONEY_RE = re.compile(
    rf"(?<!\w)(?P<symbol>[$€£])\s*(?P<amount>{_NUM_PAT})"
    r"(?:\s*(?P<quantity>k|K|m|M|b|B|bn|BN|thousand|million|billion|"
    r"trillion))?")
_PERCENT_RE = re.compile(rf"(?<!\w)(?P<number>{_NUM_PAT})\s*%")
_UNIT_RE = re.compile(
    rf"(?<!\w)(?P<number>{_NUM_PAT})\s*(?P<unit>{_UNIT_PAT})\b",
    re.IGNORECASE)
_FRACTION_RE = re.compile(
    r"(?<!\w)(?P<numerator>\d+)/(?P<denominator>\d+)(?!\w)")
_ORDINAL_RE = re.compile(
    r"(?<!\w)(?P<number>-?\d{1,3}(?:,\d{3})+|-?\d+)(?:st|nd|rd|th)\b")
_DECIMAL_RE = re.compile(
    r"(?<![\w.])(?P<number>-?(?:\d{1,3}(?:,\d{3})+|\d+)\.\d+)(?![\w.])")
_PHONE_RE = re.compile(
    r"(?<!\w)(?:\+?1[-.\s]?)?(?:(?:\(?\d{3}\)?[-.\s]?)?\d{3}[-.\s]?\d{4})"
    r"(?!\w)")
_INTEGER_RE = re.compile(
    r"(?<![\w.])(?P<number>-?(?:\d{1,3}(?:,\d{3})+|\d+))(?![\w.])")
_ACRONYM_RE = re.compile(r"\b[A-Z]{2,}\b")
_SPACE_RE = re.compile(r"\s+")
_SPACE_PUNCT_RE = re.compile(r"\s+([.!?,;:])")


def _int_words(n: int) -> str:
    if n < 0:
        return "negative " + _int_words(-n)
    if n < 10:
        return _ONES[n]
    if n < 20:
        return _TEENS[n - 10]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] if r == 0 else f"{_TENS[t]} {_ONES[r]}"
    if n < 1000:
        h, r = divmod(n, 100)
        w = f"{_ONES[h]} hundred"
        return w if r == 0 else f"{w} {_int_words(r)}"
    for sv, sn in _SCALES:
        if n >= sv:
            q, r = divmod(n, sv)
            w = f"{_int_words(q)} {sn}"
            return w if r == 0 else f"{w} {_int_words(r)}"
    return str(n)


def _year_words(y: int) -> str:
    if 1000 <= y <= 1999:
        p, r = divmod(y, 100)
        return f"{_int_words(p)} hundred" if r == 0 else \
            f"{_int_words(p)} {_int_words(r)}"
    if 2000 <= y <= 2009:
        r = y - 2000
        return "two thousand" if r == 0 else f"two thousand {_int_words(r)}"
    if 2010 <= y <= 2099:
        return f"twenty {_int_words(y - 2000)}"
    return _int_words(y)


def _digit_words(digits: str) -> str:
    return " ".join(_ONES[int(d)] for d in digits)


def _num_words(s: str) -> str:
    s = s.replace(",", "")
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    prefix = "negative " if neg else ""
    if "." in s:
        i, f = s.split(".", 1)
        return f"{prefix}{_int_words(int(i or '0'))} point {_digit_words(f)}"
    if len(s) > 1 and s.startswith("0"):
        return prefix + _digit_words(s)
    return prefix + _int_words(int(s))


def _ordinal_words(n: int) -> str:
    words = _int_words(n).split()
    last = words[-1]
    if last in _ORDINAL_EXC:
        words[-1] = _ORDINAL_EXC[last]
    elif last.endswith("y"):
        words[-1] = last[:-1] + "ieth"
    else:
        words[-1] = last + "th"
    return " ".join(words)


def _is_one(s: str) -> bool:
    try:
        return float(s.replace(",", "")) == 1.0
    except ValueError:
        return False


def _date_words(month: int, day: int, year=None):
    if not 1 <= month <= 12 or not 1 <= day <= 31:
        return None
    parts = [_MONTHS_BY_NUM[month], _ordinal_words(day)]
    if year:
        y = int(year)
        if y < 100:
            y += 2000 if y < 50 else 1900
        parts.append(_year_words(y))
    return " ".join(parts)


def _sub_date(m: re.Match) -> str:
    out = _date_words(int(m.group("month")), int(m.group("day")),
                      m.group("year"))
    return out or m.group(0)


def _sub_month_date(m: re.Match) -> str:
    name = m.group("month").rstrip(".").lower()
    month = next((i for i, full in enumerate(_MONTHS_BY_NUM)
                  if full.startswith(name[:3]) and i > 0), None)
    if month is None:
        return m.group(0)
    day = int(m.group("day"))
    if not 1 <= day <= 31:
        return m.group(0)
    parts = [_MONTHS_BY_NUM[month], _ordinal_words(day)]
    if m.group("year"):
        parts.append(_year_words(int(m.group("year"))))
    return " ".join(parts)


def _sub_time(m: re.Match) -> str:
    hour, minute = int(m.group("hour")), int(m.group("minute"))
    second, suffix = m.group("second"), m.group("suffix")
    spoken = hour % 12 or 12 if suffix else hour
    parts = [_int_words(spoken)]
    if minute:
        parts.append(f"oh {_int_words(minute)}" if minute < 10
                     else _int_words(minute))
    if second and int(second):
        parts += ["and", _int_words(int(second)), "seconds"]
    if suffix:
        parts += ["a" if suffix.lower().startswith("a") else "p", "m"]
    return " ".join(parts)


def _sub_money(m: re.Match) -> str:
    sym, amount = m.group("symbol"), m.group("amount").replace(",", "")
    quantity = m.group("quantity")
    maj_s, maj_p, min_s, min_p = _CURRENCIES[sym]
    if quantity:
        major = maj_s if _is_one(amount) else maj_p
        return f"{_num_words(amount)} {_QUANTITIES[quantity.lower()]} " \
            f"{major}"
    if "." in amount:
        integer, frac = amount.split(".", 1)
        cents = int((frac + "00")[:2])
    else:
        integer, cents = amount, 0
    dollars = int(integer)
    parts = []
    if dollars:
        parts.append(f"{_int_words(dollars)} "
                     f"{maj_s if dollars == 1 else maj_p}")
    if cents:
        parts.append(f"{_int_words(cents)} "
                     f"{min_s if cents == 1 else min_p}")
    return " and ".join(parts) if parts else f"zero {maj_p}"


def _sub_unit(m: re.Match) -> str:
    s, p = _UNITS[m.group("unit").lower()]
    return f"{_num_words(m.group('number'))} " \
        f"{s if _is_one(m.group('number')) else p}"


def _sub_fraction(m: re.Match) -> str:
    num, den = int(m.group("numerator")), int(m.group("denominator"))
    if den == 2:
        dw = "half" if num == 1 else "halves"
    elif den == 4:
        dw = "quarter" if num == 1 else "quarters"
    else:
        dw = _ordinal_words(den) + ("" if num == 1 else "s")
    return f"{_int_words(num)} {dw}"


def _sub_phone(m: re.Match) -> str:
    digits = re.sub(r"\D", "", m.group(0))
    if len(digits) == 11 and digits.startswith("1"):
        digits = digits[1:]
    return _digit_words(digits)


def normalize_english_text(text: str) -> str:
    text = _ISO_DATE_RE.sub(_sub_date, text)
    text = _MONTH_DATE_RE.sub(_sub_month_date, text)
    text = _SLASH_DATE_RE.sub(_sub_date, text)
    text = _TIME_RE.sub(_sub_time, text)
    text = _PHONE_RE.sub(_sub_phone, text)
    text = _MONEY_RE.sub(_sub_money, text)
    text = _PERCENT_RE.sub(
        lambda m: f"{_num_words(m.group('number'))} percent", text)
    text = _UNIT_RE.sub(_sub_unit, text)
    text = _FRACTION_RE.sub(_sub_fraction, text)
    text = _ORDINAL_RE.sub(
        lambda m: _ordinal_words(int(m.group("number").replace(",", ""))),
        text)
    text = _DECIMAL_RE.sub(lambda m: _num_words(m.group("number")), text)
    text = _INTEGER_RE.sub(lambda m: _num_words(m.group("number")), text)
    text = _ACRONYM_RE.sub(lambda m: " ".join(m.group(0).lower()), text)
    text = text.replace("&", " and ").replace("@", " at ")
    text = _SPACE_PUNCT_RE.sub(r"\1", text)
    return _SPACE_RE.sub(" ", text).strip()


class TTSTextNormalizer:
    def __init__(self, cache_root=None):
        self.cache_root = cache_root

    def supported(self, language: str) -> bool:
        return language.lower() in ENGLISH_LANGS

    def normalize(self, text: str, language: str) -> str:
        if not text.strip() or not self.supported(language):
            return text
        return normalize_english_text(text)
