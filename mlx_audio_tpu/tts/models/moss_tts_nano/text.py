"""MOSS-TTS-Nano prompt templates + sentence chunking (host-side).

Parity: /root/reference/mlx_audio/tts/models/moss_tts_nano/text.py.
The template strings must match the upstream training format byte-for-byte;
the chunker splits long text into ≤max_tokens sentence groups (sentence →
clause → binary-search token-budget fallback).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Sequence, Tuple

from .config import ModelConfig

USER_ROLE_PREFIX = "user\n"
USER_TEMPLATE_REFERENCE_PREFIX = "<user_inst>\n- Reference(s):\n"
USER_TEMPLATE_AFTER_REFERENCE = (
    "\n- Instruction:\nNone\n"
    "- Tokens:\nNone\n"
    "- Quality:\nNone\n"
    "- Sound Event:\nNone\n"
    "- Ambient Sound:\nNone\n"
    "- Language:\nNone\n"
    "- Text:\n"
)
USER_TEMPLATE_SUFFIX = "\n</user_inst>"
ASSISTANT_TURN_PREFIX = "\n"
ASSISTANT_ROLE_PREFIX = "assistant\n"

SENTENCE_END = frozenset(".!?。！？；;")
CLAUSE_SPLIT = frozenset(",，、；;：:")
CLOSERS = frozenset("\"'”’)]}）】》」』")


class SentencePieceTextTokenizer:
    """Thin wrapper over a sentencepiece model file."""

    def __init__(self, model_path):
        try:
            import sentencepiece as spm
        except ImportError as exc:  # pragma: no cover - env without spm
            raise ImportError(
                "MOSS-TTS-Nano text tokenization requires sentencepiece."
            ) from exc
        self.processor = spm.SentencePieceProcessor(model_file=str(model_path))

    def encode(self, text: str, *a, **k) -> List[int]:
        return [int(t) for t in self.processor.encode(str(text), out_type=int)]

    def decode(self, ids: Sequence[int], *a, **k) -> str:
        return str(self.processor.decode(list(ids)))


def load_tokenizer(model_path) -> SentencePieceTextTokenizer:
    path = Path(model_path) / "tokenizer.model"
    if not path.exists():
        raise FileNotFoundError(f"tokenizer.model not found: {path}")
    return SentencePieceTextTokenizer(path)


def encode_text(tokenizer, text: str) -> List[int]:
    try:
        ids = tokenizer.encode(text, add_special_tokens=False)
    except TypeError:
        ids = tokenizer.encode(text)
    return [int(t) for t in ids]


def build_user_prompt_prefix(tokenizer, config: ModelConfig) -> List[int]:
    return ([config.im_start_token_id]
            + encode_text(tokenizer, USER_ROLE_PREFIX)
            + encode_text(tokenizer, USER_TEMPLATE_REFERENCE_PREFIX))


def build_user_prompt_after_reference(tokenizer) -> List[int]:
    return encode_text(tokenizer, USER_TEMPLATE_AFTER_REFERENCE)


def build_assistant_prompt_prefix(tokenizer, config: ModelConfig) -> List[int]:
    return (encode_text(tokenizer, USER_TEMPLATE_SUFFIX)
            + [config.im_end_token_id]
            + encode_text(tokenizer, ASSISTANT_TURN_PREFIX)
            + [config.im_start_token_id]
            + encode_text(tokenizer, ASSISTANT_ROLE_PREFIX))


def build_prompt_token_ids(tokenizer, config: ModelConfig,
                           text_token_ids: Sequence[int]) -> List[int]:
    return (build_user_prompt_prefix(tokenizer, config)
            + encode_text(tokenizer, "None")
            + build_user_prompt_after_reference(tokenizer)
            + [int(t) for t in text_token_ids]
            + build_assistant_prompt_prefix(tokenizer, config))


def contains_cjk(text: str) -> bool:
    return any("一" <= c <= "鿿" or "㐀" <= c <= "䶿"
               or "぀" <= c <= "ヿ" or "가" <= c <= "힯"
               for c in str(text))


def lightweight_normalize_text(text: str) -> str:
    return re.sub(r"\s+", " ",
                  str(text or "").replace("\r", " ").replace("\n", " ")).strip()


def prepare_text_for_sentence_chunking(text: str) -> str:
    t = lightweight_normalize_text(text)
    if not t:
        raise ValueError("Text prompt cannot be empty.")
    if contains_cjk(t):
        return t if t[-1] in SENTENCE_END else t + "。"
    if t[:1].islower():
        t = t[:1].upper() + t[1:]
    if t[-1].isalnum():
        t += "."
    if len(t.split()) < 5:
        t = f"        {t}"
    return t


def split_text_by_punctuation(text: str, punctuation) -> List[str]:
    """Split after each punctuation char, folding trailing closers in."""
    out: List[str] = []
    buf: List[str] = []
    i = 0
    text = str(text or "")
    while i < len(text):
        ch = text[i]
        buf.append(ch)
        if ch in punctuation:
            j = i + 1
            while j < len(text) and text[j] in CLOSERS:
                buf.append(text[j])
                j += 1
            piece = "".join(buf).strip()
            if piece:
                out.append(piece)
            buf.clear()
            while j < len(text) and text[j].isspace():
                j += 1
            i = j
            continue
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def join_sentence_parts(left: str, right: str) -> str:
    if not left or not right:
        return left or right
    if contains_cjk(left) or contains_cjk(right):
        return left + right
    return f"{left} {right}"


def split_text_by_token_budget(tokenizer, text: str,
                               max_tokens: int) -> List[str]:
    """Hard splitter: longest prefix within budget (binary search), then back
    off ≤25 chars to the nearest space/punctuation boundary."""
    remaining = str(text or "").strip()
    pieces: List[str] = []
    boundary = set(CLAUSE_SPLIT) | set(SENTENCE_END) | {" "}
    while remaining:
        if len(encode_text(tokenizer, remaining)) <= max_tokens:
            pieces.append(remaining)
            break
        lo, hi, best = 1, len(remaining), 1
        while lo <= hi:
            mid = (lo + hi) // 2
            cand = remaining[:mid].strip()
            if cand and len(encode_text(tokenizer, cand)) <= max_tokens:
                best = mid
                lo = mid + 1
            else:
                lo = lo + 1 if not cand else lo
                hi = mid - 1 if cand else hi
                if not cand:
                    break
        cut = best
        prefix = remaining[:best]
        for k in range(len(prefix) - 1, max(-1, len(prefix) - 25), -1):
            if prefix[k] in boundary:
                cut = k + 1
                break
        piece = remaining[:cut].strip() or remaining[:best].strip()
        if not remaining[:cut].strip():
            cut = best
        pieces.append(piece)
        remaining = remaining[cut:].strip()
    return pieces


def split_text_into_best_sentences(tokenizer, text: str,
                                   max_tokens: int = 75) -> List[str]:
    normalized = str(text or "").strip()
    if not normalized:
        return []
    budget = max(1, int(max_tokens))
    prepared = prepare_text_for_sentence_chunking(normalized)
    sentences = (split_text_by_punctuation(prepared, SENTENCE_END)
                 or [prepared.strip()])

    slices: List[Tuple[int, str]] = []

    def push(piece: str):
        piece = piece.strip()
        if piece:
            slices.append((len(encode_text(tokenizer, piece)), piece))

    for sent in sentences:
        sent = sent.strip()
        if not sent:
            continue
        if len(encode_text(tokenizer, sent)) <= budget:
            push(sent)
            continue
        clauses = split_text_by_punctuation(sent, CLAUSE_SPLIT) or [sent]
        if len(clauses) <= 1:
            clauses = [sent]
        for clause in clauses:
            clause = clause.strip()
            if not clause:
                continue
            if len(encode_text(tokenizer, clause)) <= budget:
                push(clause)
            else:
                for piece in split_text_by_token_budget(tokenizer, clause,
                                                        budget):
                    push(piece)

    chunks: List[str] = []
    cur, cur_n = "", 0
    for n, piece in slices:
        if not cur:
            cur, cur_n = piece, n
        elif cur_n + n > budget:
            chunks.append(cur.strip())
            cur, cur_n = piece, n
        else:
            cur = join_sentence_parts(cur, piece)
            cur_n = len(encode_text(tokenizer, cur))
    if cur:
        chunks.append(cur.strip())
    return chunks if len(chunks) > 1 else [normalized]


__all__ = [
    "SentencePieceTextTokenizer", "load_tokenizer", "encode_text",
    "build_user_prompt_prefix", "build_user_prompt_after_reference",
    "build_assistant_prompt_prefix", "build_prompt_token_ids",
    "contains_cjk", "lightweight_normalize_text",
    "prepare_text_for_sentence_chunking", "split_text_by_punctuation",
    "split_text_by_token_budget", "split_text_into_best_sentences",
    "join_sentence_parts",
]
