"""Qwen3-ForcedAligner: word-level timestamp alignment.

Parity: /root/reference/mlx_audio/stt/models/qwen3_asr/qwen3_forced_aligner.py
(ForceAlignProcessor :15 — language tokenizers, LIS timestamp repair :147;
ForcedAlignerModel :449 — audio tower + text model with a classify_num
timestamp head; generate :637).

TPU design: one bucketed jitted forward (no AR loop — alignment is a single
non-causal pass); the audio splice happens host-side on the embedding
matrix; logits reduce to argmax at the <timestamp> positions on the host.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, apply_rms_norm, init_linear
from ....ops.rope import rope_freqs
from .config import ModelConfig as AsrModelConfig
from .qwen3_asr import Model as AsrModel, init_qwen3_asr

Array = jax.Array

PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096)


class ForceAlignProcessor:
    """Text tokenization + timestamp parsing (reference :15-298)."""

    def __init__(self):
        self.ko_tokenizer = None
        self._nagisa = None

    @staticmethod
    def is_kept_char(ch: str) -> bool:
        if ch == "'":
            return True
        cat = unicodedata.category(ch)
        return cat.startswith("L") or cat.startswith("N")

    def clean_token(self, token: str) -> str:
        return "".join(ch for ch in token if self.is_kept_char(ch))

    @staticmethod
    def is_cjk_char(ch: str) -> bool:
        code = ord(ch)
        return (0x4E00 <= code <= 0x9FFF or 0x3400 <= code <= 0x4DBF
                or 0x20000 <= code <= 0x2A6DF or 0x2A700 <= code <= 0x2B73F
                or 0x2B740 <= code <= 0x2B81F or 0x2B820 <= code <= 0x2CEAF
                or 0xF900 <= code <= 0xFAFF)

    def tokenize_chinese_mixed(self, text: str) -> List[str]:
        tokens: List[str] = []
        latin: List[str] = []

        def flush():
            if latin:
                cleaned = self.clean_token("".join(latin))
                if cleaned:
                    tokens.append(cleaned)
                latin.clear()

        for ch in text:
            if self.is_cjk_char(ch):
                flush()
                tokens.append(ch)
            elif self.is_kept_char(ch):
                latin.append(ch)
            else:
                flush()
        flush()
        return tokens

    def tokenize_japanese(self, text: str) -> List[str]:
        if self._nagisa is None:
            try:
                import nagisa

                self._nagisa = nagisa
            except ImportError:
                raise ImportError("Japanese tokenization requires nagisa")
        return [self.clean_token(w)
                for w in self._nagisa.tagging(text).words
                if self.clean_token(w)]

    def tokenize_korean(self, text: str) -> List[str]:
        if self.ko_tokenizer is None:
            try:
                from soynlp.tokenizer import LTokenizer

                self.ko_tokenizer = LTokenizer()
            except ImportError:
                raise ImportError("Korean tokenization requires soynlp")
        return [self.clean_token(w)
                for w in self.ko_tokenizer.tokenize(text)
                if self.clean_token(w)]

    def split_segment_with_chinese(self, seg: str) -> List[str]:
        tokens: List[str] = []
        buf: List[str] = []
        for ch in seg:
            if self.is_cjk_char(ch):
                if buf:
                    tokens.append("".join(buf))
                    buf = []
                tokens.append(ch)
            else:
                buf.append(ch)
        if buf:
            tokens.append("".join(buf))
        return tokens

    def tokenize_space_lang(self, text: str) -> List[str]:
        tokens: List[str] = []
        for seg in text.split():
            cleaned = self.clean_token(seg)
            if cleaned:
                tokens.extend(self.split_segment_with_chinese(cleaned))
        return tokens

    def fix_timestamp(self, data) -> List[int]:
        """Repair non-monotonic timestamps: keep the longest increasing
        subsequence; fill <=2-wide anomalies from the nearest valid
        neighbor, interpolate larger runs (reference :147-244)."""
        data = list(np.asarray(data).reshape(-1))
        n = len(data)
        if n == 0:
            return []
        dp = [1] * n
        parent = [-1] * n
        for i in range(1, n):
            for j in range(i):
                if data[j] <= data[i] and dp[j] + 1 > dp[i]:
                    dp[i] = dp[j] + 1
                    parent[i] = j
        idx = dp.index(max(dp))
        is_normal = [False] * n
        while idx != -1:
            is_normal[idx] = True
            idx = parent[idx]
        result = list(data)
        i = 0
        while i < n:
            if is_normal[i]:
                i += 1
                continue
            j = i
            while j < n and not is_normal[j]:
                j += 1
            left = next((result[k] for k in range(i - 1, -1, -1)
                         if is_normal[k]), None)
            right = next((result[k] for k in range(j, n)
                          if is_normal[k]), None)
            if j - i <= 2:
                for k in range(i, j):
                    if left is None:
                        result[k] = right
                    elif right is None:
                        result[k] = left
                    else:
                        result[k] = left if (k - (i - 1)) <= (j - k) \
                            else right
            else:
                if left is not None and right is not None:
                    step = (right - left) / (j - i + 1)
                    for k in range(i, j):
                        result[k] = left + step * (k - i + 1)
                else:
                    fill = left if left is not None else right
                    for k in range(i, j):
                        result[k] = fill
            i = j
        return [int(r) for r in result]

    def encode_timestamp(self, text: str, language: str
                         ) -> Tuple[List[str], str]:
        language = language.lower()
        if language == "japanese":
            words = self.tokenize_japanese(text)
        elif language == "korean":
            words = self.tokenize_korean(text)
        elif language == "chinese":
            words = self.tokenize_chinese_mixed(text)
        else:
            words = self.tokenize_space_lang(text)
        input_text = "<timestamp><timestamp>".join(words) \
            + "<timestamp><timestamp>"
        input_text = "<|audio_start|><|audio_pad|><|audio_end|>" + input_text
        return words, input_text

    def parse_timestamp(self, words: List[str], timestamp
                        ) -> List[Dict[str, Any]]:
        fixed = self.fix_timestamp(timestamp)
        return [{"text": w, "start_time": fixed[2 * i],
                 "end_time": fixed[2 * i + 1]}
                for i, w in enumerate(words)]


@dataclass(frozen=True)
class ForcedAlignItem:
    text: str
    start_time: float
    end_time: float


@dataclass
class ForcedAlignResult:
    items: List[ForcedAlignItem]

    @property
    def text(self) -> str:
        return " ".join(it.text for it in self.items)

    @property
    def segments(self) -> List[Dict[str, Any]]:
        return [{"text": it.text, "start": it.start_time,
                 "end": it.end_time} for it in self.items]

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        return self.items[idx]


@dataclass
class ForcedAlignerConfig(AsrModelConfig):
    model_type: str = "qwen3_forced_aligner"
    timestamp_token_id: int = 151705
    timestamp_segment_time: float = 80.0
    classify_num: int = 5000

    @classmethod
    def from_dict(cls, params: Dict[str, Any]) -> "ForcedAlignerConfig":
        params = dict(params)
        thinker = params.get("thinker_config", {})
        for k in ("timestamp_token_id", "timestamp_segment_time",
                  "classify_num"):
            if k in thinker:
                params.setdefault(k, thinker[k])
        cfg = super(ForcedAlignerConfig, cls).from_dict(params)
        cfg.model_type = "qwen3_forced_aligner"
        return cfg


class ForcedAlignerModel(AsrModel):
    """Alignment = one non-AR forward; timestamps read at <timestamp>
    positions (reference ForcedAlignerModel :449-570)."""

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = ForcedAlignerConfig.from_dict(kwargs) if kwargs \
                else ForcedAlignerConfig()
        elif isinstance(config, dict):
            config = ForcedAlignerConfig.from_dict(config)
        super().__init__(config)
        self.aligner_processor = ForceAlignProcessor()

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        p = init_qwen3_asr(k1, self.config)
        p["lm_head"] = init_linear(k2, self.config.text_config.hidden_size,
                                   self.config.classify_num, bias=False)
        return p

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.startswith("thinker."):
                k = k[len("thinker."):]
            if "conv2d" in k and k.endswith("weight") and v.ndim == 4 \
                    and v.shape[-1] == 3 and v.shape[-2] == 3:
                v = jnp.transpose(v, (2, 3, 1, 0))
            out[k] = v
        return out

    # ------------------------------------------------------------ forward

    def _align_fn(self, bucket: int):
        key_ = ("align", bucket)
        fn = self._jit_cache.get(key_)
        if fn is not None:
            return fn
        t = self.config.text_config
        inv_freq = rope_freqs(t.head_dim, t.rope_theta)
        from ....tts.models.qwen3_tts.talker import qwen3_layer_forward

        def forward(p, embeds, length):
            x = embeds
            positions = jnp.arange(bucket)[None]
            mask = jnp.where(jnp.arange(bucket)[None, :] < length[:, None],
                             0.0, -jnp.inf)[:, None, None, :]
            for i in range(t.num_hidden_layers):
                x, _ = qwen3_layer_forward(
                    p["model"]["layers"][str(i)], x, positions, inv_freq,
                    t.num_attention_heads, t.num_key_value_heads,
                    t.head_dim, t.rms_norm_eps, None, 0, mask, True)
            x = apply_rms_norm(p["model"]["norm"], x, t.rms_norm_eps)
            return apply_linear(p["lm_head"], x)

        fn = jax.jit(forward)
        self._jit_cache[key_] = fn
        return fn

    # ----------------------------------------------------------- generate

    def generate(self, audio, text: Union[str, List[str]] = "",
                 language: Union[str, List[str]] = "English", **kwargs):
        """Align transcript(s) to audio -> ForcedAlignResult(s)
        (reference generate :637-760)."""
        if self._tokenizer is None:
            raise RuntimeError("tokenizer not initialized; load the model "
                               "from a checkpoint directory")
        single = not isinstance(audio, list)
        audios = [audio] if single else audio
        texts = [text] if isinstance(text, str) else text
        langs = [language] if isinstance(language, str) else language
        if len(langs) == 1 and len(audios) > 1:
            langs = langs * len(audios)
        if not (len(audios) == len(texts) == len(langs)):
            raise ValueError("audio/text/language batch size mismatch")

        results = []
        for a, txt, lang in zip(audios, texts, langs):
            if isinstance(a, (str, Path)):
                from ...utils import load_audio

                a = np.asarray(load_audio(str(a), self.sample_rate))
            feats, n_audio = self.encode(np.asarray(a, np.float32))
            words, aligner_text = self.aligner_processor.encode_timestamp(
                txt, lang)
            aligner_text = aligner_text.replace(
                "<|audio_pad|>", "<|audio_pad|>" * n_audio)
            ids = np.asarray(self._tokenizer.encode(
                aligner_text, add_special_tokens=False), np.int32)
            n = len(ids)
            pb = next((b for b in PROMPT_BUCKETS if n <= b),
                      ((n + 4095) // 4096) * 4096)
            tok_ids = np.zeros((1, pb), np.int32)
            tok_ids[0, :n] = ids
            embeds = np.array(apply_embedding(
                self.params["model"]["embed_tokens"], jnp.asarray(tok_ids)))
            audio_pos = np.where(tok_ids[0, :n]
                                 == self.config.audio_token_id)[0]
            m = min(len(audio_pos), feats.shape[0])
            embeds[0, audio_pos[:m]] = feats[:m]

            logits = np.asarray(self._align_fn(pb)(
                self.params, jnp.asarray(embeds), jnp.asarray([n])))
            out_ids = logits[0, :n].argmax(axis=-1)
            ts_mask = tok_ids[0, :n] == self.config.timestamp_token_id
            ts_ms = out_ids[ts_mask] * self.config.timestamp_segment_time
            parsed = self.aligner_processor.parse_timestamp(words, ts_ms)
            results.append(ForcedAlignResult(items=[
                ForcedAlignItem(text=str(d["text"]),
                                start_time=round(d["start_time"] / 1000.0, 3),
                                end_time=round(d["end_time"] / 1000.0, 3))
                for d in parsed]))
        return results[0] if single else results

    def get_supported_languages(self) -> Optional[List[str]]:
        if self.config.support_languages:
            return sorted({str(x).lower()
                           for x in self.config.support_languages})
        return None


Model = ForcedAlignerModel
ModelConfig = ForcedAlignerConfig

__all__ = ["Model", "ModelConfig", "ForcedAlignerModel",
           "ForcedAlignerConfig", "ForceAlignProcessor", "ForcedAlignItem",
           "ForcedAlignResult"]
