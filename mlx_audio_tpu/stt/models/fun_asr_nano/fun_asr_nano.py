"""Fun-ASR-Nano: SenseVoice SANM encoder + adaptor + Qwen3 LM.

Parity: /root/reference/mlx_audio/stt/models/fun_asr_nano/fun_asr_nano.py
(SANM encoder stack :76-250 — shared with sensevoice, transformer audio
adaptor :255-330, ChatML prompt with Chinese task text + hotwords/context
:414-455, fake-token splice :456-485, chunked generate :560-670) plus
audio.py (Kaldi fbank * 2^15, LFR 7/6, fake_token_length) and config.py
(llm_config alias, sanm_shfit typo tolerance).

TPU design: encoder layers reuse the sensevoice SANM kernels (bucketed,
mask-faithful); the adaptor is window reshape + 2 transformer blocks in
the same jit; the Qwen3 LM decode (prefill over spliced embeds + greedy
AR loop + EOS stop) is one compiled while_loop on fixed KV caches.
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_layer_norm,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache
from ....ops.rope import rope_freqs
from ...models.base import STTOutput
from ....tts.models.qwen3_tts.talker import (init_qwen3_layer,
                                             qwen3_layer_forward)
from ..qwen3_asr.config import TextConfig
from ..qwen3_asr.qwen3_asr import split_audio_into_chunks
from ..sensevoice.sensevoice import (
    EncoderConfig as SenseVoiceEncoderConfig,
    _init_sanm_layer,
    _sanm_layer,
    _sinusoidal_positions,
    apply_lfr,
)

Array = jax.Array

ENC_BUCKETS = (128, 256, 512, 1024, 2048, 4096)
PROMPT_BUCKETS = (256, 512, 1024, 2048, 4096)

ISO_TO_PROMPT_LANGUAGE = {
    "zh": "中文", "zh-cn": "中文", "zh-hans": "中文", "zh-tw": "中文",
    "zh-hant": "中文", "cmn": "中文", "cjy": "中文", "gan": "中文",
    "hak": "中文", "hsn": "中文", "nan": "中文", "wuu": "中文",
    "yue": "中文",
    "en": "英文", "eng": "英文",
    "ja": "日文", "jpn": "日文", "jp": "日文",
}
SUPPORTED_ISO_LANGUAGES = ", ".join(sorted(
    {"cjy", "cmn", "en", "gan", "hak", "hsn", "ja", "nan", "wuu", "yue",
     "zh"}))
EOS_IDS = (151643, 151645)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@dataclass
class FrontendConfig(BaseModelArgs):
    fs: int = 16000
    window: str = "hamming"
    n_mels: int = 80
    frame_length: int = 25
    frame_shift: int = 10
    lfr_m: int = 7
    lfr_n: int = 6


@dataclass
class AdaptorConfig(BaseModelArgs):
    downsample_rate: int = 1
    ffn_dim: int = 2048
    llm_dim: int = 1024
    encoder_dim: int = 512
    n_layer: int = 2
    attention_heads: int = 8


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "fun_asr_nano"
    input_size: int = 560
    qwen_tokenizer_path: str = "Qwen3-0.6B"
    frontend_conf: Optional[dict] = None
    audio_encoder_conf: Optional[dict] = None
    audio_adaptor_conf: Optional[dict] = None
    text_config: Optional[dict] = None
    llm_config: Optional[dict] = None
    default_max_tokens: int = 512
    model_path: str = ""

    def __post_init__(self):
        self.frontend = FrontendConfig.from_dict(self.frontend_conf or {})
        self.enc = SenseVoiceEncoderConfig.from_dict(
            self.audio_encoder_conf or {})
        self.adaptor = AdaptorConfig.from_dict(
            self.audio_adaptor_conf or {})
        self.text = TextConfig.from_dict(
            self.text_config or self.llm_config or {})


def fake_token_length(speech_length: int) -> int:
    """Audio placeholder count (reference audio.py:60-64)."""
    olens = 1 + (int(speech_length) - 3 + 2) // 2
    olens = 1 + (olens - 3 + 2) // 2
    return max(1, (olens - 1) // 2 + 1)


# ------------------------------------------------------------------- init

def init_fun_asr_nano(key, cfg: ModelConfig) -> dict:
    e, a, t = cfg.enc, cfg.adaptor, cfg.text
    n_layers = 1 + (e.num_blocks - 1) + e.tp_blocks
    ks = iter(jax.random.split(key, 16 + 5 * n_layers + 6 * a.n_layer))
    lk = iter(jax.random.split(next(ks), 8 * t.num_hidden_layers + 2))
    blocks = {}
    for i in range(a.n_layer):
        blocks[str(i)] = {
            "self_attn": {
                "linear_q": init_linear(next(ks), a.llm_dim, a.llm_dim),
                "linear_k": init_linear(next(ks), a.llm_dim, a.llm_dim),
                "linear_v": init_linear(next(ks), a.llm_dim, a.llm_dim),
                "linear_out": init_linear(next(ks), a.llm_dim,
                                          a.llm_dim)},
            "feed_forward": {
                "w_1": init_linear(next(ks), a.llm_dim, a.llm_dim // 4),
                "w_2": init_linear(next(ks), a.llm_dim // 4, a.llm_dim)},
            "norm1": init_layer_norm(a.llm_dim),
            "norm2": init_layer_norm(a.llm_dim),
        }
    p = {
        "audio_encoder": {
            "encoders0": {"0": _init_sanm_layer(
                ks, cfg.input_size, e.output_size, e.attention_heads,
                e.linear_units, e.kernel_size)},
            "encoders": {str(i): _init_sanm_layer(
                ks, e.output_size, e.output_size, e.attention_heads,
                e.linear_units, e.kernel_size)
                for i in range(e.num_blocks - 1)},
            "after_norm": init_layer_norm(e.output_size),
            "tp_encoders": {str(i): _init_sanm_layer(
                ks, e.output_size, e.output_size, e.attention_heads,
                e.linear_units, e.kernel_size)
                for i in range(e.tp_blocks)},
            "tp_norm": init_layer_norm(e.output_size)},
        "audio_adaptor": {
            "linear1": init_linear(next(ks),
                                   a.encoder_dim * a.downsample_rate,
                                   a.ffn_dim),
            "linear2": init_linear(next(ks), a.ffn_dim, a.llm_dim),
            "blocks": blocks},
        "llm": {"model": {
            "embed_tokens": init_embedding(next(ks), t.vocab_size,
                                           t.hidden_size),
            "layers": {str(i): init_qwen3_layer(
                lk, t.hidden_size, t.num_attention_heads,
                t.num_key_value_heads, t.head_dim, t.intermediate_size,
                t.attention_bias) for i in range(t.num_hidden_layers)},
            "norm": init_rms_norm(t.hidden_size)}},
    }
    if not t.tie_word_embeddings:
        p["llm"]["lm_head"] = init_linear(next(ks), t.hidden_size,
                                          t.vocab_size, bias=False)
    return p


# ----------------------------------------------------------------- encoder

def encoder_forward(params: dict, cfg: ModelConfig, speech: Array,
                    length: Array) -> Array:
    """(B, T, input_size) LFR features -> (B, T, output_size), masked."""
    e = cfg.enc
    b, t, _ = speech.shape
    valid = jnp.arange(t)[None, :] < length[:, None]
    mask = valid.astype(speech.dtype)[..., None]
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
    x = speech * (e.output_size ** 0.5)
    x = (x + _sinusoidal_positions(t, cfg.input_size)[None]) * mask
    ep = params["audio_encoder"]
    x = _sanm_layer(ep["encoders0"]["0"], e, x, cfg.input_size, bias,
                    mask)
    for i in range(e.num_blocks - 1):
        x = _sanm_layer(ep["encoders"][str(i)], e, x, e.output_size,
                        bias, mask)
    x = apply_layer_norm(ep["after_norm"], x)
    for i in range(e.tp_blocks):
        x = _sanm_layer(ep["tp_encoders"][str(i)], e, x, e.output_size,
                        bias, mask)
    return apply_layer_norm(ep["tp_norm"], x) * mask


def adaptor_forward(params: dict, cfg: ModelConfig, x: Array,
                    length: Array) -> Array:
    """(B, T, enc_dim) -> (B, ceil(T/k), llm_dim) transformer adaptor."""
    a = cfg.adaptor
    p = params["audio_adaptor"]
    b, t, d = x.shape
    k = a.downsample_rate
    pad = (-t) % k
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    x = x.reshape(b, (t + pad) // k, d * k)
    x = apply_linear(p["linear2"],
                     jax.nn.relu(apply_linear(p["linear1"], x)))
    olens = (length - 1) // k + 1
    t2 = x.shape[1]
    valid = jnp.arange(t2)[None, :] < olens[:, None]
    bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    nh = a.attention_heads
    dh = a.llm_dim // nh
    for i in range(a.n_layer):
        bp = p["blocks"][str(i)]
        h = apply_layer_norm(bp["norm1"], x)
        sa = bp["self_attn"]
        q = apply_linear(sa["linear_q"], h).reshape(b, t2, nh, dh)
        kk = apply_linear(sa["linear_k"], h).reshape(b, t2, nh, dh)
        v = apply_linear(sa["linear_v"], h).reshape(b, t2, nh, dh)
        o = attention(q, kk, v, mask=bias).reshape(b, t2, a.llm_dim)
        x = x + apply_linear(sa["linear_out"], o)
        h = apply_layer_norm(bp["norm2"], x)
        x = x + apply_linear(bp["feed_forward"]["w_2"], jax.nn.relu(
            apply_linear(bp["feed_forward"]["w_1"], h)))
    return x


def _normalise_text_for_join(text: str) -> str:
    return re.sub(r"\s+", " ", text.replace("/sil", " ")).strip()


# -------------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None

    @property
    def sample_rate(self) -> int:
        return self.config.frontend.fs

    def init_params(self, key):
        return init_fun_asr_nano(key, self.config)

    # ----------------------------------------------------------- features

    def _extract_features(self, audio: np.ndarray
                          ) -> Tuple[np.ndarray, int, int]:
        from ....dsp import compute_fbank_kaldi

        fc = self.config.frontend
        wav = np.asarray(audio, np.float32).reshape(-1)
        feats = np.asarray(compute_fbank_kaldi(
            jnp.asarray(wav * 32768.0), sample_rate=fc.fs,
            win_len=int(fc.fs * fc.frame_length / 1000),
            win_inc=int(fc.fs * fc.frame_shift / 1000),
            num_mels=fc.n_mels, win_type=fc.window, preemphasis=0.97,
            dither=0.0, snip_edges=True, low_freq=20.0, high_freq=0.0))
        feats = apply_lfr(feats, fc.lfr_m, fc.lfr_n)
        return feats, feats.shape[0], fake_token_length(feats.shape[0])

    def get_audio_embeds(self, feats: np.ndarray, speech_len: int
                         ) -> np.ndarray:
        tb = _bucket(speech_len, ENC_BUCKETS)
        fn = self._jit_cache.get(("tower", tb))
        if fn is None:
            cfg = self.config

            def full(p, speech, length):
                enc = encoder_forward(p, cfg, speech, length)
                return adaptor_forward(p, cfg, enc, length)

            fn = jax.jit(full)
            self._jit_cache[("tower", tb)] = fn
        buf = np.zeros((1, tb, feats.shape[1]), np.float32)
        buf[0, :speech_len] = feats
        out = fn(self.params, jnp.asarray(buf),
                 jnp.asarray([speech_len], jnp.int32))
        return np.asarray(out[0])

    # ------------------------------------------------------------- prompt

    @staticmethod
    def _map_language(language: Optional[str]) -> Optional[str]:
        if language is None:
            return None
        normalized = language.lower().replace("_", "-")
        if normalized in {"", "auto"}:
            return None
        if normalized in ISO_TO_PROMPT_LANGUAGE:
            return ISO_TO_PROMPT_LANGUAGE[normalized]
        if re.fullmatch(r"[a-z]{2,3}(?:-[a-z0-9]+)*", normalized):
            raise ValueError(
                "Unsupported ISO language for Fun-ASR-Nano: "
                f"{language!r}. Supported: {SUPPORTED_ISO_LANGUAGES}.")
        return language

    @staticmethod
    def _resolve_hotwords(hotwords: Optional[Iterable[str]],
                          context: Optional[str]) -> Optional[List[str]]:
        resolved = [w.strip() for w in (hotwords or []) if w.strip()]
        context = (context or "").strip()
        if resolved and context:
            raise ValueError("Pass either hotwords or context, not both.")
        if resolved:
            return resolved
        return [context] if context else None

    @staticmethod
    def _prompt_text(hotwords: Optional[Iterable[str]] = None,
                     language: Optional[str] = None,
                     itn: bool = True) -> str:
        hotwords = list(hotwords or [])
        prompt = ""
        if hotwords:
            prompt += ("请结合上下文信息，更加准确地完成语音转写任务。"
                       "如果没有相关信息，我们会留空。\n\n\n"
                       "**上下文信息：**\n\n\n")
            prompt += f"热词列表：[{', '.join(hotwords)}]\n"
        prompt += "语音转写" if language is None else f"语音转写成{language}"
        if not itn:
            prompt += "，不进行文本规整"
        return prompt + "："

    def _build_prompt_ids(self, fake_len: int, *, language, hotwords,
                          itn) -> Tuple[List[int], int]:
        label = self._map_language(language)
        user_prompt = self._prompt_text(hotwords, label, itn)
        before = ("<|im_start|>system\nYou are a helpful assistant."
                  f"<|im_end|>\n<|im_start|>user\n{user_prompt}")
        after = "<|im_end|>\n<|im_start|>assistant\n"
        if self._tokenizer is None:
            before_ids, after_ids = [1], [2]
        else:
            before_ids = list(self._tokenizer.encode(before))
            after_ids = list(self._tokenizer.encode(after))
        fbank_beg = len(before_ids)
        return before_ids + [0] * fake_len + after_ids, fbank_beg

    # -------------------------------------------------------------- decode

    def _lm_fns(self, pb: int, max_tokens: int,
                sampling: Tuple = (0.0, 0, 1.0, 0.0, 1.0, 20, 1)):
        key_ = ("lm", pb, max_tokens, sampling)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        from ....ops.sampling import make_token_selector

        (temperature, top_k, top_p, min_p, repetition_penalty,
         repetition_context_size, min_tokens_to_keep) = sampling
        init_hist, select, push = make_token_selector(
            temperature=temperature, top_k=top_k, top_p=top_p, min_p=min_p,
            repetition_penalty=repetition_penalty,
            repetition_context_size=repetition_context_size,
            min_tokens_to_keep=min_tokens_to_keep)
        t = self.config.text
        cap = pb + max_tokens
        eos = jnp.asarray(EOS_IDS, jnp.int32)
        inv_freq = rope_freqs(t.head_dim, t.rope_theta)

        def forward(p, x, caches, offset, mask):
            new = []
            positions = offset + jnp.arange(x.shape[1])[None]
            for i in range(t.num_hidden_layers):
                x, nc = qwen3_layer_forward(
                    p["llm"]["model"]["layers"][str(i)], x, positions,
                    inv_freq, t.num_attention_heads,
                    t.num_key_value_heads, t.head_dim, t.rms_norm_eps,
                    caches[i], offset, mask, True)
                new.append(nc)
            x = apply_rms_norm(p["llm"]["model"]["norm"], x,
                               t.rms_norm_eps)
            if "lm_head" in p["llm"]:
                return apply_linear(p["llm"]["lm_head"], x), new
            return x @ p["llm"]["model"]["embed_tokens"]["weight"].T, new

        def prefill(p, embeds, length):
            caches = [KVCache.init(1, cap, t.num_key_value_heads,
                                   t.head_dim, dtype=jnp.float32)
                      for _ in range(t.num_hidden_layers)]
            pad = jnp.where(jnp.arange(cap)[None, :] < length, 0.0,
                            -jnp.inf)[:, None, None, :]
            logits, caches = forward(p, embeds, caches, jnp.int32(0),
                                     pad)
            return logits[jnp.arange(1), length - 1], caches

        def decode(p, lg, caches, plen, rng):
            toks0 = jnp.full((max_tokens,), -1, jnp.int32)

            def cond(st):
                i, done = st[0], st[-1]
                return jnp.logical_and(i < max_tokens,
                                       jnp.logical_not(done))

            def body(st):
                i, lg, caches, toks, hist, rng, done = st
                tok, rng = select(rng, lg, hist)
                is_eos = jnp.any(tok == eos)
                toks = jnp.where(is_eos, toks, toks.at[i].set(tok))
                hist = push(hist, tok, is_eos)
                emb = apply_embedding(
                    p["llm"]["model"]["embed_tokens"], tok[None, None])
                lg2, caches = forward(p, emb, caches, plen + i, None)
                return (i + 1, lg2[:, 0], caches, toks, hist, rng,
                        jnp.logical_or(done, is_eos))

            _, _, _, toks, _, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), lg, caches, toks0, init_hist(),
                             rng, jnp.bool_(False)))
            return toks

        fns = (jax.jit(prefill), jax.jit(decode))
        self._jit_cache[key_] = fns
        return fns

    def _transcribe_chunk(self, audio: np.ndarray, *, max_tokens,
                          language, hotwords, itn,
                          sampling=(0.0, 0, 1.0, 0.0, 1.0, 20, 1),
                          rng=None) -> Tuple[str, int, int]:
        feats, speech_len, fake_len = self._extract_features(audio)
        adaptor_out = self.get_audio_embeds(feats, speech_len)
        ids, fbank_beg = self._build_prompt_ids(
            fake_len, language=language, hotwords=hotwords, itn=itn)
        n = len(ids)
        pb = _bucket(n, PROMPT_BUCKETS)
        tok_arr = np.zeros((1, pb), np.int32)
        tok_arr[0, :n] = ids
        embeds = np.array(apply_embedding(
            self.params["llm"]["model"]["embed_tokens"],
            jnp.asarray(tok_arr)))
        m = min(fake_len, adaptor_out.shape[0])
        embeds[0, fbank_beg: fbank_beg + m] = adaptor_out[:m]
        prefill, decode = self._lm_fns(pb, max_tokens, sampling)
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.int32(n))
        if rng is None:
            rng = jax.random.PRNGKey(0)
        toks = np.asarray(decode(self.params, lg, caches, jnp.int32(n),
                                 rng))
        generated = [int(x) for x in toks[toks >= 0]]
        text = (self._tokenizer.decode(generated,
                                       skip_special_tokens=True)
                if self._tokenizer is not None
                else " ".join(map(str, generated)))
        return _normalise_text_for_join(text), n, len(generated)

    def generate(self, audio, *, max_tokens: Optional[int] = None,
                 language: Optional[str] = None,
                 hotwords: Optional[Iterable[str]] = None,
                 context: Optional[str] = None, itn: bool = True,
                 chunk_duration: float = 1200.0,
                 min_chunk_duration: float = 1.0,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0,
                 repetition_context_size: int = 20,
                 min_tokens_to_keep: int = 1, seed: int = 0,
                 verbose: bool = False, **kwargs) -> STTOutput:
        t0 = time.time()
        sampling = (float(temperature), int(top_k), float(top_p),
                    float(min_p), float(repetition_penalty),
                    int(repetition_context_size), int(min_tokens_to_keep))
        rng = jax.random.PRNGKey(seed)
        max_tokens = int(max_tokens or self.config.default_max_tokens)
        hotwords = self._resolve_hotwords(hotwords, context)
        audio_input = audio[0] if isinstance(audio, list) else audio
        if isinstance(audio_input, (str, Path)):
            from ...utils import load_audio

            audio_input = load_audio(str(audio_input), self.sample_rate)
        wav = np.asarray(audio_input, np.float32)
        chunks = split_audio_into_chunks(
            wav, sr=self.sample_rate, chunk_duration=chunk_duration,
            min_chunk_duration=min_chunk_duration)
        texts, segments = [], []
        p_toks = g_toks = 0
        remaining = max_tokens
        for chunk_audio, offset_sec in chunks:
            if remaining <= 0:
                break
            rng, sub = jax.random.split(rng)
            text, p, g = self._transcribe_chunk(
                chunk_audio, max_tokens=remaining, language=language,
                hotwords=hotwords, itn=itn, sampling=sampling, rng=sub)
            segments.append({
                "text": text, "start": offset_sec,
                "end": offset_sec + len(chunk_audio) / self.sample_rate,
                "language": language})
            texts.append(text)
            p_toks += p
            g_toks += g
            remaining -= g
        dt = time.time() - t0
        text = " ".join(t for t in texts if t).strip()
        if verbose:
            print(text)
        return STTOutput(
            text=text, segments=segments, language=language,
            prompt_tokens=p_toks, generation_tokens=g_toks,
            total_tokens=p_toks + g_toks, total_time=dt,
            prompt_tps=p_toks / dt if dt > 0 else 0.0,
            generation_tps=g_toks / dt if dt > 0 else 0.0)

    __call__ = generate

    # ------------------------------------------------------------- loading

    def model_quant_predicate(self, path: str, leaf) -> bool:
        return path.startswith("llm.model")

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        tied = self.config.text.tie_word_embeddings
        for k, v in weights.items():
            if k.startswith("module."):
                k = k[len("module."):]
            if k == "llm.lm_head.weight" and tied:
                continue
            v = jnp.asarray(v)
            if k.endswith("fsmn_block.weight") and v.ndim == 3 \
                    and v.shape[1] == 1:
                v = jnp.transpose(v, (2, 1, 0))       # torch OIK -> KIO
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer

            tok_path = Path(model_path) / model.config.qwen_tokenizer_path
            if not tok_path.exists():
                tok_path = Path(model_path)
            model._tokenizer = AutoTokenizer.from_pretrained(
                str(tok_path), trust_remote_code=True)
        except Exception:
            model._tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "encoder_forward", "adaptor_forward",
           "fake_token_length", "init_fun_asr_nano"]
