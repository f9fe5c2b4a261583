"""VibeVoice-ASR: long-form diarized transcription (JSON segments).

Parity: /root/reference/mlx_audio/stt/models/vibevoice_asr/
vibevoice_asr.py (SpeechConnector :19-36, acoustic+semantic feature sum
:135-180, repurposed Qwen2.5 special tokens + ChatML prompt :838-900,
-25 dBFS normalize + 59-min cap :447-535, JSON segment parser :902-955,
sanitize :305-418) and audio_encoder.py (causal SConv1d :36-120, Block1D
depthwise-mixer stages :313-440, TokenizerEncoder downsample pyramid
:442-600).

TPU design: both tokenizer encoders are causal conv pyramids — one
bucketed jitted forward each; causality means bucket right-padding cannot
leak into valid frames, so outputs are sliced to the exact unpadded token
count with no masking. The Qwen2.5 LM rides the shared llama backbone
(attention_bias=True) and the whole greedy/rep-penalty decode is one
compiled while_loop.
"""

from __future__ import annotations

import json
import math
import re
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_conv1d,
    init_linear,
    init_rms_norm,
)
from ....ops.kvcache import KVCache
from ....ops.sampling import apply_repetition_penalty
from ...models.base import STTOutput
from ....tts.models.llama.llama import (
    ModelConfig as LlamaConfig,
    init_caches,
    init_llama,
    llama_forward,
    logits_from_hidden,
)

Array = jax.Array

SAMPLE_RATE = 24000
MAX_DURATION_SECONDS = 59 * 60
REP_CONTEXT = 100
EOS_IDS = (151643, 151645)
# Qwen2.5 repurposed special tokens (reference :420-427)
SPEECH_START_ID = 151646   # <|object_ref_start|>
SPEECH_END_ID = 151647     # <|object_ref_end|>
SPEECH_PAD_ID = 151648     # <|box_start|>

SAMPLE_BUCKETS = (24000, 48000, 120000, 240000, 480000, 960000,
                  1920000, 3840000, 7680000, 15360000, 30720000,
                  61440000, 84960000)
PROMPT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class TokenizerConfig(BaseModelArgs):
    channels: int = 1
    vae_dim: int = 64
    encoder_n_filters: int = 32
    encoder_ratios: List[int] = field(
        default_factory=lambda: [8, 5, 5, 4, 2, 2])
    encoder_depths: str = "3-3-3-3-3-3-8"
    layernorm_eps: float = 1e-5
    conv_bias: bool = True
    layer_scale_init_value: float = 1e-6
    mixer_kernel: int = 7

    @property
    def depths(self) -> List[int]:
        if isinstance(self.encoder_depths, str):
            return [int(d) for d in self.encoder_depths.split("-")]
        return list(self.encoder_depths)

    @property
    def rev_ratios(self) -> List[int]:
        return list(reversed(self.encoder_ratios))


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "vibevoice_asr"
    acoustic_tokenizer_config: Optional[dict] = None
    semantic_tokenizer_config: Optional[dict] = None
    decoder_config: Optional[dict] = None
    acoustic_vae_dim: int = 64
    semantic_vae_dim: int = 128
    model_path: str = ""

    def __post_init__(self):
        self.acoustic = TokenizerConfig.from_dict(
            self.acoustic_tokenizer_config or {})
        self.semantic = TokenizerConfig.from_dict(
            dict({"vae_dim": 128}, **(self.semantic_tokenizer_config
                                      or {})))
        dec = dict(self.decoder_config or {})
        dec.setdefault("attention_bias", True)       # Qwen2.5
        dec.setdefault("rope_theta", 1000000.0)
        self.text = LlamaConfig.from_dict(dec)
        self.acoustic_vae_dim = self.acoustic.vae_dim
        self.semantic_vae_dim = self.semantic.vae_dim


# ------------------------------------------------------------------- init

def _init_block(ks, dim, km, cfg: TokenizerConfig) -> dict:
    return {"norm": init_rms_norm(dim), "ffn_norm": init_rms_norm(dim),
            "mixer": {"conv": {"conv": init_conv1d(
                next(ks), dim, dim, km, groups=dim, bias=cfg.conv_bias)}},
            "ffn": {"linear1": init_linear(next(ks), dim, 4 * dim,
                                           bias=False),
                    "linear2": init_linear(next(ks), 4 * dim, dim,
                                           bias=False)},
            "gamma": jnp.full((dim,), cfg.layer_scale_init_value),
            "ffn_gamma": jnp.full((dim,), cfg.layer_scale_init_value)}


def init_tokenizer_encoder(key, cfg: TokenizerConfig) -> dict:
    depths = cfg.depths
    ratios = cfg.rev_ratios
    nf = cfg.encoder_n_filters
    ks = iter(jax.random.split(key, 8 + len(depths) + 3 * sum(depths)))
    downs = {"0": {"conv": init_conv1d(next(ks), cfg.channels, nf, 7,
                                       bias=cfg.conv_bias)}}
    for i, r in enumerate(ratios):
        downs[str(i + 1)] = {"conv": init_conv1d(
            next(ks), nf * 2 ** i, nf * 2 ** (i + 1), 2 * r,
            bias=cfg.conv_bias)}
    stages = {}
    for i, d in enumerate(depths):
        dim = nf * 2 ** i if i > 0 else nf
        stages[str(i)] = {str(j): _init_block(ks, dim, cfg.mixer_kernel,
                                              cfg) for j in range(d)}
    final = nf * 2 ** len(ratios)
    return {"downsample_layers": downs, "stages": stages,
            "head": {"conv": init_conv1d(next(ks), final, cfg.vae_dim, 7,
                                         bias=cfg.conv_bias)}}


def init_vibevoice_asr(key, cfg: ModelConfig) -> dict:
    ks = iter(jax.random.split(key, 12))
    h = cfg.text.hidden_size
    return {
        "acoustic_tokenizer": {"encoder": init_tokenizer_encoder(
            next(ks), cfg.acoustic)},
        "semantic_tokenizer": {"encoder": init_tokenizer_encoder(
            next(ks), cfg.semantic)},
        "acoustic_connector": _init_connector(ks, cfg.acoustic.vae_dim, h),
        "semantic_connector": _init_connector(ks, cfg.semantic.vae_dim, h),
        "language_model": init_llama(next(ks), cfg.text),
    }


def _init_connector(ks, in_dim, out_dim) -> dict:
    return {"fc1": init_linear(next(ks), in_dim, out_dim),
            "norm": init_rms_norm(out_dim),
            "fc2": init_linear(next(ks), out_dim, out_dim)}


# ----------------------------------------------------------------- encoder

def _causal_conv(p, x, kernel, stride=1, groups=1):
    """Causal SConv1d: left pad (K-1)-(S-1), right pad to stride-align
    (reference audio_encoder.py:66-120). Output length = ceil(L/S)."""
    pt = (kernel - 1) - (stride - 1)
    length = x.shape[1]
    n_frames = (length - kernel + pt) / stride + 1
    extra = int((math.ceil(n_frames) - 1) * stride + kernel - pt - length)
    x = jnp.pad(x, ((0, 0), (pt, max(extra, 0)), (0, 0)))
    return apply_conv1d(p, x, stride=stride, groups=groups)


def tokenizer_encode(params: dict, cfg: TokenizerConfig,
                     audio: Array) -> Array:
    """(B, T) raw audio -> (B, ceil(T/hop), vae_dim), fully causal."""
    x = audio[..., None]
    ratios = cfg.rev_ratios
    depths = cfg.depths
    km = cfg.mixer_kernel
    for i in range(len(depths)):
        dp = params["downsample_layers"][str(i)]
        if i == 0:
            x = _causal_conv(dp["conv"], x, 7)
        else:
            x = _causal_conv(dp["conv"], x, 2 * ratios[i - 1],
                             stride=ratios[i - 1])
        dim = x.shape[-1]
        for j in range(depths[i]):
            blk = params["stages"][str(i)][str(j)]
            h = apply_rms_norm(blk["norm"], x, cfg.layernorm_eps)
            h = _causal_conv(blk["mixer"]["conv"]["conv"], h, km,
                             groups=dim)
            x = x + blk["gamma"] * h
            h = apply_rms_norm(blk["ffn_norm"], x, cfg.layernorm_eps)
            h = apply_linear(blk["ffn"]["linear2"], jax.nn.gelu(
                apply_linear(blk["ffn"]["linear1"], h),
                approximate=False))
            x = x + blk["ffn_gamma"] * h
    return _causal_conv(params["head"]["conv"], x, 7)


def connector_forward(p: dict, x: Array, eps: float = 1e-6) -> Array:
    x = apply_linear(p["fc1"], x)
    x = apply_rms_norm(p["norm"], x, eps)
    return apply_linear(p["fc2"], x)


def speech_token_count(n_samples: int, ratios: List[int]) -> int:
    """Output frames for causal encoding of n_samples (ceil per stage)."""
    n = n_samples
    for r in ratios:
        n = math.ceil(n / r)
    return n


# -------------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None
        self._speech_start_id = SPEECH_START_ID
        self._speech_end_id = SPEECH_END_ID
        self._speech_pad_id = SPEECH_PAD_ID

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE

    def init_params(self, key):
        return init_vibevoice_asr(key, self.config)

    # --------------------------------------------------------------- audio

    @staticmethod
    def _normalize_audio(audio: np.ndarray, target_dB_FS: float = -25.0,
                         eps: float = 1e-6) -> np.ndarray:
        rms = np.sqrt(np.mean(audio ** 2))
        scalar = 10 ** (target_dB_FS / 20) / (rms + eps)
        audio = audio * scalar
        mx = np.max(np.abs(audio))
        if mx > 1.0:
            audio = audio / (mx + eps)
        return audio

    def _preprocess_audio(self, audio, sampling_rate=None) -> np.ndarray:
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio

            wav = np.asarray(load_audio(str(audio), SAMPLE_RATE))
        else:
            wav = np.asarray(audio, np.float32).reshape(-1)
            if sampling_rate is not None and sampling_rate != SAMPLE_RATE:
                from ....utils import resample_audio

                wav = np.asarray(resample_audio(wav, sampling_rate,
                                                SAMPLE_RATE))
            wav = self._normalize_audio(wav)
        max_samples = MAX_DURATION_SECONDS * SAMPLE_RATE
        if wav.shape[-1] > max_samples:
            print(f"[WARNING] audio exceeds 59 min; trimming "
                  f"({wav.shape[-1] / SAMPLE_RATE / 60:.1f} min)")
            wav = wav[:max_samples]
        return wav.astype(np.float32)

    def encode_speech(self, wav: np.ndarray) -> np.ndarray:
        """(T,) raw 24 kHz audio -> (n_tokens, hidden) on the host."""
        cfg = self.config
        t = wav.shape[-1]
        tb = _bucket(t, SAMPLE_BUCKETS)
        fn = self._jit_cache.get(("tower", tb))
        if fn is None:
            def full(p, audio):
                ac = tokenizer_encode(p["acoustic_tokenizer"]["encoder"],
                                      cfg.acoustic, audio)
                se = tokenizer_encode(p["semantic_tokenizer"]["encoder"],
                                      cfg.semantic, audio)
                return (connector_forward(p["acoustic_connector"], ac)
                        + connector_forward(p["semantic_connector"], se))

            fn = jax.jit(full)
            self._jit_cache[("tower", tb)] = fn
        buf = np.zeros((1, tb), np.float32)
        buf[0, :t] = wav
        out = fn(self.params, jnp.asarray(buf))
        n_tok = speech_token_count(t, cfg.acoustic.encoder_ratios)
        # causal pyramid: bucket right-pad cannot affect the valid prefix
        return np.asarray(out[0, :n_tok])

    # ------------------------------------------------------------- prompt

    def _build_prompt_ids(self, n_speech: int, audio_duration: float,
                          context: Optional[str]) -> List[int]:
        system_prompt = ("You are a helpful assistant that transcribes "
                         "audio input into text output in JSON format.")
        show_keys = ["Start time", "End time", "Speaker ID", "Content"]
        if context and context.strip():
            suffix = (f"This is a {audio_duration:.2f} seconds audio, "
                      f"with extra info: {context.strip()}\n\n"
                      "Please transcribe it with these keys: "
                      + ", ".join(show_keys))
        else:
            suffix = (f"This is a {audio_duration:.2f} seconds audio, "
                      "please transcribe it with these keys: "
                      + ", ".join(show_keys))
        tok = self.tokenizer
        if tok is not None:
            content = ("<|object_ref_start|>"
                       + "<|box_start|>" * n_speech
                       + "<|object_ref_end|>\n" + suffix)
            messages = [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": content}]
            text = tok.apply_chat_template(messages, tokenize=False,
                                           add_generation_prompt=True)
            return list(tok.encode(text))
        return ([self._speech_start_id]
                + [self._speech_pad_id] * n_speech
                + [self._speech_end_id])

    # -------------------------------------------------------------- decode

    def _lm_fns(self, pb: int, max_tokens: int,
                repetition_penalty: float,
                sampling: Tuple = (0.0, 0, 1.0, 0.0, 20, 1)):
        key_ = ("lm", pb, max_tokens, repetition_penalty, sampling)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        from ....ops.sampling import make_sampler

        (temperature, top_k, top_p, min_p, repetition_context_size,
         min_tokens_to_keep) = sampling
        sampler = make_sampler(temperature=temperature, top_k=top_k,
                               top_p=top_p, min_p=min_p,
                               min_tokens_to_keep=min_tokens_to_keep)
        t = self.config.text
        cap = pb + max_tokens
        eos = jnp.asarray(EOS_IDS, jnp.int32)

        def prefill(p, embeds, length):
            caches = init_caches(t, 1, cap, dtype=jnp.float32)
            pad = jnp.where(jnp.arange(cap)[None] < length, 0.0,
                            -jnp.inf)
            hidden, caches = llama_forward(p["language_model"], t,
                                           embeds, caches=caches,
                                           offset=0, mask=pad)
            lg = logits_from_hidden(
                p["language_model"], t,
                hidden[jnp.arange(1), length - 1][:, None])[:, 0]
            return lg, caches

        def decode(p, lg, caches, plen, rng):
            toks0 = jnp.full((max_tokens,), -1, jnp.int32)
            hist0 = jnp.full(
                (1, max(REP_CONTEXT, repetition_context_size)), -1,
                jnp.int32)

            def cond(st):
                i, done = st[0], st[-1]
                return jnp.logical_and(i < max_tokens,
                                       jnp.logical_not(done))

            def body(st):
                i, lg, caches, toks, hist, rng, done = st
                if repetition_penalty != 1.0:
                    lg = apply_repetition_penalty(lg, hist,
                                                  repetition_penalty)
                if temperature > 0.0:
                    rng, sub = jax.random.split(rng)
                    tok = sampler(sub, lg)[0]
                else:
                    tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)[0]
                is_eos = jnp.any(tok == eos)
                toks = jnp.where(is_eos, toks, toks.at[i].set(tok))
                hist = jnp.roll(hist, -1, axis=-1).at[:, -1].set(tok)
                emb = apply_embedding(
                    p["language_model"]["model"]["embed_tokens"],
                    tok[None, None])
                hidden, caches = llama_forward(
                    p["language_model"], t, emb, caches=caches,
                    offset=plen + i)
                lg2 = logits_from_hidden(p["language_model"], t,
                                         hidden)[:, -1]
                return (i + 1, lg2, caches, toks, hist, rng,
                        jnp.logical_or(done, is_eos))

            _, _, _, toks, _, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), lg, caches, toks0, hist0,
                             rng, jnp.bool_(False)))
            return toks

        fns = (jax.jit(prefill), jax.jit(decode))
        self._jit_cache[key_] = fns
        return fns

    def _prepare(self, audio, context, sampling_rate):
        wav = self._preprocess_audio(audio, sampling_rate)
        feats = self.encode_speech(wav)
        duration = wav.shape[-1] / SAMPLE_RATE
        ids = self._build_prompt_ids(feats.shape[0], duration, context)
        n = len(ids)
        pb = _bucket(n, PROMPT_BUCKETS)
        tok_arr = np.zeros((1, pb), np.int32)
        tok_arr[0, :n] = ids
        safe = np.where(tok_arr >= self.config.text.vocab_size, 0,
                        tok_arr)
        embeds = np.array(apply_embedding(
            self.params["language_model"]["model"]["embed_tokens"],
            jnp.asarray(safe)))
        pos = np.where(tok_arr[0, :n] == self._speech_pad_id)[0]
        m = min(len(pos), feats.shape[0])
        embeds[0, pos[:m]] = feats[:m]
        return ids, pb, embeds

    def generate(self, audio, *, context: Optional[str] = None,
                 sampling_rate: Optional[int] = None,
                 max_tokens: int = 8192,
                 repetition_penalty: Optional[float] = 1.0,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0,
                 repetition_context_size: int = 20,
                 min_tokens_to_keep: int = 1, seed: int = 0,
                 verbose: bool = False, **kwargs) -> STTOutput:
        t0 = time.time()
        ids, pb, embeds = self._prepare(audio, context, sampling_rate)
        n = len(ids)
        rp = float(repetition_penalty or 1.0)
        sampling = (float(temperature), int(top_k), float(top_p),
                    float(min_p), int(repetition_context_size),
                    int(min_tokens_to_keep))
        prefill, decode = self._lm_fns(pb, max_tokens, rp, sampling)
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.int32(n))
        toks = np.asarray(decode(self.params, lg, caches, jnp.int32(n),
                                 jax.random.PRNGKey(seed)))
        generated = [int(x) for x in toks[toks >= 0]]
        text = (self.tokenizer.decode(generated,
                                      skip_special_tokens=True)
                if self.tokenizer is not None
                else " ".join(map(str, generated)))
        segments = self.parse_transcription(text)
        dt = time.time() - t0
        if verbose:
            print(text)
        return STTOutput(
            text=text.strip(), segments=segments, prompt_tokens=n,
            generation_tokens=len(generated),
            total_tokens=n + len(generated), total_time=dt,
            prompt_tps=n / dt if dt > 0 else 0.0,
            generation_tps=len(generated) / dt if dt > 0 else 0.0)

    __call__ = generate

    def stream_transcribe(self, audio, *, context: Optional[str] = None,
                          sampling_rate: Optional[int] = None,
                          max_tokens: int = 8192, **kwargs
                          ) -> Generator[str, None, None]:
        """Token-at-a-time streaming via a jitted single decode step."""
        ids, pb, embeds = self._prepare(audio, context, sampling_rate)
        n = len(ids)
        prefill, _ = self._lm_fns(pb, 1, 1.0)
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.int32(n))
        t = self.config.text
        step = self._jit_cache.get("stream_step")
        if step is None:
            def step_fn(p, tok, caches, off):
                emb = apply_embedding(
                    p["language_model"]["model"]["embed_tokens"], tok)
                hidden, caches = llama_forward(p["language_model"], t,
                                               emb, caches=caches,
                                               offset=off)
                return logits_from_hidden(p["language_model"], t,
                                          hidden)[:, -1], caches

            step = jax.jit(step_fn)
            self._jit_cache["stream_step"] = step
        for i in range(max_tokens):
            tok = int(np.asarray(jnp.argmax(lg, axis=-1))[0])
            if tok in EOS_IDS:
                break
            yield (self.tokenizer.decode([tok])
                   if self.tokenizer is not None else str(tok))
            lg, caches = step(self.params,
                              jnp.asarray([[tok]], jnp.int32), caches,
                              jnp.int32(n + i))

    # ------------------------------------------------------------- parsing

    @staticmethod
    def parse_transcription(text: str) -> List[Dict[str, Any]]:
        """Parse the model's structured JSON output into segments."""
        try:
            if "```json" in text:
                s = text.find("```json") + 7
                e = text.find("```", s)
                json_str = text[s:e].strip()
            else:
                s = text.find("[")
                if s == -1:
                    s = text.find("{")
                if s != -1:
                    depth = 0
                    e = s
                    for i in range(s, len(text)):
                        if text[i] in "[{":
                            depth += 1
                        elif text[i] in "]}":
                            depth -= 1
                            if depth == 0:
                                e = i + 1
                                break
                    json_str = text[s:e]
                else:
                    json_str = text
            result = json.loads(json_str)
            if isinstance(result, dict):
                result = [result]
            key_map = {"Start time": "start", "Start": "start",
                       "End time": "end", "End": "end",
                       "Speaker ID": "speaker_id",
                       "Speaker": "speaker_id", "Content": "text"}
            segments = []
            for item in result:
                if isinstance(item, dict):
                    seg = {nk: item[ok] for ok, nk in key_map.items()
                           if ok in item}
                    if seg:
                        segments.append(seg)
            return segments
        except Exception:
            return []

    # ------------------------------------------------------------- loading

    def model_quant_predicate(self, path: str, leaf) -> bool:
        return path.startswith("language_model")

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        already = not any(k.startswith("model.") for k in weights)
        for k, v in weights.items():
            if k.startswith("model."):
                k = k[6:]
            if "acoustic_tokenizer.decoder" in k or "position_ids" in k \
                    or "fix_std" in k:
                continue
            if ".downsample_layers." in k:
                k = re.sub(r"\.downsample_layers\.(\d+)\.0\.conv\.conv\.",
                           r".downsample_layers.\1.conv.", k)
            elif ".head.conv.conv." in k:
                k = k.replace(".head.conv.conv.", ".head.conv.")
            elif ".mixer.conv.conv.conv." in k:
                k = k.replace(".mixer.conv.conv.conv.",
                              ".mixer.conv.conv.")
            if k.startswith("language_model.layers."):
                k = "language_model.model." + k[len("language_model."):]
            elif k.startswith("language_model.embed_tokens"):
                k = ("language_model.model.embed_tokens"
                     + k[len("language_model.embed_tokens"):])
            elif k.startswith("language_model.norm"):
                k = ("language_model.model.norm"
                     + k[len("language_model.norm"):])
            if k.startswith("lm_head."):
                k = "language_model." + k
            v = jnp.asarray(v)
            if not already and "conv" in k.lower() and "weight" in k \
                    and v.ndim == 3:
                v = jnp.transpose(v, (2, 1, 0))       # torch OIK -> KIO
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(str(model_path),
                                                trust_remote_code=True)
            tok.chat_template = (
                "{% for message in messages %}"
                "{{'<|im_start|>' + message['role'] + '\\n' + "
                "message['content'] + '<|im_end|>' + '\\n'}}"
                "{% endfor %}"
                "{% if add_generation_prompt %}"
                "{{ '<|im_start|>assistant\\n' }}{% endif %}")
            model.tokenizer = tok
            model._speech_start_id = tok.convert_tokens_to_ids(
                "<|object_ref_start|>")
            model._speech_end_id = tok.convert_tokens_to_ids(
                "<|object_ref_end|>")
            model._speech_pad_id = tok.convert_tokens_to_ids(
                "<|box_start|>")
        except Exception:
            model.tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "tokenizer_encode",
           "speech_token_count", "init_vibevoice_asr"]
