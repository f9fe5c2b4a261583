"""Granite Speech: conformer CTC encoder + Q-Former projector + Granite LM.

Parity: /root/reference/mlx_audio/stt/models/granite_speech/
granite_speech.py (block-local Shaw rel-pos attention :92-144, asymmetric
depthwise conv module :147-185, mid-layer CTC softmax re-injection
:207-232, BLIP-2 Q-Former projector :235-418, Granite LM w/ embedding/
residual/attention multipliers + logits scaling :420-470, 2-frame-stacked
mel features :525-580, chat-template audio splice :582-620) and config.py.

TPU design: the encoder is one bucketed jitted forward (block-local
attention is reshape-batched over (B*nblocks, C) rows — no (S, S) mask);
the projector's window-local Q-Former rides the same jit. The LM reuses
the shared llama backbone (granite multipliers are backbone config no-ops
for other models) and the whole greedy decode is one compiled while_loop.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Generator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention
from ....tts.models.llama.llama import (
    ModelConfig as LlamaConfig,
    decode_step,
    init_caches,
    init_llama,
    llama_forward,
    logits_from_hidden,
)
from ...models.base import STTOutput

Array = jax.Array

# encoder-frame buckets (multiples of context_size=200; one frame = 20 ms)
ENC_BUCKETS = (200, 400, 800, 1600, 3200)
PROMPT_BUCKETS = (256, 512, 1024, 2048, 4096)

LANGUAGE_CODES = {
    "en": "English", "fr": "French", "de": "German", "es": "Spanish",
    "pt": "Portuguese", "ja": "Japanese",
}


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@dataclass
class StreamingResult:
    text: str
    is_final: bool
    start_time: float
    end_time: float
    language: str = "en"
    prompt_tokens: int = 0
    generation_tokens: int = 0


@dataclass
class EncoderConfig(BaseModelArgs):
    input_dim: int = 160
    num_layers: int = 10
    hidden_dim: int = 1024
    feedforward_mult: int = 4
    num_heads: int = 8
    dim_head: int = 128
    output_dim: int = 42
    context_size: int = 200
    max_pos_emb: int = 512
    conv_kernel_size: int = 15
    conv_expansion_factor: int = 2


@dataclass
class ProjectorConfig(BaseModelArgs):
    hidden_size: int = 1024
    num_hidden_layers: int = 2
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-12
    encoder_hidden_size: int = 1024


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "granite_speech"
    encoder_config: Optional[dict] = None
    projector_config: Optional[dict] = None
    text_config: Optional[dict] = None
    audio_token_index: int = 100352
    downsample_rate: int = 5
    window_size: int = 15
    has_lora_adapter: bool = False
    model_path: str = ""

    def __post_init__(self):
        self.enc = EncoderConfig.from_dict(self.encoder_config or {})
        self.proj = ProjectorConfig.from_dict(self.projector_config or {})
        self.text = LlamaConfig.from_dict(self.text_config or {})


# ------------------------------------------------------------------- init

def init_granite_speech(key, cfg: ModelConfig) -> dict:
    e, pj = cfg.enc, cfg.proj
    ks = iter(jax.random.split(
        key, 32 + 16 * (e.num_layers + pj.num_hidden_layers)))
    dm, inner = e.hidden_dim, e.dim_head * e.num_heads
    cdim = e.hidden_dim * e.conv_expansion_factor
    layers = {}
    for i in range(e.num_layers):
        layers[str(i)] = {
            "ff1": _init_ff(ks, e),
            "attn": {
                "pre_norm": init_layer_norm(dm),
                "to_q": init_linear(next(ks), dm, inner, bias=False),
                "to_kv": init_linear(next(ks), dm, inner * 2, bias=False),
                "to_out": init_linear(next(ks), inner, dm),
                "rel_pos_emb": init_embedding(
                    next(ks), 2 * e.max_pos_emb + 1, e.dim_head)},
            "conv": {
                "norm": init_layer_norm(dm),
                "up_conv": init_conv1d(next(ks), dm, cdim * 2, 1),
                "depth_conv": {"conv": init_conv1d(
                    next(ks), cdim, cdim, e.conv_kernel_size,
                    groups=cdim, bias=False)},
                "batch_norm": {
                    "weight": jnp.ones((cdim,)), "bias": jnp.zeros((cdim,)),
                    "running_mean": jnp.zeros((cdim,)),
                    "running_var": jnp.ones((cdim,))},
                "down_conv": init_conv1d(next(ks), cdim, dm, 1)},
            "ff2": _init_ff(ks, e),
            "post_norm": init_layer_norm(dm),
        }
    qlayers = {}
    for i in range(pj.num_hidden_layers):
        qlayers[str(i)] = {
            "attention": _init_qattn(ks, pj.hidden_size,
                                     pj.hidden_size),
            "crossattention": _init_qattn(ks, pj.hidden_size,
                                          pj.encoder_hidden_size),
            "intermediate_query": {"dense": init_linear(
                next(ks), pj.hidden_size, pj.intermediate_size)},
            "output_query": {
                "dense": init_linear(next(ks), pj.intermediate_size,
                                     pj.hidden_size),
                "LayerNorm": init_layer_norm(pj.hidden_size)},
        }
    nq = cfg.window_size // cfg.downsample_rate
    return {
        "encoder": {
            "input_linear": init_linear(next(ks), e.input_dim, dm),
            "layers": layers,
            "out": init_linear(next(ks), dm, e.output_dim),
            "out_mid": init_linear(next(ks), e.output_dim, dm)},
        "projector": {
            "query": jnp.zeros((1, nq, pj.hidden_size)),
            "qformer": {"layernorm": init_layer_norm(pj.hidden_size),
                        "encoder": {"layer": qlayers}},
            "linear": init_linear(next(ks), pj.hidden_size,
                                  cfg.text.hidden_size)},
        "language_model": init_llama(next(ks), cfg.text),
    }


def _init_ff(ks, e):
    return {"pre_norm": init_layer_norm(e.hidden_dim),
            "up_proj": init_linear(next(ks), e.hidden_dim,
                                   e.hidden_dim * e.feedforward_mult),
            "down_proj": init_linear(next(ks),
                                     e.hidden_dim * e.feedforward_mult,
                                     e.hidden_dim)}


def _init_qattn(ks, hidden, kv_dim):
    return {"attention": {"query": init_linear(next(ks), hidden, hidden),
                          "key": init_linear(next(ks), kv_dim, hidden),
                          "value": init_linear(next(ks), kv_dim, hidden)},
            "output": {"dense": init_linear(next(ks), hidden, hidden),
                       "LayerNorm": init_layer_norm(hidden)}}


# ----------------------------------------------------------------- encoder

def _ff(p, x):
    h = apply_layer_norm(p["pre_norm"], x)
    return apply_linear(p["down_proj"],
                        jax.nn.silu(apply_linear(p["up_proj"], h)))


def _block_attn(p, e: EncoderConfig, x, col_valid):
    """Block-local attention with Shaw rel-pos inside context_size blocks.

    x (B, N, D) with N a multiple of context_size; col_valid (nb, C) bool.
    """
    b, n, _ = x.shape
    C, H, dh = e.context_size, e.num_heads, e.dim_head
    nb = n // C
    xn = apply_layer_norm(p["pre_norm"], x)
    q = apply_linear(p["to_q"], xn)
    k, v = jnp.split(apply_linear(p["to_kv"], xn), 2, axis=-1)
    q = q.reshape(b, nb, C, H, dh).transpose(0, 1, 3, 2, 4)
    k = k.reshape(b, nb, C, H, dh).transpose(0, 1, 3, 2, 4)
    v = v.reshape(b, nb, C, H, dh).transpose(0, 1, 3, 2, 4)
    dists = np.clip(np.arange(C)[:, None] - np.arange(C)[None, :],
                    -e.context_size, e.context_size) + e.max_pos_emb
    rel = p["rel_pos_emb"]["weight"][jnp.asarray(dists)]     # (C, C, dh)
    scale = dh ** -0.5
    pos_attn = jnp.einsum("bnhcd,ckd->bnhck", q, rel) * scale
    scores = (q @ k.transpose(0, 1, 2, 4, 3)) * scale + pos_attn
    add = jnp.where(col_valid, 0.0, -1e9)[None, :, None, None, :]
    w = jax.nn.softmax((scores + add).astype(jnp.float32),
                       axis=-1).astype(x.dtype)
    o = (w @ v).transpose(0, 1, 3, 2, 4).reshape(b, n, H * dh)
    return apply_linear(p["to_out"], o)


def _conv_mod(p, e: EncoderConfig, x, pos_mask):
    h = apply_layer_norm(p["norm"], x)
    h = apply_conv1d(p["up_conv"], h)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)
    if pos_mask is not None:
        # zero bucket-pad positions: the depthwise conv then sees exactly
        # the implicit zero padding of the reference's unpadded run
        h = h * pos_mask
    ksz = e.conv_kernel_size
    pad = ksz // 2
    h = apply_conv1d(p["depth_conv"]["conv"], h,
                     padding=(pad, pad - (ksz + 1) % 2),
                     groups=h.shape[-1])
    bn = p["batch_norm"]
    h = (h - bn["running_mean"]) * jax.lax.rsqrt(
        bn["running_var"] + 1e-5) * bn["weight"] + bn["bias"]
    h = jax.nn.silu(h)
    return apply_conv1d(p["down_conv"], h)


def encoder_forward(params: dict, cfg: ModelConfig, feats: Array,
                    valid_frames: Optional[Array] = None) -> Array:
    """(B, N, input_dim) stacked features -> (B, N, hidden_dim).

    N must be a multiple of context_size. valid_frames masks bucket pad.
    """
    e = cfg.enc
    p = params["encoder"]
    b, n, _ = feats.shape
    nb = n // e.context_size
    x = apply_linear(p["input_linear"], feats)
    col_valid = jnp.ones((nb, e.context_size), bool)
    pos_mask = None
    if valid_frames is not None:
        g = jnp.arange(n).reshape(nb, e.context_size)
        col_valid = g < valid_frames
        pos_mask = (jnp.arange(n) < valid_frames)[None, :, None] \
            .astype(x.dtype)
    for idx in range(1, e.num_layers + 1):
        lp = p["layers"][str(idx - 1)]
        x = 0.5 * _ff(lp["ff1"], x) + x
        x = _block_attn(lp["attn"], e, x, col_valid) + x
        x = _conv_mod(lp["conv"], e, x, pos_mask) + x
        x = 0.5 * _ff(lp["ff2"], x) + x
        x = apply_layer_norm(lp["post_norm"], x)
        if idx == e.num_layers // 2:
            x_mid = apply_linear(p["out"], x)
            x = x + apply_linear(p["out_mid"],
                                 jax.nn.softmax(x_mid, axis=-1))
    return x


# --------------------------------------------------------------- projector

def qformer_attention(p, x, kv, num_heads):
    a = p["attention"]
    b, l, d = x.shape
    dh = d // num_heads
    q = apply_linear(a["query"], x).reshape(b, l, num_heads, dh)
    k = apply_linear(a["key"], kv).reshape(b, -1, num_heads, dh)
    v = apply_linear(a["value"], kv).reshape(b, -1, num_heads, dh)
    o = attention(q, k, v).reshape(b, l, d)
    o = apply_linear(p["output"]["dense"], o)
    return apply_layer_norm(p["output"]["LayerNorm"], o + x, eps=1e-12)


def projector_forward(params: dict, cfg: ModelConfig,
                      enc_out: Array) -> Array:
    """(B, L, D) encoder output (L multiple of window_size) ->
    (B, L/window*num_queries, lm_hidden)."""
    pj = cfg.proj
    p = params["projector"]
    b, l, d = enc_out.shape
    w = cfg.window_size
    nblocks = l // w
    nq = w // cfg.downsample_rate
    windows = enc_out.reshape(b * nblocks, w, d)
    x = jnp.broadcast_to(p["query"], (b * nblocks, nq, pj.hidden_size))
    x = apply_layer_norm(p["qformer"]["layernorm"], x, eps=1e-12)
    for i in range(pj.num_hidden_layers):
        lp = p["qformer"]["encoder"]["layer"][str(i)]
        x = qformer_attention(lp["attention"], x, x,
                              pj.num_attention_heads)
        x = qformer_attention(lp["crossattention"], x, windows,
                              pj.num_attention_heads)
        h = jax.nn.gelu(apply_linear(lp["intermediate_query"]["dense"], x),
                        approximate=False)
        h = apply_linear(lp["output_query"]["dense"], h)
        x = apply_layer_norm(lp["output_query"]["LayerNorm"], h + x,
                             eps=1e-12)
    x = x.reshape(b, nblocks * nq, pj.hidden_size)
    return apply_linear(p["linear"], x)


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
        return 16000

    def init_params(self, key):
        return init_granite_speech(key, self.config)

    # ----------------------------------------------------------- features

    def _extract_features(self, audio) -> Tuple[np.ndarray, int]:
        """Audio -> ((T, 160) stacked log-mel, num_audio_tokens)."""
        from ....dsp import hanning, mel_filters, spec_abs, stft

        wav = jnp.asarray(np.asarray(audio, np.float32).reshape(-1))
        n_fft, win_length, hop = 512, 400, 160
        n_mels = self.config.enc.input_dim // 2     # 160 -> 80 mel bins
        win = hanning(win_length, periodic=True)
        pad_l = (n_fft - win_length) // 2
        win = jnp.concatenate([jnp.zeros(pad_l), win,
                               jnp.zeros(n_fft - win_length - pad_l)])
        spec = stft(wav, n_fft=n_fft, hop_length=hop, window=win,
                    center=True, pad_mode="reflect")
        power = spec_abs(spec) ** 2
        fb = mel_filters(16000, n_fft, n_mels, mel_scale="htk")
        logmel = jnp.log10(jnp.clip(power @ fb.T, 1e-10, None))
        logmel = jnp.maximum(logmel, logmel.max() - 8.0) / 4.0 + 1.0
        logmel = np.asarray(logmel)
        if logmel.shape[0] % 2 == 1:
            logmel = logmel[:-1]
        feats = logmel.reshape(-1, 2 * n_mels)
        nblocks = math.ceil(feats.shape[0] / self.config.window_size)
        nq = self.config.window_size // self.config.downsample_rate
        return feats.astype(np.float32), nblocks * nq

    # ------------------------------------------------------- audio embeds

    def get_audio_features(self, feats: np.ndarray) -> np.ndarray:
        """(T, 160) -> (num_audio_tokens, lm_hidden) on the host."""
        cfg = self.config
        t = feats.shape[0]
        tb = _bucket(t, ENC_BUCKETS)
        fn = self._jit_cache.get(("tower", tb))
        if fn is None:
            w = cfg.window_size

            def full(p, feats, valid):
                enc = encoder_forward(p, cfg, feats, valid)
                enc = enc * (jnp.arange(enc.shape[1])[None, :, None]
                             < valid)
                pad = (-enc.shape[1]) % w
                enc = jnp.pad(enc, ((0, 0), (0, pad), (0, 0)))
                return projector_forward(p, cfg, enc)

            fn = jax.jit(full)
            self._jit_cache[("tower", tb)] = fn
        buf = np.zeros((1, tb, feats.shape[1]), np.float32)
        buf[0, :t] = feats
        out = fn(self.params, jnp.asarray(buf), jnp.int32(t))
        nblocks = math.ceil(t / cfg.window_size)
        nq = cfg.window_size // cfg.downsample_rate
        return np.asarray(out[0, : nblocks * nq])

    # -------------------------------------------------------------- prompt

    def _build_prompt_ids(self, n_audio: int,
                          prompt: Optional[str]) -> List[int]:
        user_prompt = prompt or \
            "can you transcribe the speech into a written format?"
        content = "<|audio|>" * n_audio + user_prompt
        tok = self._tokenizer
        if tok is not None and getattr(tok, "chat_template", None):
            text = tok.apply_chat_template(
                [{"role": "user", "content": content}], tokenize=False,
                add_generation_prompt=True)
            return list(tok.encode(text))
        if tok is not None:
            return list(tok.encode(f"USER: {content}\nASSISTANT:"))
        return [self.config.audio_token_index] * n_audio

    def _splice_embeds(self, ids: List[int], audio_feats: np.ndarray,
                       pb: int) -> np.ndarray:
        cfg = self.config
        n = len(ids)
        tok_arr = np.zeros((1, pb), np.int32)
        tok_arr[0, :n] = ids
        safe = np.where(tok_arr >= cfg.text.vocab_size, 0, tok_arr)
        embeds = np.array(apply_embedding(
            self.params["language_model"]["model"]["embed_tokens"],
            jnp.asarray(safe)))
        pos = np.where(tok_arr[0, :n] == cfg.audio_token_index)[0]
        m = min(len(pos), audio_feats.shape[0])
        embeds[0, pos[:m]] = audio_feats[:m]
        return embeds

    # -------------------------------------------------------------- decode

    def _lm_fns(self, pb: int, max_tokens: int, eos_ids: Tuple[int, ...],
                sampling: Tuple = (0.0, 0, 1.0, 0.0, 1.0, 20, 1)):
        key_ = ("lm", pb, max_tokens, eos_ids, sampling)
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
        eos = jnp.asarray(eos_ids, jnp.int32)

        def prefill(p, embeds, length):
            caches = init_caches(t, 1, cap, dtype=jnp.float32)
            pad = jnp.where(jnp.arange(cap)[None] < length, 0.0, -jnp.inf)
            hidden, caches = llama_forward(p["language_model"], t, embeds,
                                           caches=caches, offset=0,
                                           mask=pad)
            lg = logits_from_hidden(
                p["language_model"], t,
                hidden[jnp.arange(1), length - 1][:, None])[:, 0]
            return lg, caches

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
                lg2, caches = decode_step(p["language_model"], t,
                                          tok[None, None], caches,
                                          plen + i)
                return (i + 1, lg2, caches, toks, hist, rng,
                        jnp.logical_or(done, is_eos))

            _, _, _, toks, _, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), lg, caches, toks0, init_hist(),
                             rng, jnp.bool_(False)))
            return toks

        fns = (jax.jit(prefill), jax.jit(decode))
        self._jit_cache[key_] = fns
        return fns

    def _eos_ids(self) -> Tuple[int, ...]:
        tok = self._tokenizer
        if tok is not None and tok.eos_token_id is not None:
            return (int(tok.eos_token_id),)
        return (0,)

    def _prepare(self, audio, prompt):
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio

            audio = np.asarray(load_audio(str(audio), 16000))
        elif isinstance(audio, list):
            a0 = audio[0]
            if isinstance(a0, (str, Path)):
                from ...utils import load_audio

                a0 = load_audio(str(a0), 16000)
            audio = np.asarray(a0)
        feats, n_audio = self._extract_features(audio)
        audio_feats = self.get_audio_features(feats)
        ids = self._build_prompt_ids(n_audio, prompt)
        pb = _bucket(len(ids), PROMPT_BUCKETS)
        embeds = self._splice_embeds(ids, audio_feats, pb)
        return ids, pb, embeds

    def generate(self, audio, *, max_tokens: int = 448,
                 prompt: Optional[str] = None,
                 language: Optional[str] = None, stream: bool = False,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0,
                 repetition_context_size: int = 20,
                 min_tokens_to_keep: int = 1, seed: int = 0,
                 verbose: bool = False, **kwargs
                 ) -> Union[STTOutput, Generator]:
        if prompt is None and language is not None:
            name = LANGUAGE_CODES.get(language.lower(), language)
            prompt = f"Translate the speech to {name}."
        if stream:
            return self._stream_generate(audio, prompt=prompt,
                                         max_tokens=max_tokens)
        t0 = time.time()
        ids, pb, embeds = self._prepare(audio, prompt)
        n = len(ids)
        sampling = (float(temperature), int(top_k), float(top_p),
                    float(min_p), float(repetition_penalty),
                    int(repetition_context_size), int(min_tokens_to_keep))
        prefill, decode = self._lm_fns(pb, max_tokens, self._eos_ids(),
                                       sampling)
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.int32(n))
        toks = np.asarray(decode(self.params, lg, caches, jnp.int32(n),
                                 jax.random.PRNGKey(seed)))
        generated = [int(x) for x in toks[toks >= 0]]
        text = (self._tokenizer.decode(generated,
                                       skip_special_tokens=True)
                if self._tokenizer is not None
                else " ".join(map(str, generated)))
        dt = time.time() - t0
        if verbose:
            print(text)
        return STTOutput(
            text=text, segments=[], prompt_tokens=n,
            generation_tokens=len(generated),
            total_tokens=n + len(generated), total_time=round(dt, 3),
            prompt_tps=n / dt if dt else 0.0,
            generation_tps=len(generated) / dt if dt else 0.0)

    __call__ = generate

    def _stream_generate(self, audio, *, prompt=None, max_tokens=448
                         ) -> Generator[StreamingResult, None, None]:
        """Token-at-a-time streaming: prefill compiled once, then one
        jitted decode step per yielded token."""
        ids, pb, embeds = self._prepare(audio, prompt)
        n = len(ids)
        prefill, _ = self._lm_fns(pb, 1, self._eos_ids())
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.int32(n))
        t = self.config.text
        step_key = ("stream_step", pb)
        step = self._jit_cache.get(step_key)
        if step is None:
            step = jax.jit(lambda p, tok, caches, off: decode_step(
                p["language_model"], t, tok, caches, off))
            self._jit_cache[step_key] = step
        eos = set(self._eos_ids())
        count = 0
        for i in range(max_tokens):
            tok = int(np.asarray(jnp.argmax(lg, axis=-1))[0])
            if tok in eos:
                break
            count += 1
            text = (self._tokenizer.decode([tok],
                                           skip_special_tokens=True)
                    if self._tokenizer is not None else str(tok))
            yield StreamingResult(text=text, is_final=False,
                                  start_time=0.0, end_time=0.0,
                                  prompt_tokens=n,
                                  generation_tokens=count)
            lg, caches = step(self.params,
                              jnp.asarray([[tok]], jnp.int32), caches,
                              jnp.int32(n + i))
        yield StreamingResult(text="", is_final=True, start_time=0.0,
                              end_time=0.0, prompt_tokens=n,
                              generation_tokens=count)

    # ------------------------------------------------------------- loading

    def model_quant_predicate(self, path: str, leaf) -> bool:
        return path.startswith("language_model")

    def sanitize(self, weights: Dict) -> Dict:
        already = any("scales" in k for k in weights)
        out = {}
        for k, v in weights.items():
            if "num_batches_tracked" in k:
                continue
            v = jnp.asarray(v)
            if (not already and v.ndim == 3 and k.endswith("weight")
                    and any(s in k for s in ("up_conv", "down_conv",
                                             "depth_conv"))):
                v = jnp.transpose(v, (2, 1, 0))       # torch OIK -> KIO
            if k.endswith("rotary_emb.inv_freq"):
                continue
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer

            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path), trust_remote_code=True)
        except Exception:
            model._tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "encoder_forward", "projector_forward",
           "init_granite_speech"]
