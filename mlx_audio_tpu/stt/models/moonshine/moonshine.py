"""Moonshine: low-latency encoder-decoder ASR on raw waveforms.

Parity: reference mlx_audio/stt/models/moonshine/moonshine.py — raw-audio
conv stem (tanh conv 127/64 -> GroupNorm(1) -> gelu convs 7/3 and 3/2,
:269-288), partial interleaved RoPE (:34-58, HF Moonshine semantics),
GQA-capable attention (:61-148), gated-SiLU decoder MLP (:162-172),
pre-norm layers, tied embeddings / proj_out logits (:342-346), greedy
decode to EOS (:348-430) and the `model.` prefix + conv-layout sanitize
(:437-456).

TPU design: the encoder is one jitted bucketed program over raw-sample
lengths (the stem's GroupNorm(1) normalizes over channels AND time, so it
is computed over valid frames only and padding re-zeroed — padded buckets
match tight lengths exactly). The decoder runs entirely inside one
`lax.while_loop`: fixed-capacity self-attention KV caches updated by
`dynamic_update_slice`, cross-attention K/V precomputed once from the
encoder output, greedy argmax with an in-graph EOS stop — one compile,
zero per-token host round-trips.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_embedding, apply_layer_norm,
                    apply_linear, init_conv1d, init_embedding,
                    init_layer_norm, init_linear)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope_interleaved
from ..base import STTOutput

Array = jax.Array


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "moonshine"
    vocab_size: int = 32768
    hidden_size: int = 288
    intermediate_size: int = 1152
    encoder_num_hidden_layers: int = 6
    decoder_num_hidden_layers: int = 6
    encoder_num_attention_heads: int = 8
    decoder_num_attention_heads: int = 8
    encoder_num_key_value_heads: Optional[int] = None
    decoder_num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 512
    attention_bias: bool = False
    partial_rotary_factor: float = 0.9
    rope_theta: float = 10000.0
    bos_token_id: int = 1
    eos_token_id: int = 2
    decoder_start_token_id: int = 1
    tie_word_embeddings: bool = True

    def __post_init__(self):
        if self.encoder_num_key_value_heads is None:
            self.encoder_num_key_value_heads = \
                self.encoder_num_attention_heads
        if self.decoder_num_key_value_heads is None:
            self.decoder_num_key_value_heads = \
                self.decoder_num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.encoder_num_attention_heads

    def inv_freq(self) -> jnp.ndarray:
        # HF semantics: dim may be odd (head_dim * factor truncated); the
        # exponent divisor stays odd while the applied rotary span is
        # 2 * len(inv_freq). (The MLX reference rounds dim down to even —
        # moonshine.py:78-79 — which diverges from HF for odd dims; real
        # checkpoints have even dims where both agree.)
        dim = int(self.head_dim * self.partial_rotary_factor)
        return 1.0 / (self.rope_theta **
                      (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))


AUDIO_BUCKETS = (16000, 48000, 160000, 480000)


def _bucket(n: int) -> int:
    for b in AUDIO_BUCKETS:
        if n <= b:
            return b
    return ((n + 159999) // 160000) * 160000


def encoder_frames(n: int) -> int:
    n = (n - 127) // 64 + 1
    n = (n - 7) // 3 + 1
    return (n - 3) // 2 + 1


# ----------------------------------------------------------------- init

def _init_attn(ks, cfg: ModelConfig, heads: int, kv_heads: int) -> dict:
    h = cfg.hidden_size
    hd = cfg.head_dim
    return {"q_proj": init_linear(next(ks), h, heads * hd,
                                  bias=cfg.attention_bias),
            "k_proj": init_linear(next(ks), h, kv_heads * hd,
                                  bias=cfg.attention_bias),
            "v_proj": init_linear(next(ks), h, kv_heads * hd,
                                  bias=cfg.attention_bias),
            "o_proj": init_linear(next(ks), heads * hd, h, bias=False)}


def init_moonshine(key, cfg: ModelConfig) -> dict:
    ks = iter(jax.random.split(
        key, 8 + 8 * cfg.encoder_num_hidden_layers
        + 12 * cfg.decoder_num_hidden_layers))
    h = cfg.hidden_size
    enc = {
        "conv1": init_conv1d(next(ks), 1, h, 127, bias=False),
        "groupnorm": init_layer_norm(h),
        "conv2": init_conv1d(next(ks), h, 2 * h, 7),
        "conv3": init_conv1d(next(ks), 2 * h, h, 3),
        "layers": {},
        "layer_norm": init_layer_norm(h, bias=False),
    }
    for i in range(cfg.encoder_num_hidden_layers):
        enc["layers"][str(i)] = {
            "self_attn": _init_attn(ks, cfg,
                                    cfg.encoder_num_attention_heads,
                                    cfg.encoder_num_key_value_heads),
            "mlp": {"fc1": init_linear(next(ks), h, cfg.intermediate_size),
                    "fc2": init_linear(next(ks), cfg.intermediate_size, h)},
            "input_layernorm": init_layer_norm(h, bias=False),
            "post_attention_layernorm": init_layer_norm(h, bias=False),
        }
    dec = {
        "embed_tokens": init_embedding(next(ks), cfg.vocab_size, h),
        "layers": {},
        "norm": init_layer_norm(h, bias=False),
    }
    for i in range(cfg.decoder_num_hidden_layers):
        dec["layers"][str(i)] = {
            "self_attn": _init_attn(ks, cfg,
                                    cfg.decoder_num_attention_heads,
                                    cfg.decoder_num_key_value_heads),
            "encoder_attn": _init_attn(ks, cfg,
                                       cfg.decoder_num_attention_heads,
                                       cfg.decoder_num_key_value_heads),
            "mlp": {"fc1": init_linear(next(ks), h,
                                       2 * cfg.intermediate_size),
                    "fc2": init_linear(next(ks), cfg.intermediate_size, h)},
            "input_layernorm": init_layer_norm(h, bias=False),
            "post_attention_layernorm": init_layer_norm(h, bias=False),
            "final_layernorm": init_layer_norm(h, bias=False),
        }
    p = {"encoder": enc, "decoder": dec}
    if not cfg.tie_word_embeddings:
        p["proj_out"] = init_linear(next(ks), h, cfg.vocab_size,
                                    bias=False)
    return p


# -------------------------------------------------------------- encoder

def _masked_global_norm(p: dict, x: Array, mask: Array,
                        eps: float = 1e-5) -> Array:
    """torch GroupNorm(1, C) on (B, C, T): one mean/var over channels AND
    valid time, per sample."""
    m = mask[..., None]
    n = jnp.maximum(m.sum(axis=(1, 2), keepdims=True), 1.0) * x.shape[-1]
    mean = (x * m).sum(axis=(1, 2), keepdims=True) / n
    var = (jnp.square(x - mean) * m).sum(axis=(1, 2), keepdims=True) / n
    return ((x - mean) * jax.lax.rsqrt(var + eps)) * p["weight"] + p["bias"]


def _heads(x: Array, n: int) -> Array:
    b, t, _ = x.shape
    return x.reshape(b, t, n, -1)


def encoder_forward(params: dict, cfg: ModelConfig, wave: Array,
                    num_samples: Array) -> Tuple[Array, Array]:
    """(B, T) raw audio -> ((B, F, h) states, (B,) valid frames)."""
    p = params["encoder"]
    n = jnp.asarray(num_samples)
    x = wave[..., None]
    x = jnp.tanh(apply_conv1d(p["conv1"], x, stride=64))
    n = jnp.maximum((n - 127) // 64 + 1, 0)
    mask = (jnp.arange(x.shape[1])[None, :] < n[:, None]).astype(x.dtype)
    x = _masked_global_norm(p["groupnorm"], x, mask) * mask[..., None]
    x = jax.nn.gelu(apply_conv1d(p["conv2"], x, stride=3),
                    approximate=False)
    n = jnp.maximum((n - 7) // 3 + 1, 0)
    mask = (jnp.arange(x.shape[1])[None, :] < n[:, None]).astype(x.dtype)
    x = x * mask[..., None]
    x = jax.nn.gelu(apply_conv1d(p["conv3"], x, stride=2),
                    approximate=False)
    n = jnp.maximum((n - 3) // 2 + 1, 0)
    valid = jnp.arange(x.shape[1])[None, :] < n[:, None]
    mask = valid.astype(x.dtype)[..., None]
    x = x * mask

    inv_freq = cfg.inv_freq()
    pos = jnp.arange(x.shape[1])
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)[
        :, None, None, :]
    heads = cfg.encoder_num_attention_heads
    kv_heads = cfg.encoder_num_key_value_heads
    for i in range(cfg.encoder_num_hidden_layers):
        lp = p["layers"][str(i)]
        h = apply_layer_norm(lp["input_layernorm"], x)
        a = lp["self_attn"]
        q = apply_rope_interleaved(
            _heads(apply_linear(a["q_proj"], h), heads), pos, inv_freq)
        k = apply_rope_interleaved(
            _heads(apply_linear(a["k_proj"], h), kv_heads), pos, inv_freq)
        v = _heads(apply_linear(a["v_proj"], h), kv_heads)
        o = attention(q, k, v, mask=bias)
        x = x + apply_linear(a["o_proj"],
                             o.reshape(o.shape[0], o.shape[1], -1))
        h = apply_layer_norm(lp["post_attention_layernorm"], x)
        h = apply_linear(lp["mlp"]["fc2"],
                         jax.nn.gelu(apply_linear(lp["mlp"]["fc1"], h),
                                     approximate=False))
        x = (x + h) * mask
    return apply_layer_norm(p["layer_norm"], x) * mask, n


# -------------------------------------------------------------- decoder

def _swiglu(p: dict, x: Array) -> Array:
    h = apply_linear(p["fc1"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    return apply_linear(p["fc2"], jax.nn.silu(gate) * a)


def _cross_kv(params: dict, cfg: ModelConfig, enc: Array) -> List:
    kvs = []
    for i in range(cfg.decoder_num_hidden_layers):
        a = params["decoder"]["layers"][str(i)]["encoder_attn"]
        kvs.append((_heads(apply_linear(a["k_proj"], enc),
                           cfg.decoder_num_key_value_heads),
                    _heads(apply_linear(a["v_proj"], enc),
                           cfg.decoder_num_key_value_heads)))
    return kvs


def _logits(params: dict, cfg: ModelConfig, h: Array) -> Array:
    if cfg.tie_word_embeddings:
        return h @ params["decoder"]["embed_tokens"]["weight"].T
    return apply_linear(params["proj_out"], h)


def decode_step(params: dict, cfg: ModelConfig, token: Array, t: Array,
                caches: List[KVCache], cross_kv: List,
                enc_frames: Array) -> Tuple[Array, List[KVCache]]:
    """One decoder step: token (B, 1) at position t -> (B, vocab) logits."""
    p = params["decoder"]
    inv_freq = cfg.inv_freq()
    heads = cfg.decoder_num_attention_heads
    kv_heads = cfg.decoder_num_key_value_heads
    x = apply_embedding(p["embed_tokens"], token)
    pos = jnp.reshape(t, (1,))
    new_caches = []
    cross_mask = (jnp.arange(cross_kv[0][0].shape[1])[None, :]
                  < enc_frames[:, None])
    for i in range(cfg.decoder_num_hidden_layers):
        lp = p["layers"][str(i)]
        a = lp["self_attn"]
        h = apply_layer_norm(lp["input_layernorm"], x)
        q = apply_rope_interleaved(
            _heads(apply_linear(a["q_proj"], h), heads), pos, inv_freq)
        k = apply_rope_interleaved(
            _heads(apply_linear(a["k_proj"], h), kv_heads), pos, inv_freq)
        v = _heads(apply_linear(a["v_proj"], h), kv_heads)
        cache = kv_update(caches[i], k, v, t)
        new_caches.append(cache)
        o = decode_attention(q, cache.k, cache.v, t + 1)
        x = x + apply_linear(a["o_proj"],
                             o.reshape(o.shape[0], 1, -1))

        ca = lp["encoder_attn"]
        h = apply_layer_norm(lp["post_attention_layernorm"], x)
        qc = _heads(apply_linear(ca["q_proj"], h), heads)
        ck, cv = cross_kv[i]
        o = attention(qc, ck, cv,
                      mask=jnp.where(cross_mask, 0.0,
                                     jnp.finfo(jnp.float32).min)[
                          :, None, None, :])
        x = x + apply_linear(ca["o_proj"],
                             o.reshape(o.shape[0], 1, -1))
        x = x + _swiglu(lp["mlp"],
                        apply_layer_norm(lp["final_layernorm"], x))
    h = apply_layer_norm(p["norm"], x)
    return _logits(params, cfg, h)[:, 0], new_caches


def greedy_decode(params: dict, cfg: ModelConfig, enc: Array,
                  enc_frames: Array, max_tokens: int,
                  temperature: float = 0.0,
                  rng: Optional[Array] = None) -> Tuple[Array, Array]:
    """Whole decode loop in one lax.while_loop (greedy, or temperature
    sampling when temperature > 0 — reference moonshine.py:392). Returns
    (tokens, count) — tokens excludes the start token; count is the number
    generated before EOS."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    cross_kv = _cross_kv(params, cfg, enc)
    caches = [KVCache.init(enc.shape[0], max_tokens + 1,
                           cfg.decoder_num_key_value_heads, cfg.head_dim,
                           dtype=enc.dtype)
              for _ in range(cfg.decoder_num_hidden_layers)]
    tokens0 = jnp.zeros((max_tokens,), jnp.int32)
    start = jnp.asarray([[cfg.decoder_start_token_id]], jnp.int32)

    def cond(state):
        t, done = state[0], state[-1]
        return jnp.logical_and(t < max_tokens, jnp.logical_not(done))

    def body(state):
        t, cur, tokens, caches, rng, done = state
        logits, caches = decode_step(params, cfg, cur, t, caches,
                                     cross_kv, enc_frames)
        if temperature > 0.0:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(
                sub, logits / temperature, axis=-1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        is_eos = nxt[0] == cfg.eos_token_id
        tokens = jnp.where(is_eos, tokens, tokens.at[t].set(nxt[0]))
        return (t + 1, nxt[:, None], tokens, caches, rng,
                jnp.logical_or(done, is_eos))

    t, _, tokens, _, _, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), start, tokens0, caches, rng,
                     jnp.bool_(False)))
    count = jnp.where(done, t - 1, t)
    return tokens, count


# --------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return 16000

    def init_params(self, key):
        return init_moonshine(key, self.config)

    def _encode_fn(self, bucket: int):
        fn = self._jit_cache.get(("enc", bucket))
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, w, n: encoder_forward(p, cfg, w, n))
            self._jit_cache[("enc", bucket)] = fn
        return fn

    def _decode_fn(self, bucket: int, max_tokens: int,
                   temperature: float = 0.0):
        key = ("dec", bucket, max_tokens, temperature)
        fn = self._jit_cache.get(key)
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, e, nf, rng: greedy_decode(
                p, cfg, e, nf, max_tokens, temperature, rng))
            self._jit_cache[key] = fn
        return fn

    def generate(self, audio, *, max_tokens: int = 200,
                 temperature: float = 0.0, seed: int = 0,
                 stream: bool = False,
                 verbose: bool = False, **kwargs) -> STTOutput:
        # stream: accepted for reference-signature compat
        # (moonshine.py:358 — not supported there either)
        t0 = time.time()
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio
            audio = load_audio(str(audio), self.sample_rate)
        audio = np.asarray(audio, np.float32).reshape(-1)
        n = len(audio)
        b = _bucket(max(n, 200))
        wave = np.zeros((1, b), np.float32)
        wave[0, :n] = audio
        enc, frames = self._encode_fn(b)(self.params, jnp.asarray(wave),
                                         jnp.asarray([n]))
        tokens, count = self._decode_fn(b, max_tokens,
                                        float(temperature))(
            self.params, enc, frames, jax.random.PRNGKey(seed))
        generated = np.asarray(tokens)[: int(count)].tolist()
        text = self._decode_tokens(generated)
        dt = time.time() - t0
        if verbose:
            print(f"Generated {len(generated)} tokens in {dt:.2f}s")
            print(f"Text: {text}")
        return STTOutput(
            text=text.strip(),
            segments=[{"text": text.strip(), "start": 0.0, "end": 0.0}],
            prompt_tokens=1, generation_tokens=len(generated),
            total_tokens=1 + len(generated), total_time=dt,
            prompt_tps=1 / dt if dt > 0 else 0,
            generation_tps=len(generated) / dt if dt > 0 else 0)

    __call__ = generate

    def _decode_tokens(self, tokens: List[int]) -> str:
        if self._tokenizer is not None:
            return self._tokenizer.decode(tokens, skip_special_tokens=True)
        return "".join(chr(t) if t < 128 else f"<{t}>" for t in tokens)

    # loading ---------------------------------------------------------

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            if k.startswith("model."):
                k = k[len("model."):]
            if k.startswith("proj_out.") and self.config.tie_word_embeddings:
                continue
            if "conv" in k and k.endswith("weight") and v.ndim == 3 \
                    and v.shape[-1] in (127, 7, 3) \
                    and v.shape[0] not in (127, 7, 3):
                # torch (O, I, K) -> WIO (K, I, O); the stem kernel sizes
                # (127/7/3) identify the layout so converted checkpoints
                # pass through untouched
                v = jnp.transpose(jnp.asarray(v), (2, 1, 0))
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path: Path) -> "Model":
        try:
            from transformers import AutoTokenizer
            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path))
        except Exception:
            model._tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "encoder_forward", "greedy_decode",
           "decode_step", "encoder_frames"]
