"""Shared llama-style transformer backbone (functional, KV-cached, TP-ready).

Parity target: /root/reference/mlx_audio/tts/models/llama (570 LoC shared LLM
backbone for token-TTS: sesame/CSM, tada, outetts; qwen3 variant for
qwen3_tts). TPU design:

* GQA attention with fixed-capacity KV caches (ops/kvcache.py) so the whole
  decode loop compiles to one XLA while-loop.
* RMSNorm in f32, activations bf16-friendly.
* Param names match HF llama checkpoints (model.layers.N.self_attn.q_proj...)
  so loading is a pure unflatten; TP sharding rules in parallel/sharding.py
  key off the same names.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs

Array = jax.Array


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "llama"
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    intermediate_size: int = 8192
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    vocab_size: int = 128256
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_position_embeddings: int = 2048
    head_dim: Optional[int] = None
    attention_bias: bool = False
    tie_word_embeddings: bool = False
    model_path: str = ""
    # Granite-style scale hooks (reference granite_speech/config.py TextConfig)
    # — defaults are exact no-ops for every other consumer of this backbone.
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    attention_multiplier: Optional[float] = None
    logits_scaling: float = 1.0
    # interleaved ("traditional") RoPE — used by Mistral-style consumers
    # (voxtral_tts); default False keeps HF split-half semantics.
    rope_interleaved: bool = False

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads


def init_llama(key, cfg: ModelConfig, lm_head: bool = True) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))
    hd = cfg.resolved_head_dim
    layers = {}
    for i in range(cfg.num_hidden_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_attention_heads * hd,
                                      bias=cfg.attention_bias),
                "k_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_key_value_heads * hd,
                                      bias=cfg.attention_bias),
                "v_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_key_value_heads * hd,
                                      bias=cfg.attention_bias),
                "o_proj": init_linear(next(ks), cfg.num_attention_heads * hd,
                                      cfg.hidden_size, bias=False),
            },
            "mlp": {
                "gate_proj": init_linear(next(ks), cfg.hidden_size,
                                         cfg.intermediate_size, bias=False),
                "up_proj": init_linear(next(ks), cfg.hidden_size,
                                       cfg.intermediate_size, bias=False),
                "down_proj": init_linear(next(ks), cfg.intermediate_size,
                                         cfg.hidden_size, bias=False),
            },
            "input_layernorm": init_rms_norm(cfg.hidden_size),
            "post_attention_layernorm": init_rms_norm(cfg.hidden_size),
        }
    p = {
        "model": {
            "embed_tokens": init_embedding(next(ks), cfg.vocab_size,
                                           cfg.hidden_size),
            "layers": layers,
            "norm": init_rms_norm(cfg.hidden_size),
        }
    }
    if lm_head and not cfg.tie_word_embeddings:
        p["lm_head"] = init_linear(next(ks), cfg.hidden_size, cfg.vocab_size,
                                   bias=False)
    return p


def _attn_block(p, cfg: ModelConfig, x, positions, inv_freq,
                caches: Optional[KVCache], offset, mask, causal):
    hd = cfg.resolved_head_dim
    b, t, _ = x.shape
    q = apply_linear(p["q_proj"], x).reshape(b, t, cfg.num_attention_heads, hd)
    k = apply_linear(p["k_proj"], x).reshape(b, t, cfg.num_key_value_heads, hd)
    v = apply_linear(p["v_proj"], x).reshape(b, t, cfg.num_key_value_heads, hd)
    q = apply_rope(q, positions, inv_freq, interleaved=cfg.rope_interleaved)
    k = apply_rope(k, positions, inv_freq, interleaved=cfg.rope_interleaved)
    new_cache = None
    if caches is not None:
        new_cache = kv_update(caches, k, v, offset)
        if t == 1:
            out = decode_attention(q, new_cache.k, new_cache.v,
                                   offset + 1, lengths_mask=mask,
                                   scale=cfg.attention_multiplier)
        else:
            # prefill against the cache window [0, offset + t)
            s = new_cache.k.shape[1]
            pos_s = jnp.arange(s)[None, None, None, :]
            causal_m = pos_s <= (offset + jnp.arange(t))[None, None, :, None]
            valid = pos_s < (offset + t)
            add_mask = jnp.where(causal_m & valid, 0.0, -jnp.inf)
            if mask is not None:
                add_mask = add_mask + mask[:, None, None, :]
            out = attention(q, new_cache.k, new_cache.v, mask=add_mask,
                            scale=cfg.attention_multiplier)
    else:
        out = attention(q, k, v, mask=mask, causal=causal,
                        scale=cfg.attention_multiplier)
    out = out.reshape(b, t, cfg.num_attention_heads * hd)
    return apply_linear(p["o_proj"], out), new_cache


def _mlp(p, x):
    return apply_linear(
        p["down_proj"],
        jax.nn.silu(apply_linear(p["gate_proj"], x))
        * apply_linear(p["up_proj"], x),
    )


def llama_forward(
    params: dict,
    cfg: ModelConfig,
    tokens_or_embeds: Array,
    positions: Optional[Array] = None,
    caches: Optional[List[KVCache]] = None,
    offset: Array = 0,
    mask: Optional[Array] = None,
    causal: bool = True,
    final_norm: bool = True,
) -> Tuple[Array, Optional[List[KVCache]]]:
    """Forward the backbone. tokens (B, T) int or embeds (B, T, D).

    With `caches`, writes new kv at `offset` and attends against the cache
    (prefill t>1 or decode t==1); returns (hidden, new_caches).
    """
    m = params["model"]
    if tokens_or_embeds.ndim == 2:
        x = apply_embedding(m["embed_tokens"], tokens_or_embeds)
    else:
        x = tokens_or_embeds
    if cfg.embedding_multiplier != 1.0:
        # granite multiplies after any audio-embed splice (reference
        # granite_speech.py:455-457), so embeds input is scaled too
        x = x * cfg.embedding_multiplier
    b, t = x.shape[:2]
    if positions is None:
        positions = offset + jnp.arange(t)[None, :]
    inv_freq = rope_freqs(cfg.resolved_head_dim, cfg.rope_theta)
    new_caches = [] if caches is not None else None
    for i in range(cfg.num_hidden_layers):
        layer = m["layers"][str(i)]
        h = apply_rms_norm(layer["input_layernorm"], x, cfg.rms_norm_eps)
        attn_out, nc = _attn_block(
            layer["self_attn"], cfg, h, positions, inv_freq,
            caches[i] if caches is not None else None, offset, mask, causal)
        if new_caches is not None:
            new_caches.append(nc)
        rm = cfg.residual_multiplier
        x = x + (attn_out if rm == 1.0 else attn_out * rm)
        h = apply_rms_norm(layer["post_attention_layernorm"], x,
                           cfg.rms_norm_eps)
        mlp_out = _mlp(layer["mlp"], h)
        x = x + (mlp_out if rm == 1.0 else mlp_out * rm)
    if final_norm:
        x = apply_rms_norm(m["norm"], x, cfg.rms_norm_eps)
    return x, new_caches


def logits_from_hidden(params: dict, cfg: ModelConfig, hidden: Array) -> Array:
    if "lm_head" in params:
        lg = apply_linear(params["lm_head"], hidden)
    else:
        lg = jnp.einsum("btd,vd->btv", hidden,
                        params["model"]["embed_tokens"]["weight"])
    if cfg.logits_scaling != 1.0:
        lg = lg / cfg.logits_scaling
    return lg


def init_caches(cfg: ModelConfig, batch: int, max_len: int,
                dtype=jnp.bfloat16) -> List[KVCache]:
    hd = cfg.resolved_head_dim
    return [
        KVCache.init(batch, max_len, cfg.num_key_value_heads, hd, dtype)
        for _ in range(cfg.num_hidden_layers)
    ]


def decode_step(params, cfg: ModelConfig, token, caches, offset,
                mask=None):
    """One AR decode step: token (B, 1) -> (logits (B, V), new_caches)."""
    hidden, new_caches = llama_forward(
        params, cfg, token, caches=caches, offset=offset, mask=mask)
    return logits_from_hidden(params, cfg, hidden)[:, -1], new_caches


class Model(FunctionalModel):
    """Plain llama LM (usable directly; mostly a building block)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)

    def init_params(self, key):
        return init_llama(key, self.config)

    def sanitize(self, weights):
        return {k: v for k, v in weights.items()
                if not k.endswith("rotary_emb.inv_freq")}
