"""Functional GPT2 backbone (chatterbox-turbo T3).

Parity: /root/reference/mlx_audio/tts/models/chatterbox_turbo/models/t3/
gpt2.py (GPT2Attention :52 fused c_attn, gelu_new MLP :115, pre-LN blocks
:131, learned positions :196-215).

TPU design: fixed-capacity KV caches (ops/kvcache) so the whole decode
loop compiles into one while_loop; positions are explicit (offset-based),
not cache-object state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....base import BaseModelArgs
from ....nn import (
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update

Array = jax.Array


@dataclass
class GPT2Config(BaseModelArgs):
    vocab_size: int = 50276
    n_positions: int = 8196
    n_embd: int = 1024
    n_layer: int = 24
    n_head: int = 16
    n_inner: Optional[int] = None
    layer_norm_epsilon: float = 1e-5

    @property
    def inner(self) -> int:
        return self.n_inner or 4 * self.n_embd


def gelu_new(x: Array) -> Array:
    return 0.5 * x * (1.0 + jnp.tanh(
        jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def init_gpt2(key, cfg: GPT2Config) -> dict:
    ks = iter(jax.random.split(key, 8 + 6 * cfg.n_layer))
    h = {}
    for i in range(cfg.n_layer):
        h[str(i)] = {
            "ln_1": init_layer_norm(cfg.n_embd),
            "attn": {"c_attn": init_linear(next(ks), cfg.n_embd,
                                           3 * cfg.n_embd),
                     "c_proj": init_linear(next(ks), cfg.n_embd,
                                           cfg.n_embd)},
            "ln_2": init_layer_norm(cfg.n_embd),
            "mlp": {"c_fc": init_linear(next(ks), cfg.n_embd, cfg.inner),
                    "c_proj": init_linear(next(ks), cfg.inner,
                                          cfg.n_embd)},
        }
    return {"wte": init_embedding(next(ks), cfg.vocab_size, cfg.n_embd),
            "wpe": init_embedding(next(ks), cfg.n_positions, cfg.n_embd),
            "h": h, "ln_f": init_layer_norm(cfg.n_embd)}


def init_gpt2_caches(cfg: GPT2Config, batch: int, max_len: int,
                     dtype=jnp.float32) -> List[KVCache]:
    hd = cfg.n_embd // cfg.n_head
    return [KVCache.init(batch, max_len, cfg.n_head, hd, dtype)
            for _ in range(cfg.n_layer)]


def gpt2_forward(
    params: dict,
    cfg: GPT2Config,
    embeds: Array,
    caches: Optional[List[KVCache]] = None,
    offset: Array = 0,
    mask: Optional[Array] = None,
) -> Tuple[Array, Optional[List[KVCache]]]:
    """embeds (B, T, D) -> (hidden (B, T, D), new caches).

    With caches: writes kv at `offset`; prefill masks pad keys via `mask`
    (additive (B, S_cache) or broadcastable); decode (T==1) attends
    [0, offset+1).
    """
    b, t, _ = embeds.shape
    hd = cfg.n_embd // cfg.n_head
    pos = offset + jnp.arange(t)
    x = embeds + apply_embedding(params["wpe"], pos)[None]
    new_caches = [] if caches is not None else None
    for i in range(cfg.n_layer):
        lp = params["h"][str(i)]
        hn = apply_layer_norm(lp["ln_1"], x, eps=cfg.layer_norm_epsilon)
        qkv = apply_linear(lp["attn"]["c_attn"], hn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, cfg.n_head, hd)
        k = k.reshape(b, t, cfg.n_head, hd)
        v = v.reshape(b, t, cfg.n_head, hd)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new_caches.append(nc)
            if t == 1:
                o = decode_attention(q, nc.k, nc.v, offset + 1)
            else:
                s = nc.k.shape[1]
                pos_s = jnp.arange(s)[None, None, None, :]
                causal = pos_s <= (offset + jnp.arange(t))[None, None, :,
                                                           None]
                add = jnp.where(causal, 0.0, -jnp.inf)
                if mask is not None:
                    add = add + (mask[:, None, None, :]
                                 if mask.ndim == 2 else mask)
                o = attention(q, nc.k, nc.v, mask=add)
        else:
            o = attention(q, k, v, causal=True, mask=mask)
        x = x + apply_linear(lp["attn"]["c_proj"], o.reshape(b, t, -1))
        hn = apply_layer_norm(lp["ln_2"], x, eps=cfg.layer_norm_epsilon)
        x = x + apply_linear(lp["mlp"]["c_proj"],
                             gelu_new(apply_linear(lp["mlp"]["c_fc"], hn)))
    return apply_layer_norm(params["ln_f"], x,
                            eps=cfg.layer_norm_epsilon), new_caches


__all__ = ["GPT2Config", "init_gpt2", "init_gpt2_caches", "gpt2_forward",
           "gelu_new"]
