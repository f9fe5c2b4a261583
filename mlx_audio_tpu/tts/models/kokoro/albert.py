"""Functional ALBERT (PL-BERT) encoder for Kokoro.

Architecture parity: /root/reference/mlx_audio/tts/models/kokoro/modules.py:
415-660 (AlbertModelArgs :415, AlbertEmbeddings :434, attention :464,
layer-group weight sharing :582-624, CustomAlbert :626). Rebuilt as pure
functions over a params pytree; the layer loop is a Python loop over shared
group params (num_hidden_layers iterations reusing num_hidden_groups tensors,
which XLA unrolls/fuses).
"""

from __future__ import annotations

from dataclasses import dataclass

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
from ....ops.attention import attention


@dataclass
class AlbertModelArgs(BaseModelArgs):
    num_hidden_layers: int
    num_attention_heads: int
    hidden_size: int
    intermediate_size: int
    max_position_embeddings: int
    model_type: str = "albert"
    embedding_size: int = 128
    inner_group_num: int = 1
    num_hidden_groups: int = 1
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    vocab_size: int = 30522
    dropout: float = 0.0


def init_albert(key, cfg: AlbertModelArgs) -> dict:
    ks = iter(jax.random.split(key, 64))
    emb = {
        "word_embeddings": init_embedding(next(ks), cfg.vocab_size, cfg.embedding_size),
        "position_embeddings": init_embedding(
            next(ks), cfg.max_position_embeddings, cfg.embedding_size),
        "token_type_embeddings": init_embedding(
            next(ks), cfg.type_vocab_size, cfg.embedding_size),
        "LayerNorm": init_layer_norm(cfg.embedding_size),
    }
    groups = {}
    for g in range(cfg.num_hidden_groups):
        layers = {}
        for i in range(cfg.inner_group_num):
            layers[str(i)] = {
                "attention": {
                    "query": init_linear(next(ks), cfg.hidden_size, cfg.hidden_size),
                    "key": init_linear(next(ks), cfg.hidden_size, cfg.hidden_size),
                    "value": init_linear(next(ks), cfg.hidden_size, cfg.hidden_size),
                    "dense": init_linear(next(ks), cfg.hidden_size, cfg.hidden_size),
                    "LayerNorm": init_layer_norm(cfg.hidden_size),
                },
                "ffn": init_linear(next(ks), cfg.hidden_size, cfg.intermediate_size),
                "ffn_output": init_linear(next(ks), cfg.intermediate_size, cfg.hidden_size),
                "full_layer_layer_norm": init_layer_norm(cfg.hidden_size),
            }
        groups[str(g)] = {"albert_layers": layers}
    return {
        "embeddings": emb,
        "encoder": {
            "embedding_hidden_mapping_in": init_linear(
                next(ks), cfg.embedding_size, cfg.hidden_size),
            "albert_layer_groups": groups,
        },
        "pooler": init_linear(next(ks), cfg.hidden_size, cfg.hidden_size),
    }


def _albert_layer(p: dict, cfg: AlbertModelArgs, x, mask):
    h = x.shape[-1]
    nh = cfg.num_attention_heads
    hd = h // nh
    b, t, _ = x.shape
    q = apply_linear(p["attention"]["query"], x).reshape(b, t, nh, hd)
    k = apply_linear(p["attention"]["key"], x).reshape(b, t, nh, hd)
    v = apply_linear(p["attention"]["value"], x).reshape(b, t, nh, hd)
    attn = attention(q, k, v, mask=mask).reshape(b, t, h)
    attn = apply_linear(p["attention"]["dense"], attn)
    x = apply_layer_norm(p["attention"]["LayerNorm"], x + attn,
                         eps=cfg.layer_norm_eps)
    ff = apply_linear(p["ffn"], x)
    ff = jax.nn.gelu(ff, approximate=False)
    ff = apply_linear(p["ffn_output"], ff)
    return apply_layer_norm(p["full_layer_layer_norm"], x + ff,
                            eps=cfg.layer_norm_eps)


def apply_albert(params: dict, cfg: AlbertModelArgs, input_ids, attention_mask=None):
    """input_ids (B, T) int32; attention_mask (B, T) {0,1}.

    Returns (sequence_output (B, T, H), pooled (B, H)).
    """
    b, t = input_ids.shape
    pos_ids = jnp.arange(t, dtype=jnp.int32)[None, :]
    emb = params["embeddings"]
    x = (
        apply_embedding(emb["word_embeddings"], input_ids)
        + apply_embedding(emb["position_embeddings"], pos_ids)
        + apply_embedding(emb["token_type_embeddings"],
                          jnp.zeros_like(input_ids))
    )
    x = apply_layer_norm(emb["LayerNorm"], x, eps=cfg.layer_norm_eps)

    mask = None
    if attention_mask is not None:
        mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0

    enc = params["encoder"]
    x = apply_linear(enc["embedding_hidden_mapping_in"], x)
    layers_per_group = cfg.num_hidden_layers // cfg.num_hidden_groups
    for i in range(cfg.num_hidden_layers):
        group = enc["albert_layer_groups"][str(i // layers_per_group)]
        for j in range(cfg.inner_group_num):
            x = _albert_layer(group["albert_layers"][str(j)], cfg, x, mask)
    pooled = jnp.tanh(apply_linear(params["pooler"], x[:, 0]))
    return x, pooled
