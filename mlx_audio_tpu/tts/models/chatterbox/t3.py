"""T3: llama-backbone text-to-speech-token generator with CFG.

Parity: reference tts/models/chatterbox/t3/ — Llama_520M backbone with
llama3 rope scaling (config.py:6-29), conditioning = [speaker proj |
perceiver-resampled speech prompt | emotion scale] (cond_enc.py),
perceiver: 32 learned queries, one shared attention block applied as
cross- then self-attention (perceiver.py:113-182), learned text/speech
position embeddings, CFG as batch-2 with a zeroed unconditional text
stream (t3.py:313-471), min_p/top_p/repetition-penalty sampling, and
speech BOS/EOS framing.

TPU design: the AR loop is the compiled chunk-stepper (lax.scan, CFG
batch-2, fixed-capacity caches, rolling repetition-penalty history);
speech position embeddings indexed in-graph by step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import (apply_embedding, apply_layer_norm, apply_linear,
                    init_embedding, init_layer_norm, init_linear)
from ....ops.attention import attention
from ....ops.kvcache import KVCache
from ....ops.rope import rope_freqs_llama3
from ....ops.sampling import make_sampler
from ..llama.llama import ModelConfig as LlamaConfig
from ..llama.llama import init_llama, llama_forward

REP_WINDOW = 64
DEC_CHUNK = 32


@dataclass
class T3Config:
    text_tokens_dict_size: int = 704
    start_text_token: int = 255
    stop_text_token: int = 0
    max_text_tokens: int = 2048
    speech_tokens_dict_size: int = 8194
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    max_speech_tokens: int = 4096
    speech_cond_prompt_len: int = 150
    speaker_embed_size: int = 256
    hidden_size: int = 1024
    num_hidden_layers: int = 30
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 64
    rope_theta: float = 500000.0
    perceiver_tokens: int = 32
    perceiver_heads: int = 4

    def llama(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            intermediate_size=self.intermediate_size,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_key_value_heads,
            vocab_size=8, head_dim=self.head_dim,
            rms_norm_eps=1e-5, rope_theta=self.rope_theta)


def init_t3(key, hp: T3Config) -> dict:
    ks = iter(jax.random.split(key, 32))
    d = hp.hidden_size
    tfmr = init_llama(next(ks), hp.llama(), lm_head=False)
    del tfmr["model"]["embed_tokens"]
    return {
        "tfmr": tfmr,
        "text_emb": init_embedding(next(ks), hp.text_tokens_dict_size, d),
        "speech_emb": init_embedding(next(ks),
                                     hp.speech_tokens_dict_size, d),
        "text_pos_emb": {"emb": init_embedding(
            next(ks), hp.max_text_tokens + 2, d)},
        "speech_pos_emb": {"emb": init_embedding(
            next(ks), hp.max_speech_tokens + 4, d)},
        "text_head": init_linear(next(ks), d, hp.text_tokens_dict_size,
                                 bias=False),
        "speech_head": init_linear(next(ks), d,
                                   hp.speech_tokens_dict_size,
                                   bias=False),
        "cond_enc": {
            "spkr_enc": init_linear(next(ks), hp.speaker_embed_size, d),
            "emotion_adv_fc": init_linear(next(ks), 1, d, bias=False),
            "perceiver": {
                "pre_attention_query": jax.random.uniform(
                    next(ks), (1, hp.perceiver_tokens, d),
                    minval=-0.17, maxval=0.17),
                "attn": {
                    "norm": init_layer_norm(d),
                    "to_q": init_linear(next(ks), d, d),
                    "to_k": init_linear(next(ks), d, d),
                    "to_v": init_linear(next(ks), d, d),
                    "proj_out": init_linear(next(ks), d, d)}}}}


def _perceiver_attn(p: dict, hp: T3Config, x1, x2):
    """Shared cross/self attention block (perceiver.py:59-110)."""
    h1 = apply_layer_norm(p["norm"], x1)
    h2 = apply_layer_norm(p["norm"], x2)
    b, t1, d = x1.shape
    nh = hp.perceiver_heads
    hd = d // nh
    q = apply_linear(p["to_q"], h1).reshape(b, t1, nh, hd)
    k = apply_linear(p["to_k"], h2).reshape(b, x2.shape[1], nh, hd)
    v = apply_linear(p["to_v"], h2).reshape(b, x2.shape[1], nh, hd)
    o = attention(q, k, v).reshape(b, t1, d)
    return x1 + apply_linear(p["proj_out"], o)


def cond_embeds(p: dict, hp: T3Config, speaker_emb,
                cond_prompt_tokens: Optional[jnp.ndarray],
                emotion_adv) -> jnp.ndarray:
    """[speaker | perceiver(prompt) | emotion] (cond_enc.py:62-130)."""
    ce = p["cond_enc"]
    spkr = apply_linear(ce["spkr_enc"], speaker_emb)[:, None]
    parts = [spkr]
    if cond_prompt_tokens is not None:
        emb = apply_embedding(p["speech_emb"], cond_prompt_tokens)
        pos = p["speech_pos_emb"]["emb"]["weight"][
            :cond_prompt_tokens.shape[1]]
        emb = emb + pos[None]
        pv = ce["perceiver"]
        q = jnp.broadcast_to(pv["pre_attention_query"],
                             (emb.shape[0],) +
                             pv["pre_attention_query"].shape[1:])
        h = _perceiver_attn(pv["attn"], hp, q, emb)
        h = _perceiver_attn(pv["attn"], hp, h, h)
        parts.append(h)
    ea = jnp.asarray(emotion_adv).reshape(-1, 1, 1)
    parts.append(apply_linear(ce["emotion_adv_fc"], ea))
    return jnp.concatenate(parts, axis=1)


class T3:
    """Functional T3 with a compiled CFG decode loop."""

    def __init__(self, hp: Optional[T3Config] = None,
                 params: Optional[dict] = None):
        self.hp = hp or T3Config()
        self.params = params
        self._jit: Dict = {}

    def init(self, key) -> "T3":
        self.params = init_t3(key, self.hp)
        return self

    def _fns(self, prompt_bucket: int, max_new: int, temperature: float,
             top_p: float, min_p: float, rep_penalty: float):
        key_ = (prompt_bucket, max_new, temperature, top_p, min_p,
                rep_penalty)
        fns = self._jit.get(key_)
        if fns is not None:
            return fns
        hp = self.hp
        lc = hp.llama()
        lc_inv = rope_freqs_llama3(hp.head_dim, hp.rope_theta)
        cap = prompt_bucket + max_new + 8
        sampler = make_sampler(temperature=temperature, top_p=top_p,
                               min_p=min_p,
                               repetition_penalty=rep_penalty)

        def fwd(p, embeds, caches, offset, mask=None):
            t = embeds.shape[1]
            positions = offset + jnp.arange(t)[None]
            from ..llama.llama import _attn_block, _mlp
            from ....nn import apply_rms_norm
            x = embeds
            new = []
            for i in range(lc.num_hidden_layers):
                layer = p["tfmr"]["model"]["layers"][str(i)]
                h = apply_rms_norm(layer["input_layernorm"], x,
                                   lc.rms_norm_eps)
                a, nc = _attn_block(layer["self_attn"], lc, h, positions,
                                    lc_inv, caches[i], offset, mask, True)
                new.append(nc)
                x = x + a
                h = apply_rms_norm(layer["post_attention_layernorm"], x,
                                   lc.rms_norm_eps)
                x = x + _mlp(layer["mlp"], h)
            x = apply_rms_norm(p["tfmr"]["model"]["norm"], x,
                               lc.rms_norm_eps)
            return x, new

        def prefill(p, embeds, length):
            caches = [KVCache.init(2, cap, lc.num_key_value_heads,
                                   hp.head_dim, dtype=jnp.float32)
                      for _ in range(lc.num_hidden_layers)]
            pad = jnp.where(jnp.arange(cap)[None, :] < length[:, None],
                            0.0, -jnp.inf)          # 2D (B, cap)
            h, caches = fwd(p, embeds, caches, jnp.int32(0), mask=pad)
            last = jnp.take_along_axis(
                h, (length - 1)[:, None, None].repeat(h.shape[-1], 2),
                axis=1)
            return apply_linear(p["speech_head"], last[:, 0]), caches

        def chunk(p, lg, caches, t0, step0, rng, done, history,
                  cfg_weight):
            def body(carry, i):
                lg, caches, key, done, hist = carry
                guided = lg[0:1] + cfg_weight * (lg[0:1] - lg[1:2])
                key, sub = jax.random.split(key)
                tok = sampler(sub, guided, history=hist)
                tok0 = tok[0]
                done2 = jnp.logical_or(done,
                                       tok0 == hp.stop_speech_token)
                hist = jnp.roll(hist, -1, axis=-1).at[:, -1].set(
                    jnp.where(done2, -1, tok0))
                emb = apply_embedding(p["speech_emb"], tok0[None, None])
                emb = emb + p["speech_pos_emb"]["emb"]["weight"][
                    step0 + i + 1][None, None]
                emb2 = jnp.broadcast_to(emb, (2, 1, emb.shape[-1]))
                h, caches = fwd(p, emb2, caches, t0 + i)
                lg2 = apply_linear(p["speech_head"], h[:, 0])
                out = jnp.where(done2, -1, tok0)
                return (lg2, caches, key, done2, hist), out

            (lg, caches, rng, done, history), toks = jax.lax.scan(
                body, (lg, caches, rng, done, history),
                jnp.arange(DEC_CHUNK))
            return lg, caches, rng, done, history, toks

        fns = (jax.jit(prefill), jax.jit(chunk))
        self._jit[key_] = fns
        return fns

    def inference(self, speaker_emb, text_tokens: np.ndarray,
                  cond_prompt_tokens: Optional[np.ndarray] = None,
                  emotion_adv: float = 0.5, max_new_tokens: int = 1000,
                  temperature: float = 0.8, top_p: float = 1.0,
                  min_p: float = 0.05, repetition_penalty: float = 1.2,
                  cfg_weight: float = 0.5, seed: int = 0) -> List[int]:
        """text tokens (with SOT/EOT) -> speech token ids (no BOS/EOS)."""
        hp = self.hp
        p = self.params
        cond = np.asarray(cond_embeds(
            p, hp, jnp.asarray(speaker_emb, jnp.float32).reshape(1, -1),
            jnp.asarray(cond_prompt_tokens).reshape(1, -1)
            if cond_prompt_tokens is not None else None,
            float(emotion_adv)))
        text_tokens = np.asarray(text_tokens, np.int32).reshape(1, -1)
        text_emb = np.asarray(apply_embedding(p["text_emb"],
                                              jnp.asarray(text_tokens)))
        tpos = np.asarray(p["text_pos_emb"]["emb"]["weight"][
            :text_tokens.shape[1]])
        text_emb = text_emb + tpos[None]
        bos = np.asarray(apply_embedding(
            p["speech_emb"],
            jnp.asarray([[hp.start_speech_token]])))
        bos = bos + np.asarray(p["speech_pos_emb"]["emb"]["weight"][0])

        # CFG pair: row 0 = conditional, row 1 = zeroed text stream
        prefix_c = np.concatenate([cond, text_emb, bos], axis=1)
        prefix_u = np.concatenate([cond, np.zeros_like(text_emb), bos],
                                  axis=1)
        prefix = np.concatenate([prefix_c, prefix_u], axis=0)
        n = prefix.shape[1]
        pb = 1 << max(6, (n - 1).bit_length())
        padded = np.zeros((2, pb, prefix.shape[2]), np.float32)
        padded[:, :n] = prefix

        prefill, chunk = self._fns(pb, max_new_tokens, temperature,
                                   top_p, min_p, repetition_penalty)
        lg, caches = prefill(self.params, jnp.asarray(padded),
                             jnp.asarray([n, n]))
        rng = jax.random.PRNGKey(seed)
        done = jnp.bool_(False)
        hist = jnp.full((1, REP_WINDOW), -1, jnp.int32)
        t = jnp.int32(n)
        step = jnp.int32(0)
        out: List[int] = []
        while len(out) < max_new_tokens:
            lg, caches, rng, done, hist, toks = chunk(
                self.params, lg, caches, t, step, rng, done, hist,
                jnp.float32(cfg_weight))
            t = t + DEC_CHUNK
            step = step + DEC_CHUNK
            arr = np.asarray(toks)
            out.extend(int(x) for x in arr[arr >= 0])
            if bool(done):
                break
        return out[:max_new_tokens]


def sanitize_t3(weights: Dict, prefix_fix: bool = True) -> Dict:
    """tfmr.layers -> tfmr.model.layers (reference t3.py:62-131)."""
    import re
    out = {}
    for k, v in weights.items():
        v = jnp.asarray(v)
        if prefix_fix and k.startswith("tfmr.") \
                and not k.startswith("tfmr.model."):
            if re.match(r"^tfmr\.(layers|embed_tokens|norm)\.", k):
                k = re.sub(r"^tfmr\.", "tfmr.model.", k)
        if "rotary_emb.inv_freq" in k or k == "tfmr.model.embed_tokens"\
                ".weight":
            continue
        out[k] = v
    return out


__all__ = ["T3", "T3Config", "init_t3", "cond_embeds", "sanitize_t3"]
