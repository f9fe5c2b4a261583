"""Granite Speech 4.1 NAR: single-pass CTC + bidirectional editor ASR.

Parity: /root/reference/mlx_audio/stt/models/granite_speech_nar/
(ConformerEncoder with self-conditioning + posterior-weighted BPE pooling
encoder.py:238-334, Q-Former projector with mean-pool query init
projector.py:136-260, bidirectional Granite editor with scaled residuals
editor.py:138-300, CTC collapse + insertion slots decoding.py:11-63).

TPU design: the whole transcription is TWO compiled forward passes and zero
autoregressive steps — (1) encoder+projector on the bucketed feature batch
producing BPE argmax + fused hidden states, (2) the bidirectional editor
over [audio | slotted hypothesis]. CTC collapse runs vectorized in NumPy
between the passes. The conformer blocks reuse granite_speech (4.0)'s
block-local Shaw attention / conv-module kernels.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

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
from ....ops.rope import apply_rope, rope_freqs
from ..base import STTOutput
from ..granite_speech.granite_speech import (
    EncoderConfig as BaseEncoderConfig,
    _block_attn,
    _conv_mod,
    _ff,
    _init_ff,
    init_granite_speech,
)

Array = jax.Array

ENC_BUCKETS = (400, 800, 1600, 3200, 6400)
EDIT_BUCKETS = (128, 256, 512, 1024, 2048)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@dataclass
class EncoderConfig(BaseEncoderConfig):
    bpe_output_dim: int = 32000
    bpe_pooling_window: int = 4
    self_conditioning_layer: int = 8
    blank_token_id: int = 0


@dataclass
class ProjectorConfig(BaseModelArgs):
    num_layers: int = 2
    num_encoder_layers: int = 4
    hidden_size: int = 2048
    num_heads: int = 32
    block_size: int = 15
    downsample_rate: int = 5
    encoder_dim: int = 1024
    llm_dim: int = 2048
    mlp_ratio: int = 4
    mlp_bias: bool = True
    attn_bias: bool = True
    layernorm_eps: float = 1e-5


@dataclass
class TextConfig(BaseModelArgs):
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 40
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    vocab_size: int = 100352
    max_position_embeddings: int = 131072
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000000.0
    tie_word_embeddings: bool = True
    attention_multiplier: float = 0.015625
    embedding_multiplier: float = 12.0
    logits_scaling: float = 8.0
    residual_multiplier: float = 0.22
    bos_token_id: int = 100257
    eos_token_id: int = 100257
    pad_token_id: int = 100256

    @classmethod
    def from_dict(cls, params):
        params = dict(params or {})
        rp = params.get("rope_parameters")
        if isinstance(rp, dict) and "rope_theta" in rp:
            params.setdefault("rope_theta", rp["rope_theta"])
        return super().from_dict(params)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "granite_speech_nar"
    encoder_config: Optional[dict] = None
    projector_config: Optional[dict] = None
    text_config: Optional[dict] = None
    encoder_layer_indices: List[int] = field(
        default_factory=lambda: [4, 8, 12, -1])
    blank_token_id: int = 100257
    scale_projected_embeddings: bool = True
    min_edit_sequence_length: int = 8
    tie_word_embeddings: bool = True
    model_path: str = ""

    def __post_init__(self):
        self.enc = EncoderConfig.from_dict(self.encoder_config or {})
        self.proj = ProjectorConfig.from_dict(self.projector_config or {})
        self.text = TextConfig.from_dict(self.text_config or {})


# --------------------------------------------------------------- decoding

def ctc_collapse_decode(tokens: np.ndarray, blank_id: int) -> np.ndarray:
    """Dedup adjacent repeats, drop blanks (ref decoding.py:11-35)."""
    tokens = np.asarray(tokens)
    if tokens.size == 0:
        return tokens
    first = np.concatenate([[True], tokens[1:] != tokens[:-1]])
    return tokens[first & (tokens != blank_id)]


def add_insertion_slots(token_ids: np.ndarray, blank_id: int,
                        min_len: int = 8) -> np.ndarray:
    """Interleave blanks as editing slots: CTC tokens at odd indices
    (ref decoding.py:38-63)."""
    token_ids = np.asarray(token_ids)
    n = len(token_ids)
    total = max(2 * n + 1, min_len)
    out = np.full((total,), blank_id, dtype=np.int32)
    if n:
        out[1:2 * n:2] = token_ids
    return out


# ---------------------------------------------------------------- encoder

def nar_encoder_forward(params: dict, cfg: ModelConfig, feats: Array,
                        valid: Array) -> Tuple[Array, Array]:
    """(1, N, input_dim) -> (bpe_logits (1, N/w, bpe_vocab),
    fused hidden states (1, N, 4*hidden))."""
    e = cfg.enc
    p = params["encoder"]
    b, n, _ = feats.shape
    nb = n // e.context_size
    x = apply_linear(p["input_linear"], feats)
    g = jnp.arange(n).reshape(nb, e.context_size)
    col_valid = g < valid
    pos_mask = (jnp.arange(n) < valid)[None, :, None].astype(x.dtype)
    hidden = [x]
    blank_probs = None
    for idx in range(1, e.num_layers + 1):
        lp = p["layers"][str(idx - 1)]
        x = 0.5 * _ff(lp["ff1"], x) + x
        x = _block_attn(lp["attn"], e, x, col_valid) + x
        x = _conv_mod(lp["conv"], e, x, pos_mask) + x
        x = 0.5 * _ff(lp["ff2"], x) + x
        x = apply_layer_norm(lp["post_norm"], x)
        if idx == e.self_conditioning_layer:
            char_logits = apply_linear(p["out"], x)
            probs = jax.nn.softmax(char_logits.astype(jnp.float32), axis=-1)
            blank_probs = probs[..., 0]
            x = x + apply_linear(p["out_mid"], probs.astype(x.dtype))
        hidden.append(x)

    fused = jnp.concatenate(
        [hidden[i] for i in cfg.encoder_layer_indices], axis=-1)

    # posterior-weighted BPE pooling (ref encoder.py:301-334)
    w = e.bpe_pooling_window
    n_pool = n // w
    imp = (1.0 - blank_probs)[:, :n_pool * w].reshape(b, n_pool, w)
    imp = imp * (jnp.arange(n)[:n_pool * w].reshape(n_pool, w)
                 < valid)[None]
    hw = x[:, :n_pool * w].reshape(b, n_pool, w, -1)
    weights = imp / jnp.maximum(imp.sum(axis=-1, keepdims=True), 1e-6)
    pooled = (hw * weights[..., None].astype(hw.dtype)).sum(axis=2)
    bpe_logits = apply_linear(p["out_bpe"], pooled)
    return bpe_logits, fused


# --------------------------------------------------------------- projector

def nar_projector_forward(params: dict, cfg: ModelConfig,
                          fused: Array, valid: Array) -> Array:
    """(1, T, 4*enc_dim) -> (1, nblocks*3, llm_dim) (ref projector.py)."""
    pj = cfg.proj
    p = params["projector"]
    b, t, _ = fused.shape
    parts = jnp.split(fused, pj.num_encoder_layers, axis=-1)
    normed = [apply_layer_norm(p["layer_norms"][str(i)], parts[i],
                               pj.layernorm_eps)
              for i in range(pj.num_encoder_layers)]
    h = apply_linear(p["layer_projector"], jnp.concatenate(normed, axis=-1))
    h = jax.nn.gelu(h, approximate=False)
    h = h * (jnp.arange(t)[None, :, None] < valid)

    block = pj.block_size
    pad = (-t) % block
    h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    nblocks = (t + pad) // block
    h = h.reshape(b * nblocks, block, pj.hidden_size)

    nq = block // pj.downsample_rate
    mean_pool = h.reshape(b * nblocks, nq, pj.downsample_rate,
                          pj.hidden_size).mean(axis=-2)
    query = p["query"].astype(h.dtype) + mean_pool
    kv = h + p["window_positions"].astype(h.dtype)

    for i in range(pj.num_layers):
        lp = p["qformer"]["layers"][str(i)]
        qn = apply_layer_norm(lp["attn_norm"], query, pj.layernorm_eps)
        ca = lp["cross_attention"]
        bq, lq, dd = qn.shape
        dh = dd // pj.num_heads
        q = apply_linear(ca["q_proj"], qn).reshape(bq, lq, pj.num_heads, dh)
        k = apply_linear(ca["k_proj"], kv).reshape(bq, -1, pj.num_heads, dh)
        v = apply_linear(ca["v_proj"], kv).reshape(bq, -1, pj.num_heads, dh)
        o = attention(q, k, v).reshape(bq, lq, dd)
        query = query + apply_linear(ca["o_proj"], o)
        mn = apply_layer_norm(lp["mlp_norm"], query, pj.layernorm_eps)
        query = query + apply_linear(
            lp["mlp"]["fc2"], jax.nn.silu(apply_linear(lp["mlp"]["fc1"],
                                                       mn)))

    out = apply_layer_norm(p["out_norm"], query, pj.layernorm_eps)
    out = apply_linear(p["out_linear"], out)
    return out.reshape(b, nblocks * nq, pj.llm_dim)


# ----------------------------------------------------------------- editor

def editor_forward(params: dict, tc: TextConfig, embeds: Array,
                   valid: Array, logits_start: int) -> Array:
    """Bidirectional Granite editor: (1, T, D) -> logits for the text tail
    (ref editor.py:232-300)."""
    p = params["editor"]
    b, t, _ = embeds.shape
    x = embeds * tc.embedding_multiplier
    hd = tc.hidden_size // tc.num_attention_heads
    inv_freq = rope_freqs(hd, tc.rope_theta)
    positions = jnp.arange(t)[None, :]
    mask = jnp.where(jnp.arange(t)[None, None, None, :] < valid, 0.0,
                     -jnp.inf)
    for i in range(tc.num_hidden_layers):
        lp = p["layers"][str(i)]
        h = apply_rms_norm(lp["input_layernorm"], x, tc.rms_norm_eps)
        a = lp["self_attn"]
        q = apply_linear(a["q_proj"], h).reshape(
            b, t, tc.num_attention_heads, hd)
        k = apply_linear(a["k_proj"], h).reshape(
            b, t, tc.num_key_value_heads, hd)
        v = apply_linear(a["v_proj"], h).reshape(
            b, t, tc.num_key_value_heads, hd)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        o = attention(q, k, v, mask=mask, scale=tc.attention_multiplier)
        x = x + apply_linear(a["o_proj"], o.reshape(b, t, -1)) \
            * tc.residual_multiplier
        h = apply_rms_norm(lp["post_attention_layernorm"], x,
                           tc.rms_norm_eps)
        m = lp["mlp"]
        x = x + apply_linear(m["down_proj"],
                             jax.nn.silu(apply_linear(m["gate_proj"], h))
                             * apply_linear(m["up_proj"], h)) \
            * tc.residual_multiplier
    x = apply_rms_norm(p["norm"], x, tc.rms_norm_eps)
    x = x[:, logits_start:]
    logits = x @ p["embed_tokens"]["weight"].T
    return logits / tc.logits_scaling


# ------------------------------------------------------------------- init

def init_nar(key, cfg: ModelConfig) -> dict:
    e, pj, tc = cfg.enc, cfg.proj, cfg.text
    ks = iter(jax.random.split(key, 64 + 16 * (e.num_layers
                                               + pj.num_layers
                                               + tc.num_hidden_layers)))
    # conformer blocks reuse granite_speech's layer pytree layout
    base = init_granite_speech(
        jax.random.PRNGKey(0),
        _GS_SHIM(cfg))["encoder"]
    base["out_bpe"] = init_linear(next(ks), e.hidden_dim, e.bpe_output_dim)

    nq = pj.block_size // pj.downsample_rate
    proj = {
        "layer_norms": {str(i): init_layer_norm(pj.encoder_dim)
                        for i in range(pj.num_encoder_layers)},
        "layer_projector": init_linear(
            next(ks), pj.num_encoder_layers * pj.encoder_dim,
            pj.hidden_size, bias=pj.mlp_bias),
        "query": jnp.zeros((1, nq, pj.hidden_size)),
        "window_positions": jnp.zeros((1, pj.block_size, pj.hidden_size)),
        "qformer": {"layers": {str(i): {
            "attn_norm": init_layer_norm(pj.hidden_size),
            "cross_attention": {
                "q_proj": init_linear(next(ks), pj.hidden_size,
                                      pj.hidden_size),
                "k_proj": init_linear(next(ks), pj.hidden_size,
                                      pj.hidden_size),
                "v_proj": init_linear(next(ks), pj.hidden_size,
                                      pj.hidden_size),
                "o_proj": init_linear(next(ks), pj.hidden_size,
                                      pj.hidden_size)},
            "mlp_norm": init_layer_norm(pj.hidden_size),
            "mlp": {
                "fc1": init_linear(next(ks), pj.hidden_size,
                                   pj.hidden_size * pj.mlp_ratio),
                "fc2": init_linear(next(ks), pj.hidden_size * pj.mlp_ratio,
                                   pj.hidden_size)},
        } for i in range(pj.num_layers)}},
        "out_norm": init_layer_norm(pj.hidden_size),
        "out_linear": init_linear(next(ks), pj.hidden_size, pj.llm_dim),
    }
    hd = tc.hidden_size // tc.num_attention_heads
    editor = {
        "embed_tokens": init_embedding(next(ks), tc.vocab_size,
                                       tc.hidden_size),
        "layers": {str(i): {
            "input_layernorm": init_rms_norm(tc.hidden_size),
            "self_attn": {
                "q_proj": init_linear(next(ks), tc.hidden_size,
                                      tc.num_attention_heads * hd,
                                      bias=False),
                "k_proj": init_linear(next(ks), tc.hidden_size,
                                      tc.num_key_value_heads * hd,
                                      bias=False),
                "v_proj": init_linear(next(ks), tc.hidden_size,
                                      tc.num_key_value_heads * hd,
                                      bias=False),
                "o_proj": init_linear(next(ks),
                                      tc.num_attention_heads * hd,
                                      tc.hidden_size, bias=False)},
            "post_attention_layernorm": init_rms_norm(tc.hidden_size),
            "mlp": {
                "gate_proj": init_linear(next(ks), tc.hidden_size,
                                         tc.intermediate_size, bias=False),
                "up_proj": init_linear(next(ks), tc.hidden_size,
                                       tc.intermediate_size, bias=False),
                "down_proj": init_linear(next(ks), tc.intermediate_size,
                                         tc.hidden_size, bias=False)},
        } for i in range(tc.num_hidden_layers)},
        "norm": init_rms_norm(tc.hidden_size),
    }
    return {"encoder": base, "projector": proj, "editor": editor}


class _GS_SHIM:
    """Adapter presenting nar config as granite_speech's ModelConfig shape
    (only the fields init_granite_speech reads for the encoder)."""

    def __init__(self, cfg: ModelConfig):
        self.enc = cfg.enc
        from ..granite_speech.granite_speech import (LlamaConfig,
                                                     ProjectorConfig as GP)
        self.proj = GP()
        self.text = LlamaConfig.from_dict(
            {"hidden_size": 64, "num_hidden_layers": 1,
             "intermediate_size": 64, "num_attention_heads": 2,
             "num_key_value_heads": 2, "vocab_size": 128})
        self.window_size = 15
        self.downsample_rate = 5


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """Granite Speech NAR — batch-1 single-pass ASR."""

    SAMPLE_RATE = 16000

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
        return self.SAMPLE_RATE

    def init_params(self, key):
        return init_nar(key, self.config)

    def model_quant_predicate(self, path, w):
        return path.startswith("editor.")

    def sanitize(self, weights: Dict) -> Dict:
        return {k: jnp.asarray(v) for k, v in weights.items()
                if not k.endswith("num_batches_tracked")}

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path), trust_remote_code=False)
        except Exception:
            model._tokenizer = None
        return model

    # ---------------------------------------------------------- features

    def _extract_features(self, audio) -> np.ndarray:
        """(T,) 16 kHz mono -> (T_enc, 160) stacked log-mel (same recipe as
        granite_speech 4.0)."""
        from ....dsp import hanning, mel_filters, spec_abs, stft

        wav = jnp.asarray(np.asarray(audio, np.float32).reshape(-1))
        n_fft, win_length, hop = 512, 400, 160
        n_mels = self.config.enc.input_dim // 2
        win = hanning(win_length, periodic=True)
        pad_l = (n_fft - win_length) // 2
        win = jnp.concatenate([jnp.zeros(pad_l), win,
                               jnp.zeros(n_fft - win_length - pad_l)])
        spec = stft(wav, n_fft=n_fft, hop_length=hop, window=win,
                    center=True, pad_mode="reflect")
        power = spec_abs(spec) ** 2
        fb = mel_filters(16000, n_fft, n_mels, mel_scale="htk",
                         precise=True)
        n_keep = 2 * (wav.shape[0] // (2 * hop))
        logmel = jnp.log10(jnp.clip(power[:n_keep] @ fb.T, 1e-10, None))
        logmel = jnp.maximum(logmel, logmel.max() - 8.0) / 4.0 + 1.0
        return np.asarray(logmel).reshape(-1, 2 * n_mels)

    # ---------------------------------------------------------- pipeline

    def _encode(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.config
        t = feats.shape[0]
        ctx = cfg.enc.context_size
        tb = _bucket(max(t, ctx), ENC_BUCKETS)
        tb = ((tb + ctx - 1) // ctx) * ctx
        key_ = ("enc", tb)
        fn = self._jit_cache.get(key_)
        if fn is None:
            def run(p, f, valid):
                bpe_logits, fused = nar_encoder_forward(p, cfg, f, valid)
                audio = nar_projector_forward(p, cfg, fused, valid)
                return jnp.argmax(bpe_logits, axis=-1), audio

            fn = jax.jit(run)
            self._jit_cache[key_] = fn
        buf = np.zeros((1, tb, feats.shape[1]), np.float32)
        buf[0, :t] = feats
        bpe_argmax, audio = fn(self.params, jnp.asarray(buf), jnp.int32(t))
        n_pool = t // cfg.enc.bpe_pooling_window
        nblocks = math.ceil(t / cfg.proj.block_size)
        nq = cfg.proj.block_size // cfg.proj.downsample_rate
        return (np.asarray(bpe_argmax)[0, :n_pool],
                np.asarray(audio)[0, :nblocks * nq])

    def _edit(self, audio_embeds: np.ndarray, text_ids: np.ndarray
              ) -> np.ndarray:
        cfg = self.config
        tc = cfg.text
        text_embeds = np.asarray(apply_embedding(
            self.params["editor"]["embed_tokens"],
            jnp.asarray(text_ids[None], jnp.int32)))[0]
        if cfg.scale_projected_embeddings:
            audio_embeds = audio_embeds / tc.embedding_multiplier
        audio_len = len(audio_embeds)
        total = audio_len + len(text_ids)
        tb = _bucket(total, EDIT_BUCKETS)
        buf = np.zeros((1, tb, tc.hidden_size), np.float32)
        buf[0, :audio_len] = audio_embeds
        buf[0, audio_len:total] = text_embeds
        key_ = ("edit", tb, audio_len)
        fn = self._jit_cache.get(key_)
        if fn is None:
            fn = jax.jit(lambda p, e, v: editor_forward(
                p, tc, e, v, audio_len))
            self._jit_cache[key_] = fn
        logits = fn(self.params, jnp.asarray(buf), jnp.int32(total))
        n_text = len(text_ids)
        return np.asarray(jnp.argmax(logits, axis=-1))[0, :n_text]

    def transcribe_tokens(self, feats: np.ndarray) -> np.ndarray:
        cfg = self.config
        blank = cfg.blank_token_id
        bpe_argmax, audio_embeds = self._encode(feats)
        hypothesis = ctc_collapse_decode(bpe_argmax, blank_id=blank)
        text_ids = add_insertion_slots(hypothesis, blank_id=blank,
                                       min_len=cfg.min_edit_sequence_length)
        edited = self._edit(audio_embeds, text_ids)
        return ctc_collapse_decode(edited, blank_id=blank)

    def generate(self, audio, **kwargs) -> STTOutput:
        if isinstance(audio, str):
            from ...utils import load_audio

            audio = load_audio(audio, sample_rate=self.sample_rate)
        t0 = time.time()
        feats = self._extract_features(audio)
        tokens = self.transcribe_tokens(feats)
        if self._tokenizer is not None:
            text = self._tokenizer.decode([int(t) for t in tokens],
                                          skip_special_tokens=True)
        else:
            text = " ".join(str(int(t)) for t in tokens)
        wall = time.time() - t0
        return STTOutput(text=text, total_time=wall,
                         generation_tokens=len(tokens),
                         generation_tps=len(tokens) / wall if wall else 0.0)


__all__ = ["Model", "ModelConfig", "EncoderConfig", "ProjectorConfig",
           "TextConfig", "ctc_collapse_decode", "add_insertion_slots"]
