"""TADA: text-audio dual alignment TTS (llama + flow head + DAC codec).

Parity: /root/reference/mlx_audio/tts/models/tada/
(llama backbone + acoustic/time/mask embeddings tada.py:45-98 & :250-271,
adaLN diffusion head over [acoustic | gray-coded duration] latents
diffusion_head.py, scheduled-CFG flow matching :128-244, chat-frame prompt
with <|eot_id|>*shift suffix :720-760, prompt masking for negative stream
:1130-1200, DAC codec decode with segment attention codec.py, wav2vec2 CTC
aligner for reference cloning :489-641, speed_up_factor two-pass :1270-1310,
gray_code.py duration coding, text_utils.py normalization).

TPU design: each AR step is ONE compiled program — the llama decode step
(pos + negative CFG stream as a batch-2 cache), the ENTIRE scheduled-CFG
flow-matching integration (static t-grid, per-step cfg scales folded in as
constants), and the gray-code slots — the host only decodes the duration
integers and slices prompt overrides. Waveform decode is one bucketed
program over the expanded latent track.
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from typing import Dict, Generator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

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
from ....ops.kvcache import KVCache
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..llama.llama import (
    ModelConfig as LlamaConfig,
    init_llama,
    llama_forward,
)
from .codec import (
    dac_decoder_forward,
    init_dac_decoder,
    init_local_attention,
    init_wav_encoder,
    local_attention_forward,
    segment_attention_mask,
    wav_encoder_forward,
)

Array = jax.Array

MAX_CACHE_LEN = 4096
LATENT_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# --------------------------------------------------------------- gray code

def int_to_gray_bits(n: int, num_bits: int) -> List[float]:
    gray = n ^ (n >> 1)
    return [1.0 if (gray >> i) & 1 else -1.0
            for i in range(num_bits - 1, -1, -1)]


def gray_bits_to_int(bits) -> int:
    gray = 0
    for b in bits:
        gray = (gray << 1) | (1 if b > 0 else 0)
    n = gray
    mask = n >> 1
    while mask:
        n ^= mask
        mask >>= 1
    return n


# ------------------------------------------------------------ text utils

_PUNCT_SUBS = {"“": '"', "”": '"', "„": '"', "‟": '"',
               "‘": "'", "’": "'", "‚": "'", "‛": "'",
               "–": "-", "—": "-", "―": "-", "‐": "-",
               "‑": "-", "…": "...", "‹": "<",
               "›": ">", "«": "<<", "»": ">>"}


def normalize_text(text: str) -> str:
    """TADA text cleanup (ref text_utils.py)."""
    pattern = re.compile("|".join(re.escape(c) for c in _PUNCT_SUBS))
    text = pattern.sub(lambda m: _PUNCT_SUBS[m.group(0)], text)
    text = (text.replace("; ", ". ").replace('"', "").replace(":", ",")
            .replace("(", "").replace(")", "").replace("--", "-")
            .replace("-", ", ").replace(",,", ",").replace(" '", " ")
            .replace("' ", " ").replace("  ", " "))
    text = re.sub(r"\s+([.,?!])", r"\1", text)
    text = re.sub(r"([.!?]\s*)(\w)",
                  lambda m: m.group(1) + m.group(2).upper(), text.lower())
    return text[0].upper() + text[1:] if text else text


# ---------------------------------------------------------------- config

@dataclass
class ModelConfig(BaseModelArgs):
    vocab_size: int = 128256
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 8192
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_position_embeddings: int = 131072
    tie_word_embeddings: bool = True

    acoustic_dim: int = 512
    num_time_classes: int = 256
    shift_acoustic: int = 5
    head_layers: int = 6
    head_ffn_ratio: float = 4.0
    bottleneck_dim: Optional[int] = None
    context_window: int = 8
    acoustic_mean: float = 0.0
    acoustic_std: float = 1.5

    decoder_hidden_dim: int = 1024
    decoder_d_model: int = 96
    decoder_embed_dim: int = 512
    decoder_strides: List[int] = field(default_factory=lambda: [4, 4, 5, 6])
    decoder_num_attn_layers: int = 6
    decoder_num_attn_heads: int = 8
    decoder_attn_dim_feedforward: int = 4096
    decoder_block_attention: str = "v2"

    encoder_hidden_dim: int = 1024
    encoder_d_model: int = 96
    encoder_embed_dim: int = 512
    encoder_strides: List[int] = field(default_factory=lambda: [6, 5, 4, 4])
    encoder_num_attn_layers: int = 6
    encoder_num_attn_heads: int = 8
    encoder_attn_dim_feedforward: int = 4096
    encoder_block_attention: str = "v2"
    encoder_std: float = 0.5

    sample_rate: int = 24000
    model_type: str = "tada"
    eos_token_id: Union[int, List[int]] = 128001
    rope_scaling: Optional[dict] = None
    model_path: str = ""

    @property
    def num_time_bits(self) -> int:
        return math.ceil(math.log2(self.num_time_classes))

    @property
    def time_dim(self) -> int:
        return 2 * self.num_time_bits

    @property
    def latent_size(self) -> int:
        return self.acoustic_dim + self.time_dim

    def llama_config(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            intermediate_size=self.intermediate_size,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_key_value_heads,
            vocab_size=self.vocab_size, rms_norm_eps=self.rms_norm_eps,
            rope_theta=self.rope_theta, head_dim=self.head_dim,
            tie_word_embeddings=True)


# --------------------------------------------------------- diffusion head

def init_diffusion_head(key, cfg: ModelConfig) -> dict:
    hidden = cfg.bottleneck_dim or cfg.hidden_size
    ffn = int(hidden * cfg.head_ffn_ratio)
    ks = iter(jax.random.split(key, 8 * cfg.head_layers + 8))
    layers = {}
    for i in range(cfg.head_layers):
        layers[str(i)] = {
            "ffn": {"gate_proj": init_linear(next(ks), hidden, ffn,
                                             bias=False),
                    "up_proj": init_linear(next(ks), hidden, ffn,
                                           bias=False),
                    "down_proj": init_linear(next(ks), ffn, hidden,
                                             bias=False)},
            "norm": init_rms_norm(hidden),
            "adaLN": init_linear(next(ks), hidden, 3 * hidden, bias=False)}
    return {
        "noisy_images_proj": init_linear(next(ks), cfg.latent_size, hidden,
                                         bias=False),
        "cond_proj": init_linear(next(ks), hidden, hidden, bias=False),
        "t_embedder": {"fc1": init_linear(next(ks), 256, hidden),
                       "fc2": init_linear(next(ks), hidden, hidden)},
        "layers": layers,
        "final": {"linear": init_linear(next(ks), hidden, cfg.latent_size,
                                        bias=False),
                  "adaLN": init_linear(next(ks), hidden, 2 * hidden,
                                       bias=False)},
    }


def diffusion_head_forward(p: dict, cfg: ModelConfig, x: Array, t: Array,
                           cond: Array) -> Array:
    """(B, latent), (B,), (B, hidden) -> velocity (B, latent)."""
    eps = cfg.rms_norm_eps
    h = apply_linear(p["noisy_images_proj"], x)
    half = 128
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None] * 1000.0
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    temb = apply_linear(p["t_embedder"]["fc2"],
                        jax.nn.silu(apply_linear(p["t_embedder"]["fc1"],
                                                 emb)))
    c = apply_linear(p["cond_proj"], cond) + temb
    c_act = jax.nn.silu(c)
    for i in range(cfg.head_layers):
        blk = p["layers"][str(i)]
        mod = apply_linear(blk["adaLN"], c_act)
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        hn = apply_rms_norm(blk["norm"], h, eps) * (1 + scale) + shift
        f = blk["ffn"]
        ff = apply_linear(f["down_proj"],
                          jax.nn.silu(apply_linear(f["gate_proj"], hn))
                          * apply_linear(f["up_proj"], hn))
        h = h + gate * ff
    mod = apply_linear(p["final"]["adaLN"], c_act)
    shift, scale = jnp.split(mod, 2, axis=-1)
    hn = h * jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + eps)
    return apply_linear(p["final"]["linear"], hn * (1 + scale) + shift)


def build_time_schedule(num_steps: int, schedule: str) -> np.ndarray:
    if schedule == "cosine":
        u = np.linspace(0, 1, num_steps + 1)
        return 0.5 * (1 - np.cos(np.pi * u))
    if schedule == "logsnr":
        log_snr = np.linspace(5.0, -5.0, num_steps + 1)
        t = 1.0 / (1.0 + np.exp(log_snr / 2))
        t[0], t[-1] = 0.0, 1.0
        return t
    return np.linspace(0, 1, num_steps + 1)


def scheduled_cfg(base: float, t: float, schedule: str) -> float:
    if schedule == "constant" or base == 1.0:
        return base
    if schedule == "linear":
        return 1.0 + (base - 1.0) * (1.0 - t)
    if schedule == "cosine":
        return 1.0 + (base - 1.0) * 0.5 * (1.0 + math.cos(math.pi * t))
    return base


# ----------------------------------------------------------------- model

class Model(FunctionalModel):
    """TADA (HumeAI) — duration-aware flow-matching token TTS."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self._encoder_params = None
        self._aligner = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        cfg = self.config
        ks = iter(jax.random.split(key, 12))
        p = {
            "model": init_llama(next(ks), cfg.llama_config(),
                                lm_head=False)["model"],
            "acoustic_proj": init_linear(next(ks), cfg.acoustic_dim,
                                         cfg.hidden_size),
            "time_start_embed": init_embedding(next(ks),
                                               cfg.num_time_classes,
                                               cfg.hidden_size),
            "time_end_embed": init_embedding(next(ks), cfg.num_time_classes,
                                             cfg.hidden_size),
            "acoustic_mask_emb": init_embedding(next(ks), 2,
                                                cfg.hidden_size),
            "prediction_head": init_diffusion_head(next(ks), cfg),
            "decoder": {
                "decoder_proj": init_linear(next(ks), cfg.decoder_embed_dim,
                                            cfg.decoder_hidden_dim),
                "local_attention_decoder": init_local_attention(
                    next(ks), cfg.decoder_hidden_dim,
                    cfg.decoder_num_attn_layers, cfg.decoder_num_attn_heads,
                    cfg.decoder_attn_dim_feedforward),
                "wav_decoder": init_dac_decoder(
                    next(ks), cfg.decoder_d_model, cfg.decoder_strides,
                    cfg.decoder_hidden_dim)},
        }
        if cfg.bottleneck_dim is not None:
            p["bottleneck_proj"] = init_linear(next(ks), cfg.hidden_size,
                                               cfg.bottleneck_dim)
        return p

    def init_encoder_params(self, key):
        """Codec encoder (loaded from tada-codec; random for tests)."""
        cfg = self.config
        k1, k2, k3, k4 = jax.random.split(key, 4)
        p = {
            "wav_encoder": init_wav_encoder(k1, 64, cfg.encoder_strides,
                                            cfg.encoder_hidden_dim),
            "local_attention_encoder": init_local_attention(
                k2, cfg.encoder_hidden_dim, cfg.encoder_num_attn_layers,
                cfg.encoder_num_attn_heads,
                cfg.encoder_attn_dim_feedforward),
            "pos_emb": init_embedding(k3, 2, cfg.encoder_hidden_dim)}
        if cfg.encoder_hidden_dim != cfg.encoder_embed_dim:
            p["hidden_linear"] = init_linear(k4, cfg.encoder_hidden_dim,
                                             cfg.encoder_embed_dim)
        self._encoder_params = p
        return p

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k or k == "lm_head.weight":
                continue
            out[k] = jnp.asarray(v)
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model._tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model._tokenizer = None
        return model

    # ------------------------------------------------------------ embeds

    def _step_embed(self, p, ids, acoustic, masks, t_before, t_after):
        return (apply_embedding(p["model"]["embed_tokens"], ids)
                + apply_linear(p["acoustic_proj"], acoustic)
                + apply_embedding(p["acoustic_mask_emb"], masks)
                + apply_embedding(p["time_start_embed"], t_before)
                + apply_embedding(p["time_end_embed"], t_after))

    def _bottleneck(self, p, x):
        if "bottleneck_proj" in p:
            return apply_linear(p["bottleneck_proj"], x)
        return x

    # ---------------------------------------------------------- compiled

    def _step_fn(self, fm_steps: int, acoustic_cfg: float,
                 duration_cfg: float, cfg_schedule: str,
                 time_schedule: str, noise_temperature: float):
        cfg = self.config
        lc = cfg.llama_config()
        t_span = build_time_schedule(fm_steps, time_schedule)
        need_neg = acoustic_cfg != 1.0

        def flow(p, cond, neg_cond, key):
            key, sub = jax.random.split(key)
            speech = jax.random.normal(sub, (1, cfg.latent_size),
                                       jnp.float32) * noise_temperature
            t_curr = float(t_span[0])
            for i in range(1, len(t_span)):
                dt = float(t_span[i]) - t_curr
                a_cfg = scheduled_cfg(acoustic_cfg, t_curr, cfg_schedule)
                d_cfg = scheduled_cfg(duration_cfg, t_curr, cfg_schedule)
                if need_neg:
                    sp2 = jnp.concatenate([speech, speech], axis=0)
                    c2 = jnp.concatenate(
                        [self._bottleneck(p, cond),
                         self._bottleneck(p, neg_cond)], axis=0)
                    t2 = jnp.full((2,), t_curr, jnp.float32)
                    v = diffusion_head_forward(p["prediction_head"], cfg,
                                               sp2, t2, c2)
                    vp, vn = v[:1], v[1:]
                    ad = cfg.acoustic_dim
                    vel = jnp.concatenate(
                        [vn[..., :ad] + a_cfg * (vp[..., :ad]
                                                 - vn[..., :ad]),
                         vn[..., ad:] + d_cfg * (vp[..., ad:]
                                                 - vn[..., ad:])], axis=-1)
                else:
                    vel = diffusion_head_forward(
                        p["prediction_head"], cfg, speech,
                        jnp.full((1,), t_curr, jnp.float32),
                        self._bottleneck(p, cond))
                speech = speech + dt * vel
                t_curr = float(t_span[i])
            return speech, key

        def step(p, caches, offset, ids, neg_ids, acoustic, masks,
                 t_before, t_after, key):
            """One AR step: batch-2 (pos, neg) llama step + flow matching."""
            b = 2 if need_neg else 1
            ids2 = jnp.concatenate([ids, neg_ids], axis=0) if need_neg \
                else ids
            ac2 = jnp.concatenate([acoustic] * b, axis=0)
            mk2 = jnp.concatenate([masks] * b, axis=0)
            tb2 = jnp.concatenate([t_before] * b, axis=0)
            ta2 = jnp.concatenate([t_after] * b, axis=0)
            embeds = self._step_embed(p, ids2, ac2, mk2, tb2, ta2)
            hidden, caches = llama_forward(
                {"model": p["model"]}, lc, embeds, caches=caches,
                offset=offset)
            cond = hidden[:1, -1]
            neg_cond = hidden[1:2, -1] if need_neg else cond
            speech, key = flow(p, cond, neg_cond, key)
            return caches, speech, key

        return jax.jit(step, donate_argnums=(1,))

    # ---------------------------------------------------------- decoding

    def decode_wav(self, encoded: np.ndarray,
                   time_before: np.ndarray) -> np.ndarray:
        """Expand latents over silence gaps and run the codec decoder
        (ref _decode_wav :404-427)."""
        cfg = self.config
        time_before = time_before[: encoded.shape[0] + 1]
        if time_before.shape[0] == 0:
            return np.zeros((0,), np.float32)
        rows = []
        for pos in range(encoded.shape[0]):
            n_zeros = max(0, int(time_before[pos]) - 1)
            if n_zeros:
                rows.append(np.zeros((n_zeros, encoded.shape[-1]),
                                     np.float32))
            rows.append(encoded[pos:pos + 1])
        n_trail = int(time_before[-1])
        if n_trail:
            rows.append(np.zeros((n_trail, encoded.shape[-1]), np.float32))
        expanded = np.concatenate(rows, axis=0)
        token_masks = (np.linalg.norm(expanded, axis=-1) != 0).astype(
            np.int32)
        n = expanded.shape[0]
        lb = _bucket(n, LATENT_BUCKETS)
        exp_b = np.zeros((1, lb, expanded.shape[-1]), np.float32)
        exp_b[0, :n] = expanded
        mask_b = np.zeros((1, lb), np.int32)
        mask_b[0, :n] = token_masks

        fn = self._jit_cache.get(("codec_dec", lb))
        if fn is None:
            def dec(p, x, tmask, valid):
                d = p["decoder"]
                h = apply_linear(d["decoder_proj"], x)
                attn = segment_attention_mask(
                    tmask, version=cfg.decoder_block_attention)
                pad_block = (jnp.arange(x.shape[1])[None, :]
                             >= valid)[:, None, :]
                attn = attn | pad_block
                h = local_attention_forward(
                    d["local_attention_decoder"], h,
                    cfg.decoder_num_attn_heads, mask=attn)
                return dac_decoder_forward(d["wav_decoder"],
                                           cfg.decoder_strides, h)

            fn = jax.jit(dec)
            self._jit_cache[("codec_dec", lb)] = fn
        hop = int(np.prod(cfg.decoder_strides))
        wav = np.asarray(fn(self.params, jnp.asarray(exp_b),
                            jnp.asarray(mask_b), jnp.int32(n)))
        return wav[0, :n * hop, 0]

    # --------------------------------------------------- reference encode

    def encode_reference(self, audio: np.ndarray, text: str
                         ) -> Tuple[np.ndarray, np.ndarray, str]:
        """-> (token_values (1, N, D), token_positions (1, N), text).

        Uses the codec encoder + a CTC aligner (our functional wav2vec2 /
        mms model bound as self._aligner) — ref :553-641."""
        if self._encoder_params is None or self._tokenizer is None:
            raise RuntimeError("codec encoder / tokenizer not loaded")
        cfg = self.config
        text = normalize_text(text)
        text_ids = np.asarray(self._tokenizer.encode(
            text, add_special_tokens=False), np.int64)
        audio = np.asarray(audio, np.float32).reshape(-1)
        num_frames = int(np.ceil(len(audio) / cfg.sample_rate * 50))

        if self._aligner is not None:
            import scipy.signal as _sig  # noqa: F401 — resample below

            n16 = int(len(audio) * 16000 / cfg.sample_rate)
            idx = np.linspace(0, len(audio) - 1, n16)
            audio16 = np.interp(idx, np.arange(len(audio)), audio) \
                .astype(np.float32)
            logits = self._aligner.logits(audio16)
            positions, token_masks = align_text_tokens(
                np.asarray(logits), text_ids, len(audio), cfg.sample_rate)
        else:
            # uniform fallback alignment (no aligner weights bound)
            positions = np.linspace(1, max(num_frames - 1, 1),
                                    len(text_ids)).astype(np.int64)
            token_masks = np.zeros(num_frames, np.int64)
            token_masks[np.clip(positions - 1, 0, num_frames - 1)] = 1

        token_values = self._encoder_forward(audio, positions, token_masks)
        return token_values, positions[None], text

    def _encoder_forward(self, audio: np.ndarray, positions: np.ndarray,
                         token_masks: np.ndarray) -> np.ndarray:
        cfg = self.config
        p = self._encoder_params
        padded = np.pad(audio, (0, 960))[None, :, None]
        enc = wav_encoder_forward(p["wav_encoder"], cfg.encoder_strides,
                                  jnp.asarray(padded))
        seq = enc.shape[1]
        tm = np.zeros(seq, np.int64)
        n = min(seq, len(token_masks))
        tm[:n] = token_masks[:n]
        tm_j = jnp.asarray(tm[None])
        enc = enc + apply_embedding(p["pos_emb"], tm_j.astype(jnp.int32))
        attn = segment_attention_mask(tm_j,
                                      version=cfg.encoder_block_attention)
        enc = local_attention_forward(p["local_attention_encoder"], enc,
                                      cfg.encoder_num_attn_heads, mask=attn)
        if "hidden_linear" in p:
            enc = apply_linear(p["hidden_linear"], enc)
        enc = np.asarray(enc)[0]
        enc = enc * tm[:, None]
        pos = np.clip(positions - 1, 0, enc.shape[0] - 1)
        vals = enc[pos]
        vals = (vals - cfg.acoustic_mean) / cfg.acoustic_std
        return vals[None]

    # ---------------------------------------------------------- generate

    def _prompt_ids(self, full_text: str) -> Tuple[List[int], int]:
        tok = self._tokenizer
        bos = tok.bos_token_id
        eot = tok.convert_tokens_to_ids("<|eot_id|>")
        sh = tok.convert_tokens_to_ids("<|start_header_id|>")
        eh = tok.convert_tokens_to_ids("<|end_header_id|>")
        system = list(tok.encode("system", add_special_tokens=False))
        assistant = list(tok.encode("assistant", add_special_tokens=False))
        prefix_text = [sh] + system + [eh, eot, sh] + assistant + [eh]
        ids = ([bos] + prefix_text
               + list(tok.encode(full_text, add_special_tokens=False))
               + [eot] * self.config.shift_acoustic)
        return ids, len(prefix_text)

    def generate(self, text: str, ref_audio=None, ref_text=None,
                 voice=None, acoustic_cfg_scale: float = 1.6,
                 duration_cfg_scale: float = 1.0,
                 cfg_schedule: str = "cosine",
                 noise_temperature: float = 0.9,
                 num_flow_matching_steps: int = 20,
                 time_schedule: str = "logsnr",
                 num_transition_steps: int = 5, max_tokens: int = 1024,
                 speed_up_factor: Optional[float] = None, seed: int = 0,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        if self._tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        cfg = self.config
        t0 = time.perf_counter()
        text = normalize_text(text)

        prompt_vals = prompt_positions = None
        prompt_text = ""
        if ref_audio is not None and ref_text is not None:
            if isinstance(ref_audio, str):
                from ....utils import load_audio

                ref_audio = np.asarray(load_audio(
                    ref_audio, sample_rate=cfg.sample_rate))
            prompt_vals, prompt_positions, prompt_text = \
                self.encode_reference(np.asarray(ref_audio), ref_text)

        ids, prefix_len = self._prompt_ids(prompt_text + text)
        wav = self._run(ids, prefix_len, prompt_vals, prompt_positions,
                        acoustic_cfg_scale, duration_cfg_scale,
                        cfg_schedule, noise_temperature,
                        num_flow_matching_steps, time_schedule,
                        num_transition_steps, max_tokens, speed_up_factor,
                        seed)
        dt = max(time.perf_counter() - t0, 1e-6)
        dur = len(wav) / cfg.sample_rate
        yield GenerationResult(
            audio=wav, samples=len(wav), sample_rate=cfg.sample_rate,
            segment_idx=0, token_count=len(ids),
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3),
            prompt={"tokens": len(ids),
                    "tokens-per-sec": round(len(ids) / dt, 2)},
            audio_samples={"samples": len(wav),
                           "samples-per-sec": round(len(wav) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb())

    def _run(self, ids, prefix_len, prompt_vals, prompt_positions,
             acoustic_cfg, duration_cfg, cfg_schedule, noise_temperature,
             fm_steps, time_schedule, num_transition_steps, max_tokens,
             speed_up_factor, seed,
             time_override: Optional[np.ndarray] = None) -> np.ndarray:
        cfg = self.config
        tok = self._tokenizer
        shift = cfg.shift_acoustic
        need_neg = acoustic_cfg != 1.0
        eot = tok.convert_tokens_to_ids("<|eot_id|>")
        sh = tok.convert_tokens_to_ids("<|start_header_id|>")
        eh = tok.convert_tokens_to_ids("<|end_header_id|>")
        try:
            pad_id = tok.convert_tokens_to_ids("<|finetune_right_pad_id|>")
        except Exception:
            pad_id = 0
        structural = {sh, eh, eot, tok.bos_token_id, 128001}

        input_ids = np.asarray(ids, np.int32)
        num_steps = min(len(ids), max_tokens)

        # prompt-audio timing tracks (padded for the chat prefix)
        has_prompt = prompt_vals is not None and prompt_vals.shape[1] > 0
        pa = pm = ptb = pta = None
        if has_prompt:
            tp = np.asarray(prompt_positions[0])
            tp_pad = np.insert(tp, 0, 1)
            gaps = np.clip(tp - tp_pad[:-1], 0, cfg.num_time_classes - 1)
            gaps = np.insert(gaps, 0, 0)
            pa = np.pad(prompt_vals, ((0, 0), (prefix_len, 0), (0, 0)))
            pm = np.pad(np.ones(prompt_vals.shape[:2], np.int32),
                        ((0, 0), (prefix_len, 0)))
            ptb = np.pad(gaps[:-1][None], ((0, 0), (prefix_len, 0))) \
                .astype(np.int32)
            pta = np.pad(gaps[1:][None], ((0, 0), (prefix_len, 0))) \
                .astype(np.int32)
            if num_transition_steps > 0 and pa.shape[1] > \
                    num_transition_steps:
                pa = pa[:, :-num_transition_steps]
                pm = pm[:, :-num_transition_steps]
                ptb = ptb[:, :-num_transition_steps]
                pta = pta[:, :-num_transition_steps]
            pm = np.concatenate([pm[:, 1:], np.ones_like(pm[:, :1])],
                                axis=1)
            # mask non-structural prompt text tokens
            plen = pa.shape[1]
            pids = input_ids[:plen]
            is_struct = np.isin(pids, list(structural))
            depth = np.cumsum(pids == sh) - np.cumsum(pids == eh)
            is_struct |= (depth > 0) | (pids == sh) | (pids == eh)
            input_ids = np.concatenate(
                [np.where(is_struct, pids, pad_id), input_ids[plen:]])
        if time_override is not None:
            # speed-control second pass: durations forced from pass 1
            ptb = time_override["before"]
            pta = time_override["after"]

        sk = ("step", fm_steps, acoustic_cfg, duration_cfg, cfg_schedule,
              time_schedule, noise_temperature)
        step = self._jit_cache.get(sk)
        if step is None:
            step = self._step_fn(fm_steps, acoustic_cfg, duration_cfg,
                                 cfg_schedule, time_schedule,
                                 noise_temperature)
            self._jit_cache[sk] = step

        key = jax.random.PRNGKey(seed)
        caches = None
        acoustic = np.zeros((1, 1, cfg.acoustic_dim), np.float32)
        masks = np.zeros((1, 1), np.int32)
        tb = np.zeros((1, 1), np.int32)
        ta = np.zeros((1, 1), np.int32)
        all_ac: List[np.ndarray] = []
        all_tb: List[int] = []
        nb = cfg.num_time_bits

        lc = cfg.llama_config()
        for step_i in range(num_steps):
            sl = input_ids[step_i:step_i + 1][None]
            if need_neg:
                neg = np.where(np.isin(sl, list(structural)), sl, pad_id) \
                    .astype(np.int32)
            else:
                neg = sl
            if caches is None:
                batch = 2 if need_neg else 1
                caches = [KVCache.init(batch, MAX_CACHE_LEN,
                                       lc.num_key_value_heads,
                                       lc.resolved_head_dim, jnp.float32)
                          for _ in range(lc.num_hidden_layers)]
            caches, speech, key = step(
                self.params, caches, jnp.int32(step_i), jnp.asarray(sl),
                jnp.asarray(neg), jnp.asarray(acoustic),
                jnp.asarray(masks), jnp.asarray(tb), jnp.asarray(ta), key)
            sp = np.asarray(speech)[0]
            t_gray = sp[-cfg.time_dim:]
            pred_tb = gray_bits_to_int(t_gray[:nb])
            pred_ta = gray_bits_to_int(t_gray[nb:])

            if step_i >= shift:
                j = step_i - shift
                if has_prompt and pa is not None and j < pa.shape[1]:
                    acoustic = pa[:, j:j + 1].astype(np.float32)
                    masks = pm[:, j:j + 1].astype(np.int32)
                else:
                    acoustic = sp[None, None, :cfg.acoustic_dim] \
                        .astype(np.float32)
                    masks = np.ones((1, 1), np.int32)
                all_ac.append(acoustic.copy())
                use_prompt_time = ((has_prompt or time_override is not None)
                                   and ptb is not None
                                   and j < ptb.shape[1] - 1)
                if use_prompt_time:
                    tb = ptb[:, j + 1:j + 2].astype(np.int32)
                    ta = pta[:, j + 1:j + 2].astype(np.int32)
                else:
                    tb = np.asarray([[pred_tb]], np.int32)
                    ta = np.asarray([[pred_ta]], np.int32)
                all_tb.append(int(tb[0, 0]))

        if not all_ac:
            return np.zeros((0,), np.float32)
        all_tb.append(all_tb[-1])

        if speed_up_factor is not None:
            scaled = np.round(np.asarray(all_tb[:-1], np.float32)
                              / speed_up_factor).astype(np.int32)[None]
            override = {
                "before": np.concatenate(
                    [np.zeros_like(scaled[:, :1]), scaled], axis=1),
                "after": np.concatenate(
                    [scaled, np.ones_like(scaled[:, :1])], axis=1)}
            return self._run(ids, prefix_len, prompt_vals,
                             prompt_positions, acoustic_cfg, duration_cfg,
                             cfg_schedule, noise_temperature, fm_steps,
                             time_schedule, num_transition_steps,
                             max_tokens, None, seed,
                             time_override=override)

        encoded = np.concatenate(all_ac, axis=1)[0]
        encoded = encoded * cfg.acoustic_std + cfg.acoustic_mean
        times = np.asarray(all_tb, np.int32)
        if has_prompt:
            skip = pa.shape[1] + num_transition_steps - 1
        else:
            skip = max(0, prefix_len - num_transition_steps) \
                + num_transition_steps - 1
        if 0 < skip < encoded.shape[0]:
            encoded = encoded[skip:]
            times = times[skip:]
        wav = self.decode_wav(encoded, times)
        if len(times):
            lead = int(cfg.sample_rate * int(times[0]) / 50)
            if 0 < lead < len(wav):
                wav = wav[lead:]
        return wav


def align_text_tokens(logits: np.ndarray, text_tokens: np.ndarray,
                      audio_length: int, sample_rate: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic greedy CTC alignment (ref tada.py:1590-1648)."""
    t_frames, _ = logits.shape
    n = len(text_tokens)
    num_frames = int(np.ceil(audio_length / sample_rate * 50))
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(num_frames, np.int64)
    ctc_to_codec = np.linspace(0, num_frames - 1, t_frames).astype(np.int64)
    log_probs = logits - np.log(
        np.sum(np.exp(logits), axis=-1, keepdims=True) + 1e-10)
    scores = np.stack([log_probs[:, tok] for tok in text_tokens])
    positions = np.zeros(n, np.int64)
    min_gap = max(1, t_frames // (n + 1))
    for i in range(n):
        start = int(positions[i - 1] + min_gap) if i > 0 else 0
        end = t_frames - (n - i - 1) * min_gap
        if start >= end:
            start = max(0, end - 1)
        positions[i] = start + int(np.argmax(scores[i, start:end]))
    codec_positions = ctc_to_codec[positions]
    token_masks = np.zeros(num_frames, np.int64)
    for pos in codec_positions:
        if 0 <= pos < num_frames:
            token_masks[pos] = 1
    return codec_positions + 1, token_masks


__all__ = ["Model", "ModelConfig", "normalize_text", "int_to_gray_bits",
           "gray_bits_to_int", "build_time_schedule", "scheduled_cfg",
           "align_text_tokens"]
