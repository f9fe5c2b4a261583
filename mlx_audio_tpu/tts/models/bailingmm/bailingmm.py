"""Ming-Omni TTS (bailingmm): LLM -> flow-matched latents -> AudioVAE.

Parity: /root/reference/mlx_audio/tts/models/bailingmm/bailingmm.py
(DiT/CFM flow head with CFG + EPSS timesteps :799-1032, Aggregator latent
patcher :868-899, AudioVAE Encoder/Decoder with ISTFT head + streaming
linear upsample :1035-1408, prompt frame `<role>HUMAN</role>...<audio>`
:1506-1566, per-step sample loop with stop head :1610-1681).

TPU design:
- The AR loop over latent patches compiles into three cached programs:
  prompt prefill (bucketed), a single LLM decode step, and the CFM flow
  integration (all `flow_steps` DiT evaluations trace into ONE program —
  the reference syncs per Euler step).
- The ISTFT head runs mag/phase -> irfft -> conv-transpose overlap-add on
  the MXU (ops in dsp.py); only the streaming chunk buffers live on host.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....dsp import overlap_add
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..moss_tts_nano.gpt2 import _interleaved_rope
from .backbones import (
    BailingMoeConfig,
    Qwen2Config,
    bailing_moe_forward,
    init_bailing_moe,
    init_qwen2,
    qwen2_forward,
)

Array = jax.Array

PROMPT_BUCKETS = (128, 256, 512, 1024, 2048)
MAX_CACHE_LEN = 4096

MOE_KEYS = ("moe_intermediate_size", "num_experts", "num_shared_experts",
            "norm_topk_prob", "num_experts_per_tok", "first_k_dense_replace")


def _bucket(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return PROMPT_BUCKETS[-1]


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "ming_omni_tts"
    text_config: Optional[dict] = None
    audio_tokenizer_config: Optional[dict] = None
    ditar_config: Optional[dict] = None
    aggregator_config: Optional[dict] = None
    model_path: Optional[str] = None

    @classmethod
    def from_dict(cls, config: dict) -> "ModelConfig":
        return cls(
            model_type=config.get("model_type", "ming_omni_tts"),
            text_config=config.get("llm_config",
                                   config.get("text_config")),
            audio_tokenizer_config=config.get("audio_tokenizer_config"),
            ditar_config=config.get("ditar_config"),
            aggregator_config=config.get("aggregator_config"),
            model_path=config.get("model_path"),
        )


# ------------------------------------------------------------ DiT blocks

def _init_dit_block(ks, hidden: int, heads: int, mlp_ratio: float) -> dict:
    inner = int(hidden * mlp_ratio)
    return {
        "norm1": init_rms_norm(hidden),
        "attn": {
            "to_q": init_linear(next(ks), hidden, hidden),
            "to_k": init_linear(next(ks), hidden, hidden),
            "to_v": init_linear(next(ks), hidden, hidden),
            "to_out": init_linear(next(ks), hidden, hidden)},
        "norm2": init_rms_norm(hidden),
        "ff_in": init_linear(next(ks), hidden, inner),
        "ff_out": init_linear(next(ks), inner, hidden),
    }


def _dit_block(p: dict, x: Array, heads: int) -> Array:
    b, t, d = x.shape
    dh = d // heads
    h = apply_rms_norm(p["norm1"], x, 1e-6)
    a = p["attn"]
    positions = jnp.arange(t)[None, :]
    q = apply_linear(a["to_q"], h).reshape(b, t, heads, dh)
    k = apply_linear(a["to_k"], h).reshape(b, t, heads, dh)
    v = apply_linear(a["to_v"], h).reshape(b, t, heads, dh)
    q = _interleaved_rope(q, positions, dh, 10000.0)
    k = _interleaved_rope(k, positions, dh, 10000.0)
    x = x + apply_linear(a["to_out"],
                         attention(q, k, v).reshape(b, t, d))
    h = apply_rms_norm(p["norm2"], x, 1e-6)
    return x + apply_linear(p["ff_out"],
                            jax.nn.gelu(apply_linear(p["ff_in"], h)))


def _timestep_embed(p: dict, t: Array, freq_dim: int = 256) -> Array:
    half = freq_dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = 1000.0 * t[:, None] * emb[None, :]
    h = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    h = apply_linear(p["time_in"], h.astype(jnp.float32))
    return apply_linear(p["time_out"], jax.nn.silu(h))


def init_dit(key, in_channels: int, hidden: int, depth: int, heads: int,
             mlp_ratio: float, llm_cond_dim: int) -> dict:
    ks = iter(jax.random.split(key, 8 * depth + 16))
    return {
        "t_embedder": {"time_in": init_linear(next(ks), 256, hidden),
                       "time_out": init_linear(next(ks), hidden, hidden)},
        "x_embedder": init_linear(next(ks), in_channels, hidden),
        "c_embedder": init_linear(next(ks), llm_cond_dim, hidden),
        "blocks": {str(i): _init_dit_block(ks, hidden, heads, mlp_ratio)
                   for i in range(depth)},
        "final": {"norm": init_rms_norm(hidden),
                  "linear": init_linear(next(ks), hidden, in_channels)},
    }


def dit_forward(p: dict, x: Array, t: Array, c: Array,
                latent_history: Array, heads: int) -> Array:
    """x (B, P, C), t (B,), c (B, 1, llm_dim), history (B, H, C)."""
    t_emb = _timestep_embed(p["t_embedder"], t)[:, None, :]
    x_now = apply_linear(p["x_embedder"], x)
    x_hist = apply_linear(p["x_embedder"], latent_history)
    y = t_emb + apply_linear(p["c_embedder"], c)
    full = jnp.concatenate([y, x_hist, x_now], axis=1)
    for i in range(len(p["blocks"])):
        full = _dit_block(p["blocks"][str(i)], full, heads)
    return apply_linear(p["final"]["linear"],
                        apply_rms_norm(p["final"]["norm"], full, 1e-6))


def init_aggregator(key, in_channels: int, hidden: int, depth: int,
                    heads: int, mlp_ratio: float, llm_input_dim: int
                    ) -> dict:
    ks = iter(jax.random.split(key, 8 * depth + 8))
    return {
        "word_embedder": init_embedding(next(ks), 1, hidden),
        "x_embedder": init_linear(next(ks), in_channels, hidden),
        "blocks": {str(i): _init_dit_block(ks, hidden, heads, mlp_ratio)
                   for i in range(depth)},
        "final": {"norm": init_rms_norm(hidden),
                  "linear": init_linear(next(ks), hidden, llm_input_dim)},
    }


def aggregator_forward(p: dict, x: Array, heads: int) -> Array:
    """(B, P, latent) -> (B, 1, llm_dim): cls token summary."""
    x = apply_linear(p["x_embedder"], x)
    cls = jnp.broadcast_to(p["word_embedder"]["weight"][None, :1],
                           (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    for i in range(len(p["blocks"])):
        x = _dit_block(p["blocks"][str(i)], x, heads)
    return apply_linear(p["final"]["linear"],
                        apply_rms_norm(p["final"]["norm"], x, 1e-6))[:, :1]


def get_epss_timesteps(n: int) -> np.ndarray:
    dt = 1.0 / 32
    table = {5: [0, 2, 4, 8, 16, 32], 6: [0, 2, 4, 6, 8, 16, 32],
             7: [0, 2, 4, 6, 8, 16, 24, 32],
             10: [0, 2, 4, 6, 8, 12, 16, 20, 24, 28, 32],
             12: [0, 2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32],
             16: [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28,
                  32]}
    t = table.get(n)
    if t is None:
        return np.linspace(0.0, 1.0, n + 1, dtype=np.float32)
    return (dt * np.asarray(t, np.float32))


# --------------------------------------------------------------- AudioVAE

class ISTFTState:
    """Host-side streaming buffers for the overlap-add ISTFT head."""

    def __init__(self):
        self.audio_buffer: Optional[np.ndarray] = None
        self.window_buffer: Optional[np.ndarray] = None


def istft_head_forward(p: dict, x: Array, n_fft: int, hop: int,
                       window: Array) -> Tuple[Array, Array]:
    """(B, T, D) hidden -> (audio (B, out), env (B, out)) pre-normalized
    frames via conv-transpose overlap-add (dsp.overlap_add on the MXU)."""
    pred = apply_linear(p["out"], x)          # (B, T, n_fft + 2)
    mag, phase = jnp.split(pred, 2, axis=-1)
    mag = jnp.clip(jnp.exp(mag), None, 1e2)
    from ....dsp import irfft_pair

    frames = irfft_pair(mag * jnp.cos(phase), mag * jnp.sin(phase),
                        n=n_fft).astype(jnp.float32)
    frames = frames * window[None, None, :]
    audio = overlap_add(frames, hop, n_fft)
    wsq = jnp.broadcast_to((window * window)[None, None, :], frames.shape)
    env = overlap_add(wsq, hop, n_fft)
    return audio, env


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """Ming-Omni TTS (MoE or dense LLM + DiTAR flow head + AudioVAE)."""

    def __init__(self, config: Union[ModelConfig, Dict[str, Any]] = None,
                 **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        for name in ("text_config", "audio_tokenizer_config", "ditar_config",
                     "aggregator_config"):
            if not getattr(config, name):
                raise ValueError(f"Missing {name} in Ming Omni config")
        super().__init__(config)
        self.model_type = "ming_omni_tts"
        self.tokenizer = None

        llm_cfg = dict(config.text_config)
        self.is_moe = self._is_moe_llm_config(llm_cfg)
        if self.is_moe:
            self.llm_args = BailingMoeConfig.from_dict(llm_cfg)
        else:
            self.llm_args = Qwen2Config.from_dict(llm_cfg)
        atc = config.audio_tokenizer_config
        self.vae_sample_rate = int(atc["sample_rate"])
        self.vae_patch_size = int(atc.get("patch_size", -1))
        self.latent_dim = int(atc["enc_kwargs"]["latent_dim"])
        self.enc_input_dim = int(atc["enc_kwargs"]["input_dim"])
        self.enc_hop = int(atc["enc_kwargs"].get("hop_size", 320))
        self.enc_cfg = Qwen2Config.from_dict(atc["enc_kwargs"]["backbone"])
        self.dec_cfg = Qwen2Config.from_dict(atc["dec_kwargs"]["backbone"])
        self.dec_output_dim = int(atc["dec_kwargs"]["output_dim"])
        self.patch_size = int(config.ditar_config["patch_size"])
        self.history_patch_size = int(config.ditar_config.get(
            "history_patch_size", self.patch_size))
        dc = config.ditar_config
        self.dit_hidden = int(dc.get("hidden_size", 1024))
        self.dit_depth = int(dc.get("depth", 16))
        self.dit_heads = int(dc.get("num_heads", 16))
        self.dit_mlp_ratio = float(dc.get("mlp_ratio", 4.0))
        ac = config.aggregator_config
        self.agg_hidden = int(ac.get("hidden_size", 1024))
        self.agg_depth = int(ac.get("depth", 8))
        self.agg_heads = int(ac.get("num_heads", 16))
        self.agg_mlp_ratio = float(ac.get("mlp_ratio", 4.0))

    @staticmethod
    def _is_moe_llm_config(llm_cfg: Dict[str, Any]) -> bool:
        return all(llm_cfg.get(k) is not None for k in MOE_KEYS)

    @property
    def sample_rate(self) -> int:
        return self.vae_sample_rate

    # ------------------------------------------------------------ params

    def init_params(self, key):
        cfg = self.config
        ks = iter(jax.random.split(key, 16))
        la = self.llm_args
        llm = (init_bailing_moe(next(ks), la) if self.is_moe
               else init_qwen2(next(ks), la))
        if not self.is_moe:
            llm["word_embeddings"] = llm.pop("embed_tokens")
        enc_agg = {}
        if self.vae_patch_size != -1:
            from dataclasses import replace

            agg_cfg = replace(self.enc_cfg, num_hidden_layers=4)
            enc_agg = {
                "aggregator": init_qwen2(next(ks), agg_cfg,
                                         embeddings=False),
                "cls_embed": 0.02 * jax.random.normal(
                    next(ks), (1, 1, self.enc_cfg.hidden_size))}
        n_fft = self.dec_output_dim * 4
        window = 0.5 - 0.5 * jnp.cos(
            2.0 * jnp.pi * jnp.arange(n_fft) / n_fft)
        return {
            "model": llm,
            "audio": {
                "encoder": {
                    "encoder": init_qwen2(next(ks), self.enc_cfg,
                                          embeddings=False),
                    "fc1": init_linear(next(ks), self.enc_input_dim,
                                       self.enc_cfg.hidden_size, bias=False),
                    "fc2": init_linear(next(ks), self.enc_cfg.hidden_size,
                                       self.enc_cfg.hidden_size),
                    "fc3": init_linear(next(ks), self.enc_cfg.hidden_size,
                                       self.latent_dim * 2),
                    **enc_agg},
                "decoder": {
                    "decoder": init_qwen2(next(ks), self.dec_cfg,
                                          embeddings=False),
                    "fc1": init_linear(next(ks), self.latent_dim,
                                       self.dec_cfg.hidden_size),
                    "head": {
                        "out": init_linear(next(ks), self.dec_cfg.hidden_size,
                                           n_fft + 2),
                        "window": window}},
            },
            "linear_proj_audio": init_aggregator(
                next(ks), self.latent_dim, self.agg_hidden, self.agg_depth,
                self.agg_heads, self.agg_mlp_ratio, la.hidden_size),
            "flowloss": {"cfm": {"dit": init_dit(
                next(ks), self.latent_dim, self.dit_hidden, self.dit_depth,
                self.dit_heads, self.dit_mlp_ratio, la.hidden_size)}},
            "stop_head": init_linear(next(ks), la.hidden_size, 2),
            "spk_head": init_linear(next(ks), 192, la.hidden_size),
        }

    def sanitize(self, weights):
        out = {}
        allowed = ("model.", "audio.", "flowloss.", "linear_proj_audio.",
                   "spk_head.", "stop_head.")
        for k, v in weights.items():
            if not k.startswith(allowed):
                continue
            if ".audio_gate." in k or ".image_gate." in k:
                continue
            if "rotary_emb.inv_freq" in k:
                continue
            out[k] = jnp.asarray(v)
        return out

    def model_quant_predicate(self, path, w):
        return path.startswith("model.")

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(
                str(model_path), trust_remote_code=False)
        except Exception:
            model.tokenizer = None
        return model

    # -------------------------------------------------------------- LLM

    def _llm_forward(self, p, embeds, caches, offset, pad_mask=None):
        if self.is_moe:
            return bailing_moe_forward(p["model"], self.llm_args, embeds,
                                       caches, offset, pad_mask)
        return qwen2_forward(p["model"], self.llm_args, embeds, caches,
                             offset, pad_mask)

    def _llm_embed(self, ids: np.ndarray) -> np.ndarray:
        w = self.params["model"]["word_embeddings"]
        return np.asarray(apply_embedding(w, jnp.asarray(ids)))

    # ------------------------------------------------------------ prompt

    def _encode_text(self, text: str) -> List[int]:
        return list(self.tokenizer.encode(text, add_special_tokens=False))

    def _prepare_input_embed(self, prompt: str, text: str,
                             instruction: Optional[str],
                             prompt_latent: Optional[np.ndarray],
                             prompt_text: Optional[str]
                             ) -> np.ndarray:
        """-> (1, T, D) prompt embedding (ref :1506-1566)."""
        latent_embeds = None
        prompt_text_ids: List[int] = []
        n_latent = 0
        if prompt_latent is not None and prompt_text is not None:
            lat = np.asarray(prompt_latent)
            lat = lat.reshape(-1, self.patch_size, self.latent_dim)
            agg = self._jit_cache.setdefault(
                "agg", jax.jit(lambda p, x: aggregator_forward(
                    p["linear_proj_audio"], x, self.agg_heads)))
            latent_embeds = np.asarray(agg(
                self.params, jnp.asarray(lat, jnp.float32))).reshape(
                1, -1, self.llm_args.hidden_size)
            prompt_text_ids = self._encode_text(prompt_text)
            n_latent = latent_embeds.shape[1]

        prompt2 = self._encode_text(" Text input:\n")
        if all(f"{k}: " in text for k in ("Genre", "Mood", "Instrument",
                                          "Theme", "Duration")):
            prompt2 = []
        instr = ([] if instruction is None else
                 self._encode_text(instruction)
                 + self._encode_text("<|endoftext|>"))
        head = (self._encode_text("<role>HUMAN</role>")
                + self._encode_text(prompt) + prompt2 + prompt_text_ids
                + self._encode_text(text)
                + self._encode_text("<role>ASSISTANT</role>") + instr
                + self._encode_text("<audio>"))
        head_embeds = self._llm_embed(np.asarray([head], np.int32))
        if latent_embeds is not None:
            return np.concatenate([head_embeds, latent_embeds], axis=1)
        del n_latent
        return head_embeds

    # ---------------------------------------------------------- sampling

    def _flow_fn(self, steps: int, cfg_scale: float, sigma: float,
                 temperature: float):
        """One compiled program: the whole Euler integration with CFG."""
        heads = self.dit_heads
        t_grid = get_epss_timesteps(steps)
        sway = -1.0
        t_grid = t_grid + sway * (np.cos(np.pi / 2 * t_grid) - 1 + t_grid)

        def run(p, cond, latent_history, key):
            dit = p["flowloss"]["cfm"]["dit"]
            key, sub = jax.random.split(key)
            y = jax.random.normal(
                sub, (1, self.patch_size, self.latent_dim), jnp.float32)

            def vf(t, x):
                if cfg_scale < 1e-5:
                    return dit_forward(dit, x, jnp.full((1,), t), cond,
                                       latent_history,
                                       heads)[:, -self.patch_size:]
                x2 = jnp.concatenate([x, x], axis=0)
                h2 = jnp.concatenate([latent_history, latent_history],
                                     axis=0)
                c2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
                out = dit_forward(dit, x2, jnp.full((2,), t), c2, h2,
                                  heads)[:, -self.patch_size:]
                pred, null = jnp.split(out, 2, axis=0)
                return pred + (pred - null) * cfg_scale

            for i in range(1, len(t_grid)):
                t0, t1 = float(t_grid[i - 1]), float(t_grid[i])
                dt = t1 - t0
                y = y + dt * vf(t0, y)
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, y.shape, jnp.float32)
                y = y + sigma * math.sqrt(max(temperature, 0.0)) \
                    * math.sqrt(abs(dt)) * noise
            return y, key

        return jax.jit(run)

    def sample(self, prompt: str, text: str, instruction=None,
               prompt_waveform=None, prompt_text=None,
               max_decode_steps: int = 200, cfg: float = 2.0,
               sigma: float = 0.25, temperature: float = 0.0,
               flow_steps: int = 10, seed: int = 0):
        """Yield (latent_patch (1, P, C), is_last) per AR step."""
        prompt_latent = None
        if prompt_waveform is not None and prompt_text is not None:
            wav = np.asarray(prompt_waveform, np.float32).reshape(1, -1)
            align = int((1 / 12.5) * self.patch_size * self.sample_rate)
            pad = (-wav.shape[1]) % align
            if pad:
                wav = np.pad(wav, ((0, 0), (0, pad)))
            prompt_latent = self.encode_latent(wav)

        embeds = self._prepare_input_embed(prompt, text, instruction,
                                           prompt_latent, prompt_text)
        plen = embeds.shape[1]
        pb = _bucket(plen)
        buf = np.zeros((1, pb, embeds.shape[-1]), np.float32)
        buf[:, :plen] = embeds
        la = self.llm_args

        pf = self._jit_cache.get(("llm_prefill", pb))
        if pf is None:
            def prefill(p, e, n):
                caches = [KVCache.init(1, MAX_CACHE_LEN,
                                       la.num_key_value_heads, la.head_dim,
                                       jnp.float32)
                          for _ in range(la.num_hidden_layers)]
                pad = jnp.where(jnp.arange(MAX_CACHE_LEN) < n, 0.0,
                                -jnp.inf)[None, None, None, :]
                hidden, caches = self._llm_forward(p, e, caches, 0, pad)
                idx = jnp.clip(n - 1, 0, pb - 1)
                return caches, jax.lax.dynamic_slice_in_dim(hidden, idx, 1,
                                                            axis=1)

            pf = jax.jit(prefill)
            self._jit_cache[("llm_prefill", pb)] = pf
        caches, hidden = pf(self.params, jnp.asarray(buf), jnp.int32(plen))

        step_fn = self._jit_cache.get("llm_step")
        if step_fn is None:
            def llm_step(p, caches, offset, latent):
                emb = aggregator_forward(p["linear_proj_audio"], latent,
                                         self.agg_heads)
                hidden, caches = self._llm_forward(p, emb, caches, offset)
                return caches, hidden

            step_fn = jax.jit(llm_step, donate_argnums=(1,))
            self._jit_cache["llm_step"] = step_fn

        fkey = ("flow", flow_steps, cfg, sigma, temperature)
        flow = self._jit_cache.get(fkey)
        if flow is None:
            flow = self._flow_fn(flow_steps, cfg, sigma, temperature)
            self._jit_cache[fkey] = flow

        history = np.zeros((1, self.history_patch_size, self.latent_dim),
                           np.float32)
        if prompt_latent is not None:
            lat = np.asarray(prompt_latent).reshape(1, -1, self.latent_dim)
            start = self.history_patch_size - lat.shape[1]
            if start < 0:
                history = lat[:, -self.history_patch_size:]
            else:
                history[:, start:] = lat
        key = jax.random.PRNGKey(seed)
        offset = plen
        for step in range(int(max_decode_steps)):
            cond = hidden[:, -1:]
            latent, key = flow(self.params, cond,
                               jnp.asarray(history, jnp.float32), key)
            stop_logits = apply_linear(self.params["stop_head"], cond)
            stop_prob = float(jax.nn.softmax(stop_logits, axis=-1)[0, 0, 1])
            is_last = stop_prob > 0.5 and step > 3
            latent_np = np.asarray(latent, np.float32)
            yield latent_np, is_last
            if is_last:
                break
            caches, hidden = step_fn(self.params, caches,
                                     jnp.int32(offset), latent)
            offset += 1
            history = np.concatenate(
                [history[:, self.patch_size:], latent_np], axis=1)

    # ---------------------------------------------------------- AudioVAE

    def encode_latent(self, waveform: np.ndarray) -> np.ndarray:
        """(1, T) -> (1, frames, latent) mean latent (mu only)."""
        p = self.params["audio"]["encoder"]
        wav = np.asarray(waveform, np.float32)
        n = wav.shape[-1]
        num_frames = (n + self.enc_hop - 1) // self.enc_hop
        need = (num_frames - 1) * self.enc_hop + self.enc_input_dim
        wav = np.pad(wav, ((0, 0), (0, max(need - n, 0))))
        idx = (np.arange(num_frames)[:, None] * self.enc_hop
               + np.arange(self.enc_input_dim)[None, :])
        frames = wav[:, idx]                      # (1, F, input_dim)

        def enc(pp, f):
            x = apply_linear(pp["fc1"], f)
            x = apply_linear(pp["fc2"], x)
            x, _ = qwen2_forward(pp["encoder"], self.enc_cfg, x)
            if self.vae_patch_size != -1:
                b, t, d = x.shape
                ps = self.vae_patch_size
                pad = (-t) % ps
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                x = x.reshape(-1, ps, d)
                cls = jnp.broadcast_to(pp["cls_embed"].astype(x.dtype),
                                       (x.shape[0], 1, d))
                x = jnp.concatenate([x, cls], axis=1)
                from dataclasses import replace

                agg_cfg = replace(self.enc_cfg, num_hidden_layers=4)
                x = x.reshape(b, -1, d)
                x, _ = qwen2_forward(pp["aggregator"], agg_cfg, x)
                x = x.reshape(-1, ps + 1, d)[:, -1:].reshape(b, -1, d)
            return apply_linear(pp["fc3"], x)

        key_ = ("vae_enc", frames.shape[1])
        fn = self._jit_cache.setdefault(key_, jax.jit(enc))
        h = np.asarray(fn(p, jnp.asarray(frames)))
        mu = h[..., :self.latent_dim]
        return mu

    def decode_latent(self, latent: np.ndarray, state=None,
                      caches=None, last_chunk: bool = False
                      ) -> Tuple[np.ndarray, Any, Any]:
        """Streaming VAE decode of one latent patch chunk.

        state = (upsample_state, istft_state). Returns (audio, state,
        caches)."""
        p = self.params["audio"]["decoder"]
        n_fft = self.dec_output_dim * 4
        hop = self.dec_output_dim
        if state is None:
            state = ({"prev": None, "hist_last": None, "first": True},
                     ISTFTState(), 0)
        up_state, istft_state, offset = state

        lat = np.asarray(latent, np.float32)
        if lat.size == 0:
            lat = None                      # flush-only call
        # streaming linear upsample by patch_size (ref :1253-1310)
        ups, up_state = self._streaming_upsample(lat, up_state, last_chunk)
        if ups is None:
            return np.zeros((lat.shape[0], 0), np.float32), \
                (up_state, istft_state, offset), caches

        t = ups.shape[1]
        if caches is None:
            caches = [KVCache.init(1, MAX_CACHE_LEN,
                                   self.dec_cfg.num_key_value_heads,
                                   self.dec_cfg.head_dim, jnp.float32)
                      for _ in range(self.dec_cfg.num_hidden_layers)]

        key_ = ("vae_dec", t)
        fn = self._jit_cache.get(key_)
        if fn is None:
            def dec(pp, x, caches, off):
                x = apply_linear(pp["fc1"], x)
                x, caches = qwen2_forward(pp["decoder"], self.dec_cfg, x,
                                          caches, off)
                audio, env = istft_head_forward(pp["head"], x, n_fft, hop,
                                                pp["head"]["window"])
                return audio, env, caches

            fn = jax.jit(dec)
            self._jit_cache[key_] = fn
        audio, env, caches = fn(p, jnp.asarray(ups), caches,
                                jnp.int32(offset))
        offset += t
        audio = np.asarray(audio)
        env = np.asarray(env)
        pad = (n_fft - hop) // 2
        audio = self._istft_buffer(audio, istft_state, "audio_buffer",
                                   pad, n_fft, hop, last_chunk)
        env = self._istft_buffer(env, istft_state, "window_buffer",
                                 pad, n_fft, hop, last_chunk)
        out = audio / np.clip(env, 1e-11, None)
        return out, (up_state, istft_state, offset), caches

    def _streaming_upsample(self, x: np.ndarray, state: dict,
                            is_last: bool):
        """Chunked linear upsample with one-patch lookahead
        (ref _streaming_linear_upsample :1253-1310)."""
        scale = self.patch_size

        def up(arr):  # (1, T, C) -> (1, T*scale, C)
            xt = arr.transpose(0, 2, 1)
            b, c, t = xt.shape
            idx = (np.arange(t * scale, dtype=np.float32) + 0.5) / scale - 0.5
            left = np.clip(np.floor(idx).astype(int), 0, t - 1)
            right = np.clip(left + 1, 0, t - 1)
            w = (idx - np.floor(idx))[None, None, :]
            y = xt[:, :, left] * (1 - w) + xt[:, :, right] * w
            return y.transpose(0, 2, 1)

        if x is None and not is_last:
            return None, state
        if state["first"] and is_last:
            return (None, None) if x is None else (up(x), None)
        outs = []
        if state["first"]:
            state["prev"] = x
            state["first"] = False
            if not is_last:
                return None, state
        if state["prev"] is not None:
            prev = state["prev"]
            look = prev[:, -1:] if x is None else x[:, :1]
            if state["hist_last"] is None:
                seq = np.concatenate([prev, look], axis=1)
                y = up(seq)[:, :prev.shape[1] * scale]
            else:
                seq = np.concatenate([state["hist_last"], prev, look],
                                     axis=1)
                y = up(seq)[:, scale:scale + prev.shape[1] * scale]
            outs.append(y)
            state["hist_last"] = prev[:, -1:]
            state["prev"] = x
        if is_last:
            prev = state["prev"]
            if prev is not None:
                hist = state["hist_last"] if state["hist_last"] is not None \
                    else prev[:, :1]
                seq = np.concatenate([hist, prev], axis=1)
                outs.append(up(seq)[:, scale:])
            state = None
        return (np.concatenate(outs, axis=1) if outs else None), state

    @staticmethod
    def _istft_buffer(x: np.ndarray, state: ISTFTState, attr: str,
                      pad: int, n_fft: int, hop: int, last: bool
                      ) -> np.ndarray:
        buf = getattr(state, attr)
        blen = n_fft - hop
        x = x.copy()
        if buf is None:
            x = x[:, pad:]
        else:
            x[:, :blen] += buf
        setattr(state, attr, x[:, -blen:].copy())
        return x[:, :-pad] if last else x[:, :-blen]

    # ---------------------------------------------------------- generate

    def generate(self, text: str, voice=None, instruct=None,
                 speed: float = 1.0, lang_code: str = "en", ref_audio=None,
                 ref_text=None, cfg_scale: Optional[float] = None,
                 ddpm_steps: Optional[int] = None, max_tokens: int = 200,
                 temperature: float = 0.0, verbose: bool = False,
                 stream: bool = False, streaming_interval: float = 2.0,
                 seed: int = 0, **kwargs) -> Iterable[GenerationResult]:
        del voice, lang_code, stream, streaming_interval, speed
        if self.tokenizer is None:
            raise ValueError("Tokenizer is not initialized.")
        if isinstance(ref_audio, str):
            from ....utils import load_audio

            ref_audio = np.asarray(load_audio(ref_audio,
                                              sample_rate=self.sample_rate))
        t0 = time.perf_counter()
        prompt = kwargs.get(
            "prompt",
            "Please generate speech based on the following description.\n")
        chunks: List[np.ndarray] = []
        state = None
        caches = None
        for latent, is_last in self.sample(
                prompt=prompt, text=text, instruction=instruct,
                prompt_waveform=ref_audio, prompt_text=ref_text,
                max_decode_steps=int(kwargs.get("max_decode_steps",
                                                max_tokens)),
                cfg=2.0 if cfg_scale is None else cfg_scale,
                sigma=float(kwargs.get("sigma", 0.25)),
                temperature=temperature,
                flow_steps=10 if ddpm_steps is None else ddpm_steps,
                seed=seed):
            audio, state, caches = self.decode_latent(latent, state, caches,
                                                      last_chunk=is_last)
            if audio.shape[1]:
                chunks.append(audio)
            if is_last:
                break
        else:
            # ran to max steps without a stop signal: flush the upsample
            # lookahead + istft tail
            if state is not None:
                audio, state, caches = self.decode_latent(
                    np.zeros((1, 0, self.latent_dim), np.float32), state,
                    caches, last_chunk=True)
                if audio.shape[1]:
                    chunks.append(audio)
        if not chunks:
            raise RuntimeError("No audio chunks were generated")
        speech = np.concatenate(chunks, axis=1)[0]
        dt = max(time.perf_counter() - t0, 1e-6)
        n_tok = len(self._encode_text(text))
        dur = len(speech) / self.sample_rate
        yield GenerationResult(
            audio=speech, samples=len(speech), sample_rate=self.sample_rate,
            segment_idx=0, token_count=n_tok,
            audio_duration=format_duration(dur),
            real_time_factor=round(dt / max(dur, 1e-6), 3),
            prompt={"tokens": n_tok, "tokens-per-sec": round(n_tok / dt, 2)},
            audio_samples={"samples": len(speech),
                           "samples-per-sec": round(len(speech) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb(),
            is_streaming_chunk=False, is_final_chunk=True)


__all__ = ["Model", "ModelConfig", "get_epss_timesteps", "dit_forward",
           "aggregator_forward", "init_dit", "init_aggregator"]
