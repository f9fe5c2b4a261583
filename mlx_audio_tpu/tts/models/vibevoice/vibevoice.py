"""VibeVoice: streaming TTS with a split Qwen2 LM and a diffusion head.

Parity: reference tts/models/vibevoice/vibevoice.py — the Qwen2 backbone is
split into a lower text LM (no final norm) and an upper TTS LM (:39-98),
text/speech windows are interleaved (TTS_TEXT_WINDOW_SIZE=5 /
TTS_SPEECH_WINDOW_SIZE=6, :607-696), each speech step runs DPM-Solver++
sampling of one VAE latent with classifier-free guidance against a
"negative" stream fed zero text embeddings (:330-404, :632-686), EOS is a
sigmoid binary classifier on the TTS hidden (:688-691), and latents are
rescaled (x/scale - bias) then decoded by the causal-conv VAE decoder
(:698-704, acoustic_tokenizer.py).  Voice conditioning loads precomputed KV
caches + hidden tails from voices/<name>.safetensors (:134-203).

TPU design (not a translation):
* The positive and negative CFG streams run as ONE batch-2 program through
  the TTS LM with shared fixed-capacity KV caches — the reference keeps two
  separate growing cache lists and calls the LM twice per step.
* The whole DPM-Solver++ loop is a single `lax.scan` over per-step scalar
  tables precomputed host-side (scheduler.py); the order-1/order-2 choice is
  a precomputed blend mask, so the scan body is branch-free.
* Text windows are padded to the fixed window size; causal masking makes the
  pad slots unreachable, and the next window's writes overwrite them, so no
  extra masks are needed.
* The VAE decoder is fully causal, so latent sequences are padded to length
  buckets and decoded in one jitted program per bucket — the prefix is
  bit-identical to a tight-shape decode.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_conv_transpose1d, apply_linear,
                    apply_rms_norm, init_conv1d, init_conv_transpose1d,
                    init_embedding, init_linear, init_rms_norm)
from ....nn.layers import convert_torch_conv_transpose_weight
from ....ops.kvcache import KVCache
from ..base import GenerationResult, format_duration
from ..llama.llama import ModelConfig as LlamaConfig
from ..llama.llama import init_llama, llama_forward
from .config import (AcousticTokenizerConfig, DiffusionHeadConfig,
                     ModelConfig, Qwen2DecoderConfig)
from .scheduler import dpm_tables

Array = jax.Array

TTS_TEXT_WINDOW_SIZE = 5
TTS_SPEECH_WINDOW_SIZE = 6
LATENT_BUCKETS = (8, 16, 32, 64, 128, 256, 512)


def _llama_cfg(d: Qwen2DecoderConfig, n_layers: int) -> LlamaConfig:
    return LlamaConfig(
        model_type="qwen2", hidden_size=d.hidden_size,
        num_hidden_layers=n_layers, intermediate_size=d.intermediate_size,
        num_attention_heads=d.num_attention_heads,
        num_key_value_heads=d.num_key_value_heads, vocab_size=d.vocab_size,
        rms_norm_eps=d.rms_norm_eps, rope_theta=d.rope_theta,
        head_dim=d.head_dim, attention_bias=True,   # qwen2: biased qkv
        logits_scaling=d.logits_scaling)


# ------------------------------------------------------------------ init

def init_vibevoice(key, cfg: ModelConfig) -> dict:
    d = cfg.decoder_config
    tts_layers = cfg.tts_backbone_num_hidden_layers
    lm_layers = d.num_hidden_layers - tts_layers
    ks = iter(jax.random.split(key, 64))

    import dataclasses
    lm = init_llama(next(ks), _llama_cfg(d, lm_layers), lm_head=False)
    del lm["model"]["norm"]             # base LM has no final norm
    tts = init_llama(next(ks), _llama_cfg(
        dataclasses.replace(d, vocab_size=8), tts_layers), lm_head=False)
    del tts["model"]["embed_tokens"]    # TTS LM takes embeds only

    h = d.hidden_size
    dh = cfg.diffusion_head_config
    ffn = int(dh.hidden_size * dh.head_ffn_ratio)
    head = {
        "noisy_images_proj": init_linear(next(ks), dh.latent_size,
                                         dh.hidden_size, bias=False),
        "cond_proj": init_linear(next(ks), h, dh.hidden_size, bias=False),
        "t_embedder": {"mlp": {
            "0": init_linear(next(ks), dh.freq_embed_size, dh.hidden_size,
                             bias=False),
            "2": init_linear(next(ks), dh.hidden_size, dh.hidden_size,
                             bias=False)}},
        "layers": {str(i): {
            "ffn": {"gate_proj": init_linear(next(ks), dh.hidden_size, ffn,
                                             bias=False),
                    "up_proj": init_linear(next(ks), dh.hidden_size, ffn,
                                           bias=False),
                    "down_proj": init_linear(next(ks), ffn, dh.hidden_size,
                                             bias=False)},
            "norm": init_rms_norm(dh.hidden_size),
            "adaLN_modulation": {"1": init_linear(
                next(ks), dh.hidden_size, 3 * dh.hidden_size, bias=False)},
        } for i in range(dh.head_layers)},
        "final_layer": {
            "linear": init_linear(next(ks), dh.hidden_size, dh.latent_size,
                                  bias=False),
            "adaLN_modulation": {"1": init_linear(
                next(ks), dh.hidden_size, 2 * dh.hidden_size, bias=False)}},
    }

    a = cfg.acoustic_tokenizer_config
    return {
        "language_model": lm,
        "tts_language_model": tts,
        "tts_input_types": init_embedding(next(ks), 2, h),
        "acoustic_connector": {
            "fc1": init_linear(next(ks), cfg.acoustic_vae_dim, h),
            "norm": init_rms_norm(h),
            "fc2": init_linear(next(ks), h, h)},
        "prediction_head": head,
        "tts_eos_classifier": {"fc1": init_linear(next(ks), h, h),
                               "fc2": init_linear(next(ks), h, 1)},
        "acoustic_tokenizer": {"decoder": _init_vae_decoder(next(ks), a)},
        "speech_scaling_factor": jnp.asarray(1.0),
        "speech_bias_factor": jnp.asarray(0.0),
    }


def _init_vae_decoder(key, a: AcousticTokenizerConfig) -> dict:
    ratios, depths = a.ratios, a.depths
    n_stages = len(depths)
    nf = a.decoder_n_filters or a.encoder_n_filters
    ks = iter(jax.random.split(
        key, 4 + len(ratios) + sum(depths) * 4))
    km = a.mixer_kernel

    def block(dim):
        return {"norm": init_rms_norm(dim), "ffn_norm": init_rms_norm(dim),
                "mixer": {"conv": {"conv": {"conv": init_conv1d(
                    next(ks), dim, dim, km, groups=dim,
                    bias=a.conv_bias)}}},
                "ffn": {"linear1": init_linear(next(ks), dim, 4 * dim),
                        "linear2": init_linear(next(ks), 4 * dim, dim)},
                "gamma": jnp.full((dim,), a.layer_scale_init_value),
                "ffn_gamma": jnp.full((dim,), a.layer_scale_init_value)}

    ups = {"0": {"0": {"conv": {"conv": init_conv1d(
        next(ks), a.vae_dim, nf * 2 ** (n_stages - 1), km,
        bias=a.conv_bias)}}}}
    for i, r in enumerate(ratios):
        in_ch = nf * 2 ** (n_stages - 1 - i)
        out_ch = nf * 2 ** (n_stages - 2 - i) if i < len(ratios) - 1 else nf
        ups[str(i + 1)] = {"0": {"convtr": {"convtr":
            init_conv_transpose1d(next(ks), in_ch, out_ch, 2 * r,
                                  bias=a.conv_bias)}}}
    stages = {str(i): {str(j): block(nf * 2 ** (n_stages - 1 - i))
                       for j in range(depths[i])}
              for i in range(n_stages)}
    return {"upsample_layers": ups, "stages": stages,
            "head": {"conv": {"conv": init_conv1d(
                next(ks), nf, a.channels, km, bias=a.conv_bias)}}}


# --------------------------------------------------------- diffusion head

def head_forward(p: dict, dh: DiffusionHeadConfig, x_lat: Array, t: Array,
                 cond: Array) -> Array:
    """(B, latent), (B,), (B, hidden) -> v prediction (B, latent)."""
    x = apply_linear(p["noisy_images_proj"], x_lat)
    half = dh.freq_embed_size // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    te = p["t_embedder"]["mlp"]
    temb = apply_linear(te["2"], jax.nn.silu(apply_linear(te["0"], emb)))
    c = apply_linear(p["cond_proj"], cond) + temb
    c_act = jax.nn.silu(c)
    for i in range(dh.head_layers):
        blk = p["layers"][str(i)]
        mod = apply_linear(blk["adaLN_modulation"]["1"], c_act)
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        hn = apply_rms_norm(blk["norm"], x, dh.rms_norm_eps)
        hn = hn * (1 + scale) + shift
        f = blk["ffn"]
        ff = apply_linear(f["down_proj"],
                          jax.nn.silu(apply_linear(f["gate_proj"], hn))
                          * apply_linear(f["up_proj"], hn))
        x = x + gate * ff
    fl = p["final_layer"]
    mod = apply_linear(fl["adaLN_modulation"]["1"], c_act)
    shift, scale = jnp.split(mod, 2, axis=-1)
    xn = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True)
                           + dh.rms_norm_eps)
    return apply_linear(fl["linear"], xn * (1 + scale) + shift)


def diffusion_sample(p: dict, dh: DiffusionHeadConfig, cond: Array,
                     neg_cond: Array, noise: Array, tables: dict,
                     cfg_scale: Array) -> Array:
    """Sample latents (B, latent) via the compiled DPM-Solver++ scan.

    cond/neg_cond: (B, hidden); noise: (B, latent); tables: stacked (N,)
    per-step constants from scheduler.dpm_tables.
    """
    b = cond.shape[0]
    cond2 = jnp.concatenate([cond, neg_cond], axis=0).astype(jnp.float32)

    def body(carry, tab):
        speech, prev_x0 = carry
        t2 = jnp.full((2 * b,), tab["t"])
        eps = head_forward(p, dh, jnp.concatenate([speech, speech], 0),
                           t2, cond2)
        guided = eps[b:] + cfg_scale * (eps[:b] - eps[b:])
        x0 = tab["alpha"] * speech - tab["sigma"] * guided
        first = tab["sigma_ratio"] * speech \
            - tab["alpha_next"] * tab["em1"] * x0
        d1 = tab["inv_r0"] * (x0 - prev_x0)
        second = first - 0.5 * tab["alpha_next"] * tab["em1"] * d1
        nxt = jnp.where(tab["use_first"] > 0, first, second)
        return (nxt, x0), None

    (speech, _), _ = jax.lax.scan(
        body, (noise.astype(jnp.float32), jnp.zeros_like(noise)), tables)
    return speech


# --------------------------------------------------------- VAE decoder

def decode_latents(p: dict, a: AcousticTokenizerConfig, x: Array) -> Array:
    """(B, L, vae_dim) latents -> (B, L*hop) audio (fully causal)."""
    km = a.mixer_kernel
    dec = p["decoder"]

    def causal(cp, x, groups=1):
        return apply_conv1d(cp, jnp.pad(x, ((0, 0), (km - 1, 0), (0, 0))),
                            groups=groups)

    x = causal(dec["upsample_layers"]["0"]["0"]["conv"]["conv"], x)
    ratios, depths = a.ratios, a.depths
    for i in range(len(depths)):
        dim = x.shape[-1]
        for j in range(depths[i]):
            blk = dec["stages"][str(i)][str(j)]
            h = apply_rms_norm(blk["norm"], x, a.layernorm_eps)
            h = causal(blk["mixer"]["conv"]["conv"]["conv"], h, groups=dim)
            x = x + blk["gamma"] * h
            h = apply_rms_norm(blk["ffn_norm"], x, a.layernorm_eps)
            h = apply_linear(blk["ffn"]["linear2"],
                             jax.nn.gelu(apply_linear(blk["ffn"]["linear1"],
                                                      h),
                                         approximate=False))
            x = x + blk["ffn_gamma"] * h
        if i < len(ratios):
            r = ratios[i]
            cp = dec["upsample_layers"][str(i + 1)]["0"]["convtr"]["convtr"]
            x = apply_conv_transpose1d(cp, x, stride=r)
            x = x[:, : x.shape[1] - (2 * r - r)]   # causal right-trim (k-s)
    x = causal(dec["head"]["conv"]["conv"], x)
    return x[..., 0]


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None
        self._jit_cache: Dict = {}
        self._voice_path: Optional[str] = None
        self._voice: Optional[dict] = None   # numpy host copies

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_vibevoice(key, self.config)

    # ------------------------------------------------------------ voices

    def load_voice(self, voice: Union[str, Path]) -> None:
        """Load a voice cache (precomputed LM/TTS-LM kv + hidden tails).

        Reference vibevoice.py:134-203; kv stored (B, kv_heads, S, head_dim)
        is transposed to our (B, S, kv_heads, head_dim) layout.
        """
        vp = Path(str(voice))
        if not vp.exists():
            vp = Path(self.config.model_path or ".") / "voices" / \
                f"{voice}.safetensors"
        if not vp.exists():
            raise FileNotFoundError(f"Voice cache not found: {vp}")
        from safetensors.numpy import load_file
        t = load_file(str(vp))

        def kv(prefix, i):
            k, v = t[f"{prefix}_key_{i}"], t[f"{prefix}_value_{i}"]
            if k.ndim == 4 and k.shape[1] != k.shape[2]:
                k = k.transpose(0, 2, 1, 3)
                v = v.transpose(0, 2, 1, 3)
            return k, v

        d = self.config.decoder_config
        lm_layers = d.num_hidden_layers - \
            self.config.tts_backbone_num_hidden_layers
        tts_layers = self.config.tts_backbone_num_hidden_layers
        voice = {
            "lm_hidden": t["lm_hidden"],
            "tts_hidden": t["tts_lm_hidden"],
            "neg_tts_hidden": t["neg_tts_lm_hidden"],
            "lm_kv": [kv("lm", i) for i in range(lm_layers)],
            "tts_kv": [kv("tts_lm", i) for i in range(tts_layers)],
            "neg_tts_kv": [kv("neg_tts_lm", i) for i in range(tts_layers)],
        }
        if voice["tts_kv"][0][0].shape[1] != \
                voice["neg_tts_kv"][0][0].shape[1]:
            raise ValueError("voice cache pos/neg TTS lengths differ")
        self._voice = voice
        self._voice_path = str(vp)

    # -------------------------------------------------- compiled pieces

    def _cfgs(self) -> Tuple[LlamaConfig, LlamaConfig]:
        d = self.config.decoder_config
        tts_layers = self.config.tts_backbone_num_hidden_layers
        return (_llama_cfg(d, d.num_hidden_layers - tts_layers),
                _llama_cfg(d, tts_layers))

    def _fns(self, lm_cap: int, tts_cap: int, ddpm_steps: int):
        key_ = (lm_cap, tts_cap, ddpm_steps)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        cfg = self.config
        lm_cfg, tts_cfg = self._cfgs()
        dh = cfg.diffusion_head_config

        def text_window(p, tokens, w, lm_caches, tts_caches, lm_off,
                        tts_off):
            lm_h, lm_caches = llama_forward(
                p["language_model"], lm_cfg, tokens, caches=lm_caches,
                offset=lm_off, final_norm=False)
            ttype = p["tts_input_types"]["weight"][1]
            x2 = jnp.concatenate(
                [lm_h + ttype, jnp.zeros_like(lm_h) + ttype], axis=0)
            h2, tts_caches = llama_forward(
                p["tts_language_model"], tts_cfg, x2, caches=tts_caches,
                offset=tts_off)
            last = jax.lax.dynamic_slice_in_dim(h2, w - 1, 1, axis=1)
            return lm_caches, tts_caches, last[0:1, 0], last[1:2, 0]

        def speech_step(p, tts_caches, pos_cond, neg_cond, tts_off, rng,
                        tables, cfg_scale):
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, (1, cfg.acoustic_vae_dim),
                                      jnp.float32)
            latent = diffusion_sample(p["prediction_head"], dh, pos_cond,
                                      neg_cond, noise, tables, cfg_scale)
            ac = p["acoustic_connector"]
            e = apply_linear(ac["fc1"], latent)
            e = apply_rms_norm(ac["norm"], e, 1e-6)
            e = apply_linear(ac["fc2"], e)
            stype = p["tts_input_types"]["weight"][0]
            x2 = jnp.broadcast_to(e + stype,
                                  (2, 1, e.shape[-1])).astype(e.dtype)
            h2, tts_caches = llama_forward(
                p["tts_language_model"], tts_cfg, x2, caches=tts_caches,
                offset=tts_off)
            cl = p["tts_eos_classifier"]
            eos = jax.nn.sigmoid(apply_linear(
                cl["fc2"], jax.nn.relu(apply_linear(cl["fc1"],
                                                    h2[0, 0])))[0])
            return latent, tts_caches, h2[0:1, 0], h2[1:2, 0], eos, rng

        fns = (jax.jit(text_window), jax.jit(speech_step))
        self._jit_cache[key_] = fns
        return fns

    def _dec_fn(self, bucket: int):
        fn = self._jit_cache.get(("dec", bucket))
        if fn is None:
            a = self.config.acoustic_tokenizer_config

            def dec(p, latents):
                scaled = latents / p["speech_scaling_factor"] \
                    - p["speech_bias_factor"]
                return decode_latents(p["acoustic_tokenizer"], a, scaled)

            fn = jax.jit(dec)
            self._jit_cache[("dec", bucket)] = fn
        return fn

    def _init_caches(self, cfg_lm: LlamaConfig, batch: int, cap: int,
                     kvs: Optional[list]) -> Tuple[list, int]:
        hd = cfg_lm.resolved_head_dim
        caches = [KVCache.init(batch, cap, cfg_lm.num_key_value_heads, hd,
                               dtype=jnp.float32)
                  for _ in range(cfg_lm.num_hidden_layers)]
        off = 0
        if kvs is not None:
            new = []
            for c, rows in zip(caches, kvs):
                rows = rows if isinstance(rows, list) else [rows]
                k, v = c.k, c.v
                for r, (rk, rv) in enumerate(rows):
                    k = k.at[r:r + 1, :rk.shape[1]].set(
                        jnp.asarray(rk, k.dtype))
                    v = v.at[r:r + 1, :rv.shape[1]].set(
                        jnp.asarray(rv, v.dtype))
                    off = rk.shape[1]
                new.append(KVCache(k, v))
            caches = new
        return caches, off

    # --------------------------------------------------------- generate

    def generate(self, text: Union[str, List[str]], max_tokens: int = 512,
                 cfg_scale: float = 1.5, ddpm_steps: Optional[int] = None,
                 voice: Optional[Union[str, Path, List]] = None,
                 verbose: bool = False, seed: int = 0, **kwargs):
        if self.tokenizer is None:
            raise RuntimeError(
                "vibevoice needs its HF tokenizer (Qwen2.5); place "
                "tokenizer files in the model directory")
        if isinstance(text, list) and isinstance(voice, list):
            yield from self._generate_multi(list(zip(voice, text)),
                                            max_tokens, cfg_scale,
                                            ddpm_steps, verbose, seed)
            return
        if voice is not None and str(voice) != self._voice_path:
            self.load_voice(voice)
        yield from self._generate_single(text, max_tokens, cfg_scale,
                                         ddpm_steps, verbose, seed)

    def _generate_multi(self, dialogue, max_tokens, cfg_scale, ddpm_steps,
                        verbose, seed):
        t0 = time.perf_counter()
        parts, total = [], 0
        for idx, (vname, seg) in enumerate(dialogue):
            self.load_voice(vname)
            for r in self._generate_single(seg, max_tokens, cfg_scale,
                                           ddpm_steps, verbose, seed + idx):
                parts.append(np.asarray(r.audio))
                total += r.token_count
        audio = np.concatenate(parts) if parts else np.zeros(0, np.float32)
        dt = time.perf_counter() - t0
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=jnp.asarray(audio), samples=len(audio),
            sample_rate=self.sample_rate, segment_idx=0, token_count=total,
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 2) if dt else 0.0,
            prompt={"tokens": total,
                    "tokens-per-sec": round(total / dt, 2) if dt else 0},
            audio_samples={"samples": len(audio),
                           "samples-per-sec":
                               round(len(audio) / dt, 2) if dt else 0},
            processing_time_seconds=dt, peak_memory_usage=0.0)

    def _generate_single(self, text: str, max_tokens: int,
                         cfg_scale: float, ddpm_steps: Optional[int],
                         verbose: bool, seed: int):
        cfg = self.config
        dh = cfg.diffusion_head_config
        steps = ddpm_steps or dh.ddpm_num_inference_steps
        t0 = time.perf_counter()

        ids = self.tokenizer.encode(text.strip() + "\n",
                                    add_special_tokens=False)
        n = len(ids)
        lm_cfg, tts_cfg = self._cfgs()
        W = TTS_TEXT_WINDOW_SIZE

        v = self._voice
        v_lm = v["lm_kv"][0][0].shape[1] if v else 0
        v_tts = v["tts_kv"][0][0].shape[1] if v else 0
        rnd = lambda x, m: ((x + m - 1) // m) * m  # noqa: E731
        lm_cap = rnd(v_lm + n + W + 1, 128)
        tts_cap = rnd(v_tts + n + W + max_tokens
                      + TTS_SPEECH_WINDOW_SIZE + 1, 256)

        lm_caches, lm_off = self._init_caches(
            lm_cfg, 1, lm_cap, v["lm_kv"] if v else None)
        tts_kvs = ([[pk, nk] for pk, nk in zip(v["tts_kv"],
                                               v["neg_tts_kv"])]
                   if v else None)
        tts_caches, tts_off = self._init_caches(tts_cfg, 2, tts_cap,
                                                tts_kvs)
        pos_cond = (jnp.asarray(v["tts_hidden"][:, -1]) if v else None)
        neg_cond = (jnp.asarray(v["neg_tts_hidden"][:, -1]) if v else None)

        tables = {k: jnp.asarray(a) for k, a in
                  dpm_tables(dh.ddpm_num_steps, steps,
                             dh.ddpm_beta_schedule).items()}
        text_window, speech_step = self._fns(lm_cap, tts_cap, steps)

        rng = jax.random.PRNGKey(seed)
        scale = jnp.float32(cfg_scale)
        latents: List[np.ndarray] = []
        step = text_pos = 0
        finished = False
        lm_o = jnp.int32(lm_off)
        tts_o = jnp.int32(tts_off)
        while not finished and step < max_tokens:
            if text_pos < n:
                w = min(W, n - text_pos)
                win = np.zeros((1, W), np.int32)
                win[0, :w] = ids[text_pos:text_pos + w]
                text_pos += w
                lm_caches, tts_caches, pos_cond, neg_cond = text_window(
                    self.params, jnp.asarray(win), jnp.int32(w),
                    lm_caches, tts_caches, lm_o, tts_o)
                lm_o = lm_o + w
                tts_o = tts_o + w
            if pos_cond is None:
                break
            for _ in range(TTS_SPEECH_WINDOW_SIZE):
                (latent, tts_caches, pos_cond, neg_cond, eos,
                 rng) = speech_step(self.params, tts_caches, pos_cond,
                                    neg_cond, tts_o, rng, tables, scale)
                tts_o = tts_o + 1
                latents.append(np.asarray(latent))
                step += 1
                if float(eos) > 0.5 or step >= max_tokens:
                    finished = True
                    break
            if text_pos >= n and not latents:
                break

        if latents:
            seq = np.stack(latents, axis=1)     # (1, L, vae_dim)
            L = seq.shape[1]
            hop = cfg.acoustic_tokenizer_config.hop_length
            b = next((x for x in LATENT_BUCKETS if L <= x),
                     rnd(L, 256))
            padded = np.zeros((1, b, seq.shape[2]), np.float32)
            padded[:, :L] = seq
            audio = np.asarray(self._dec_fn(b)(
                self.params, jnp.asarray(padded)))[0, :L * hop]
        else:
            audio = np.zeros(0, np.float32)

        dt = time.perf_counter() - t0
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=jnp.asarray(audio), samples=len(audio),
            sample_rate=self.sample_rate, segment_idx=0, token_count=n,
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 2) if dt else 0.0,
            prompt={"tokens": n,
                    "tokens-per-sec": round(n / dt, 2) if dt else 0},
            audio_samples={"samples": len(audio),
                           "samples-per-sec":
                               round(len(audio) / dt, 2) if dt else 0},
            processing_time_seconds=dt, peak_memory_usage=0.0)

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        a = self.config.acoustic_tokenizer_config
        km = a.mixer_kernel
        ratios = a.ratios
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.startswith("model."):
                k = k[len("model."):]
            if "rotary_emb.inv_freq" in k or k.startswith("lm_head."):
                continue
            for pref in ("tts_language_model.", "language_model."):
                if k.startswith(pref) and \
                        not k.startswith(pref + "model."):
                    k = pref + "model." + k[len(pref):]
                    break
            if k.endswith(".weight") and v.ndim == 3:
                if ".convtr." in k:
                    # upsample_layers.N.0.convtr.convtr: torch (I, O, K)
                    idx = int(k.split("upsample_layers.")[1].split(".")[0])
                    kern = 2 * ratios[idx - 1]
                    if v.shape[0] != kern:
                        v = convert_torch_conv_transpose_weight(v)
                elif v.shape[-1] == km and v.shape[0] != km:
                    v = jnp.transpose(v, (2, 1, 0))   # torch (O, I/g, K)
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer
            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            try:
                import json
                from transformers import AutoTokenizer
                name = "Qwen/Qwen2.5-0.5B"
                pc = Path(model_path) / "preprocessor_config.json"
                if pc.exists():
                    name = json.loads(pc.read_text()).get(
                        "language_model_pretrained_name", name)
                model.tokenizer = AutoTokenizer.from_pretrained(name)
            except Exception:
                model.tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "head_forward", "diffusion_sample",
           "decode_latents", "init_vibevoice"]
