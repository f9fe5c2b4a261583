"""KugelAudio: 7B VibeVoice-derived AR+diffusion TTS (24 EU languages).

Parity: /root/reference/mlx_audio/tts/models/kugelaudio/kugelaudio.py
(unified Qwen2.5 LM constrained to 4 speech tokens :118-146, SDE-DPM-
Solver++ diffusion per speech_diffusion token :108-167 + scheduler.py,
CFG negative stream primed with a bare speech_start :227-233, final-latent
logit margin :34-36 & :256-266, batch decode of all latents :330-347).

TPU design: the diffusion sampler is ONE lax.scan over the SDE tables
(sde_dpm_tables) with the CFG pair batched through the prediction head;
each AR step is a single compiled program running both the positive and
negative LM streams; latents batch-decode through the shared VibeVoice
causal VAE decoder per length bucket. Reuses vibevoice's head_forward /
decode_latents / init pieces (kugelaudio checkpoints ARE VibeVoice-shaped).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_linear,
    init_rms_norm,
)
from ....ops.kvcache import KVCache
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..llama.llama import init_llama, llama_forward
from ..vibevoice.config import (
    AcousticTokenizerConfig,
    DiffusionHeadConfig,
    Qwen2DecoderConfig,
)
from ..vibevoice.scheduler import sde_dpm_tables
from ..vibevoice.vibevoice import (
    _init_vae_decoder,
    _llama_cfg,
    decode_latents,
    head_forward,
)

Array = jax.Array

SPEECH_START_ID = 151652
SPEECH_END_ID = 151653
SPEECH_DIFFUSION_ID = 151654
EOS_TOKEN_ID = 151643
VALID_SPEECH_TOKENS = (SPEECH_START_ID, SPEECH_END_ID, SPEECH_DIFFUSION_ID,
                       EOS_TOKEN_ID)
FINAL_LATENT_LOGIT_MARGIN = 5.0

MAX_CACHE_LEN = 4096
PROMPT_BUCKETS = (64, 128, 256, 512, 1024)
LATENT_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "kugelaudio"
    model_path: Optional[str] = None
    sample_rate: int = 24000
    acoustic_tokenizer_config: AcousticTokenizerConfig = field(
        default_factory=AcousticTokenizerConfig)
    decoder_config: Qwen2DecoderConfig = field(
        default_factory=Qwen2DecoderConfig)
    diffusion_head_config: DiffusionHeadConfig = field(
        default_factory=DiffusionHeadConfig)
    acoustic_vae_dim: int = 64
    semantic_vae_dim: int = 128
    tie_word_embeddings: bool = False

    @classmethod
    def from_dict(cls, params: dict) -> "ModelConfig":
        params = dict(params or {})
        if "acostic_vae_dim" in params:      # upstream config typo
            params.setdefault("acoustic_vae_dim",
                              params.pop("acostic_vae_dim"))
        params.pop("semantic_tokenizer_config", None)
        return super().from_dict(params)

    def __post_init__(self):
        if isinstance(self.acoustic_tokenizer_config, dict):
            self.acoustic_tokenizer_config = AcousticTokenizerConfig \
                .from_dict(self.acoustic_tokenizer_config)
        if isinstance(self.decoder_config, dict):
            self.decoder_config = Qwen2DecoderConfig.from_dict(
                self.decoder_config)
        if isinstance(self.diffusion_head_config, dict):
            self.diffusion_head_config = DiffusionHeadConfig.from_dict(
                self.diffusion_head_config)


class Model(FunctionalModel):
    """KugelAudio-0-open (hybrid AR + diffusion, CFG)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        cfg = self.config
        d = cfg.decoder_config
        ks = iter(jax.random.split(key, 24))
        lm = init_llama(next(ks), _llama_cfg(d, d.num_hidden_layers),
                        lm_head=False)
        h = d.hidden_size
        dh = cfg.diffusion_head_config
        ffn = int(dh.hidden_size * dh.head_ffn_ratio)
        head = {
            "noisy_images_proj": init_linear(next(ks), dh.latent_size,
                                             dh.hidden_size, bias=False),
            "cond_proj": init_linear(next(ks), h, dh.hidden_size,
                                     bias=False),
            "t_embedder": {"mlp": {
                "0": init_linear(next(ks), dh.freq_embed_size,
                                 dh.hidden_size, bias=False),
                "2": init_linear(next(ks), dh.hidden_size, dh.hidden_size,
                                 bias=False)}},
            "layers": {},
            "final_layer": {
                "linear": init_linear(next(ks), dh.hidden_size,
                                      dh.latent_size, bias=False),
                "adaLN_modulation": {"1": init_linear(
                    next(ks), dh.hidden_size, 2 * dh.hidden_size,
                    bias=False)}},
        }
        lkeys = iter(jax.random.split(next(ks), 8 * dh.head_layers))
        for i in range(dh.head_layers):
            head["layers"][str(i)] = {
                "ffn": {"gate_proj": init_linear(next(lkeys), dh.hidden_size,
                                                 ffn, bias=False),
                        "up_proj": init_linear(next(lkeys), dh.hidden_size,
                                               ffn, bias=False),
                        "down_proj": init_linear(next(lkeys), ffn,
                                                 dh.hidden_size,
                                                 bias=False)},
                "norm": init_rms_norm(dh.hidden_size),
                "adaLN_modulation": {"1": init_linear(
                    next(lkeys), dh.hidden_size, 3 * dh.hidden_size,
                    bias=False)}}
        p = {
            "language_model": lm,
            "acoustic_connector": {
                "fc1": init_linear(next(ks), cfg.acoustic_vae_dim, h),
                "norm": init_rms_norm(h),
                "fc2": init_linear(next(ks), h, h)},
            "prediction_head": head,
            "acoustic_tokenizer": {"decoder": _init_vae_decoder(
                next(ks), cfg.acoustic_tokenizer_config)},
            "speech_scaling_factor": jnp.asarray(1.0),
            "speech_bias_factor": jnp.asarray(0.0),
        }
        if not cfg.tie_word_embeddings:
            p["lm_head"] = init_linear(next(ks), h, d.vocab_size,
                                       bias=False)
        return p

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if k.startswith("language_model.") and \
                    not k.startswith("language_model.model."):
                k = "language_model.model." + k[len("language_model."):]
            out[k] = jnp.asarray(v)
        return out

    def model_quant_predicate(self, path, w):
        return path.startswith("language_model.")

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model.tokenizer = None
        return model

    # ------------------------------------------------------------- pieces

    def _lm_cfg(self):
        d = self.config.decoder_config
        return _llama_cfg(d, d.num_hidden_layers)

    def _logits(self, p, hidden):
        if "lm_head" in p:
            return apply_linear(p["lm_head"], hidden)
        w = p["language_model"]["model"]["embed_tokens"]["weight"]
        return hidden @ w.T

    def _connector(self, p, latent):
        c = p["acoustic_connector"]
        h = apply_linear(c["fc1"], latent)
        h = apply_rms_norm(c["norm"], h,
                           self.config.decoder_config.rms_norm_eps)
        return apply_linear(c["fc2"], h)

    def _prefill_fn(self, pb: int):
        """Cached jit: prompt prefill into fresh MAX_CACHE_LEN caches."""
        pf = self._jit_cache.get(("prefill", pb))
        if pf is not None:
            return pf
        lm_cfg = self._lm_cfg()

        def prefill(p, tok, n):
            caches = [KVCache.init(
                1, MAX_CACHE_LEN, lm_cfg.num_key_value_heads,
                lm_cfg.resolved_head_dim, jnp.float32)
                for _ in range(lm_cfg.num_hidden_layers)]
            pad = jnp.where(jnp.arange(MAX_CACHE_LEN) < n, 0.0,
                            -jnp.inf)[None, None, None, :]
            hidden, caches = llama_forward(
                p["language_model"], lm_cfg, tok, caches=caches,
                offset=0, mask=pad[:, 0, 0])
            idx = jnp.clip(n - 1, 0, pb - 1)
            return caches, jax.lax.dynamic_slice_in_dim(hidden, idx, 1, 1)

        pf = jax.jit(prefill)
        self._jit_cache[("prefill", pb)] = pf
        return pf

    def _neg_prefill_fn(self):
        """Cached jit: CFG negative stream primed with a bare speech_start
        (reference kugelaudio.py:227-233)."""
        nf = self._jit_cache.get("neg_prefill")
        if nf is not None:
            return nf
        lm_cfg = self._lm_cfg()

        def neg_prefill(p):
            caches = [KVCache.init(
                1, MAX_CACHE_LEN, lm_cfg.num_key_value_heads,
                lm_cfg.resolved_head_dim, jnp.float32)
                for _ in range(lm_cfg.num_hidden_layers)]
            tok = jnp.asarray([[SPEECH_START_ID]], jnp.int32)
            hidden, caches = llama_forward(
                p["language_model"], lm_cfg, tok, caches=caches, offset=0)
            return caches, hidden

        nf = jax.jit(neg_prefill)
        self._jit_cache["neg_prefill"] = nf
        return nf

    def _step_fns(self):
        """Cached jits: one LM step (donated caches), the constrained
        4-token pick, and the latent->embed connector."""
        step = self._jit_cache.get("step")
        if step is not None:
            return step
        lm_cfg = self._lm_cfg()
        valid = jnp.asarray(VALID_SPEECH_TOKENS, jnp.int32)

        def lm_step(p, caches, offset, embed):
            hidden, caches = llama_forward(
                p["language_model"], lm_cfg, embed, caches=caches,
                offset=offset)
            return caches, hidden

        def pick(p, hidden):
            logits = self._logits(p, hidden[:, -1])[0]
            keep = jnp.full(logits.shape, -jnp.inf).at[valid].set(0.0)
            masked = logits + keep
            return jnp.argmax(masked), masked

        step = {"lm": jax.jit(lm_step, donate_argnums=(1,)),
                "pick": jax.jit(pick),
                "connector": jax.jit(self._connector)}
        self._jit_cache["step"] = step
        return step

    def _sde_fn(self, steps: int, cfg_scale: float):
        sde = self._jit_cache.get(("sde", steps, cfg_scale))
        if sde is None:
            sde = self._sde_sample_fn(steps, cfg_scale)
            self._jit_cache[("sde", steps, cfg_scale)] = sde
        return sde

    def _sde_sample_fn(self, ddpm_steps: int, cfg_scale: float):
        dh = self.config.diffusion_head_config
        tables = {k: jnp.asarray(v) for k, v in sde_dpm_tables(
            dh.ddpm_num_steps, ddpm_steps,
            dh.ddpm_beta_schedule).items()}
        use_cfg = cfg_scale > 1.0

        def run(p, cond, neg_cond, key):
            b = cond.shape[0]
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, (b, dh.latent_size), jnp.float32)
            cond2 = jnp.concatenate([cond, neg_cond], axis=0) \
                .astype(jnp.float32) if use_cfg else cond.astype(jnp.float32)

            def body(carry, tab):
                speech, prev_x0, key = carry
                if use_cfg:
                    sp2 = jnp.concatenate([speech, speech], axis=0)
                    t2 = jnp.full((2 * b,), tab["t"])
                    eps = head_forward(p["prediction_head"], dh, sp2, t2,
                                       cond2).astype(jnp.float32)
                    guided = eps[b:] + cfg_scale * (eps[:b] - eps[b:])
                else:
                    t1 = jnp.full((b,), tab["t"])
                    guided = head_forward(p["prediction_head"], dh, speech,
                                          t1, cond2).astype(jnp.float32)
                x0 = tab["alpha"] * speech - tab["sigma"] * guided
                key, sub = jax.random.split(key)
                z = jax.random.normal(sub, speech.shape, jnp.float32)
                first = (tab["a_sample"] * speech + tab["b_x0"] * x0
                         + tab["c_noise"] * z)
                d1 = tab["inv_r0"] * (x0 - prev_x0)
                second = first + 0.5 * tab["b_x0"] * d1
                nxt = jnp.where(tab["use_first"] > 0, first, second)
                return (nxt, x0, key), None

            (speech, _, key), _ = jax.lax.scan(
                body, (noise, jnp.zeros_like(noise), key), tables)
            return speech, key

        return jax.jit(run)

    # ------------------------------------------------------------ generate

    def _build_prompt_tokens(self, text: str) -> List[int]:
        formatted = text.strip()
        if not formatted.startswith("Speaker"):
            formatted = f"Speaker 0: {formatted}"
        full = (" Transform the text provided by various speakers into "
                "speech output, utilizing the distinct voice of each "
                "respective speaker.\n"
                f" Text input:\n {formatted}\n Speech output:\n")
        toks = list(self.tokenizer.encode(full, add_special_tokens=False))
        toks.append(SPEECH_START_ID)
        return toks

    def generate(self, text: str, voice: Optional[str] = None,
                 cfg_scale: float = 3.0, max_tokens: int = 2048,
                 ddpm_steps: Optional[int] = None, verbose: bool = False,
                 seed: int = 0, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        del voice
        if not text or not text.strip():
            raise ValueError("text must be a non-empty string")
        if self.tokenizer is None:
            raise RuntimeError("Tokenizer not loaded")
        cfg = self.config
        lm_cfg = self._lm_cfg()
        steps = ddpm_steps if ddpm_steps is not None else \
            cfg.diffusion_head_config.ddpm_num_inference_steps
        t0 = time.perf_counter()

        prompt = self._build_prompt_tokens(text)
        plen = len(prompt)
        pb = _bucket(plen, PROMPT_BUCKETS)
        ids = np.zeros((1, pb), np.int32)
        ids[0, :plen] = prompt

        pf = self._prefill_fn(pb)
        caches, hidden = pf(self.params, jnp.asarray(ids), jnp.int32(plen))

        use_cfg = cfg_scale > 1.0
        neg_caches = neg_hidden = None
        if use_cfg:
            neg_caches, neg_hidden = self._neg_prefill_fn()(self.params)

        step = self._step_fns()
        sde = self._sde_fn(steps, cfg_scale)

        key = jax.random.PRNGKey(seed)
        latents: List[np.ndarray] = []
        offset, neg_offset = plen, 1
        total = plen
        finished = False
        n_steps = 0
        while not finished and n_steps < max_tokens:
            tok, masked = step["pick"](self.params, hidden)
            tok_id = int(tok)
            total += 1
            n_steps += 1
            if tok_id in (SPEECH_END_ID, EOS_TOKEN_ID):
                m = np.asarray(masked)
                if latents and m[SPEECH_DIFFUSION_ID] > \
                        m[tok_id] - FINAL_LATENT_LOGIT_MARGIN:
                    lat, key = sde(self.params, hidden[:, -1],
                                   neg_hidden[:, -1] if use_cfg
                                   else hidden[:, -1], key)
                    latents.append(np.asarray(lat))
                finished = True
                break
            if tok_id == SPEECH_DIFFUSION_ID:
                lat, key = sde(self.params, hidden[:, -1],
                               neg_hidden[:, -1] if use_cfg
                               else hidden[:, -1], key)
                latents.append(np.asarray(lat))
                embed = step["connector"](self.params, lat[:, None])
                caches, hidden = step["lm"](self.params, caches,
                                            jnp.int32(offset), embed)
                offset += 1
                if use_cfg:
                    neg_caches, neg_hidden = step["lm"](
                        self.params, neg_caches, jnp.int32(neg_offset),
                        embed)
                    neg_offset += 1
            elif tok_id == SPEECH_START_ID:
                embed = apply_embedding(
                    self.params["language_model"]["model"]["embed_tokens"],
                    jnp.asarray([[tok_id]], jnp.int32))
                caches, hidden = step["lm"](self.params, caches,
                                            jnp.int32(offset), embed)
                offset += 1

        dt = max(time.perf_counter() - t0, 1e-6)
        if not latents:
            yield self._result(np.zeros((0,), np.float32), total, dt)
            return
        seq = np.stack(latents, axis=1)                 # (1, T, vae)
        scale = float(np.asarray(self.params["speech_scaling_factor"]))
        bias = float(np.asarray(self.params["speech_bias_factor"]))
        if not np.isnan(scale):
            seq = seq / scale - bias
        n = seq.shape[1]
        lb = _bucket(n, LATENT_BUCKETS)
        dec = self._jit_cache.get(("dec", lb))
        if dec is None:
            a = cfg.acoustic_tokenizer_config
            dec = jax.jit(lambda p, x: decode_latents(
                p["acoustic_tokenizer"], a, x))
            self._jit_cache[("dec", lb)] = dec
        padded = np.zeros((1, lb, seq.shape[2]), np.float32)
        padded[:, :n] = seq
        hop = int(np.prod(cfg.acoustic_tokenizer_config.ratios))
        audio = np.asarray(dec(self.params, jnp.asarray(padded)))[
            0, :n * hop]
        peak = np.abs(audio).max()
        if peak > 1.0:
            audio = audio * (0.95 / peak)
        yield self._result(audio, total, time.perf_counter() - t0)

    def _result(self, audio, n_tokens, dt) -> GenerationResult:
        dur = len(audio) / self.sample_rate
        return GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=n_tokens,
            audio_duration=format_duration(dur),
            real_time_factor=round(dt / max(dur, 1e-6), 2),
            prompt={"tokens": n_tokens,
                    "tokens-per-sec": round(n_tokens / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb())


def init_rms_norm(dim):
    from ....nn import init_rms_norm

    return init_rms_norm(dim)


__all__ = ["Model", "ModelConfig", "SPEECH_START_ID", "SPEECH_END_ID",
           "SPEECH_DIFFUSION_ID", "VALID_SPEECH_TOKENS"]
