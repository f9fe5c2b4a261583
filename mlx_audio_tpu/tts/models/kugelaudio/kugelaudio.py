"""KugelAudio: 7B VibeVoice-derived AR+diffusion TTS (24 EU languages).

Parity: /root/reference/mlx_audio/tts/models/kugelaudio/kugelaudio.py
(unified Qwen2.5 LM constrained to 4 speech tokens :118-146, SDE-DPM-
Solver++ diffusion per speech_diffusion token :108-167 + scheduler.py,
CFG negative stream primed with a bare speech_start :227-233, final-latent
logit margin :34-36 & :256-266, batch decode of all latents :330-347).

TPU design: the whole AR+diffusion frame loop is ONE compiled K-frame
chunk (lax.while_loop) — constrained 4-token pick, SDE-DPM-Solver++
sampler (lax.scan over precomputed tables) under lax.cond, connector, and
the LM advance — with ONE host sync per chunk. The CFG positive and
negative streams run as a single b=2 batched LM step sharing cache slots:
the negative row holds its bare speech_start at slot 0, masks out the
prompt region [1, plen), and carries its own position stream — so the 7B
weight stream is paid ONCE per frame, not twice. The constrained pick
gathers only the 4 valid lm_head rows (START/END/DIFFUSION/EOS) instead
of streaming the full 152k-vocab projection. Latents accumulate on-device
and batch-decode through the shared VibeVoice causal VAE decoder per
length bucket. Reuses vibevoice's head_forward / decode_latents / init
pieces (kugelaudio checkpoints ARE VibeVoice-shaped).
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
CACHE_BUCKETS = (512, 1024, 2048, 4096)
LAT_MAX = 2048           # on-device latent accumulator rows (~0.5 MB f32)
CHUNK_FRAMES = 32        # frames per compiled chunk = one host sync each.
# Large chunks are free: the while_loop cond exits the moment the stream
# finishes (no wasted frames), the compiled program is chunk-size-invariant
# in compile time, and fewer chunks = fewer ~28 ms tunnel round-trips.


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
            lg = apply_linear(p["lm_head"], hidden)
        else:
            w = p["language_model"]["model"]["embed_tokens"]["weight"]
            lg = hidden @ w.T
        s = self.config.decoder_config.logits_scaling
        return lg / s if s != 1.0 else lg

    def _connector(self, p, latent):
        c = p["acoustic_connector"]
        h = apply_linear(c["fc1"], latent)
        h = apply_rms_norm(c["norm"], h,
                           self.config.decoder_config.rms_norm_eps)
        return apply_linear(c["fc2"], h)

    def _pick4_logits(self, p, h):
        """Constrained-decode logits at the 4 valid speech tokens only.

        The reference masks the full 152k-vocab projection to 4 ids
        (kugelaudio.py:118-146); gathering the 4 lm_head rows first gives
        bit-identical argmax/margins without streaming the ~1 GB vocab
        matrix every frame. h: (H,) -> (4,) f32.
        """
        ids = jnp.asarray(VALID_SPEECH_TOKENS, jnp.int32)
        if "lm_head" in p:
            lm = p["lm_head"]
            if "w_i8" in lm:
                w4 = lm["w_i8"][ids].astype(jnp.float32) \
                    * lm["scale"][ids].astype(jnp.float32)[:, None]
            elif "w_q" in lm:
                from ....ops.quant import dequantize_weight

                core = {k: lm[k][ids] for k in ("w_q", "scales", "biases")
                        if k in lm}
                w4 = dequantize_weight(core, jnp.float32)
            else:
                w4 = lm["weight"][ids].astype(jnp.float32)
            out = w4 @ h.astype(jnp.float32)
            if "bias" in lm:
                out = out + lm["bias"][ids].astype(jnp.float32)
        else:
            w = p["language_model"]["model"]["embed_tokens"]["weight"]
            out = w[ids].astype(jnp.float32) @ h.astype(jnp.float32)
        # same logits_scaling division as the full-vocab path — the
        # FINAL_LATENT_LOGIT_MARGIN compare is scale-sensitive, so a
        # checkpoint with logits_scaling != 1.0 must divide here too
        s = self.config.decoder_config.logits_scaling
        return out / s if s != 1.0 else out

    def _prefill2_fn(self, pb: int, use_cfg: bool, cache_len: int):
        """Cached jit: batched prompt prefill into fresh caches.

        With CFG, row 0 is the prompt stream and row 1 the negative stream
        primed with a bare speech_start at slot 0 (reference
        kugelaudio.py:227-233); the additive mask hides row 0's pad tail
        and everything but slot 0 on row 1.
        """
        key = ("prefill2", pb, use_cfg, cache_len)
        pf = self._jit_cache.get(key)
        if pf is not None:
            return pf
        lm_cfg = self._lm_cfg()
        rows = 2 if use_cfg else 1

        def prefill(p, tok, n):
            caches = [KVCache.init(
                rows, cache_len, lm_cfg.num_key_value_heads,
                lm_cfg.resolved_head_dim, jnp.float32)
                for _ in range(lm_cfg.num_hidden_layers)]
            j = jnp.arange(cache_len)
            m0 = jnp.where(j < n, 0.0, -jnp.inf)
            if use_cfg:
                m1 = jnp.where(j == 0, 0.0, -jnp.inf)
                mask = jnp.stack([m0, m1])
            else:
                mask = m0[None]
            hidden, caches = llama_forward(
                p["language_model"], lm_cfg, tok, caches=caches,
                offset=0, mask=mask)
            idx = jnp.stack(
                [jnp.clip(n - 1, 0, pb - 1), jnp.zeros((), jnp.int32)])
            idx = idx[:rows]
            h = jnp.take_along_axis(hidden, idx[:, None, None],
                                    axis=1)[:, 0]          # (rows, H)
            return tuple(caches), h

        pf = jax.jit(prefill)
        self._jit_cache[key] = pf
        return pf

    def _chunk_fn(self, steps: int, cfg_scale: float, cache_len: int,
                  k_frames: int = CHUNK_FRAMES):
        """Cached jit: K latent frames in ONE compiled while_loop.

        Per frame: constrained 4-row pick -> (lax.cond) SDE diffusion
        sample -> on-device latent append -> connector/token embed -> one
        b=2 CFG-batched LM advance (weights stream once for both CFG
        streams). Returns the updated carry plus a packed (n_lat, n_tok,
        finished) i32 status so the host pays one sync per chunk.
        """
        key = ("chunk", steps, cfg_scale, cache_len, k_frames)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        lm_cfg = self._lm_cfg()
        use_cfg = cfg_scale > 1.0
        rows = 2 if use_cfg else 1
        latent = self.config.diffusion_head_config.latent_size
        sde_core = self._sde_core(steps, cfg_scale)
        valid = jnp.asarray(VALID_SPEECH_TOKENS, jnp.int32)

        def chunk(p, carry, plen, max_lat):
            emb_w = p["language_model"]["model"]["embed_tokens"]["weight"]

            def cond(st):
                i, c = st
                return ((i < k_frames) & (~c["finished"])
                        & (c["n_tok"] < max_lat) & (c["n_lat"] < LAT_MAX))

            def body(st):
                i, c = st
                caches, hidden = c["caches"], c["hidden"]
                offset, n_lat = c["offset"], c["n_lat"]
                logits4 = self._pick4_logits(p, hidden[0])
                a = jnp.argmax(logits4)
                is_diff = a == 2
                is_end = (a == 1) | (a == 3)
                margin_ok = logits4[2] > \
                    logits4[a] - FINAL_LATENT_LOGIT_MARGIN
                emit = is_diff | (is_end & margin_ok & (n_lat > 0))

                def run_sde(k):
                    return sde_core(p, hidden[0:1], hidden[rows - 1:rows],
                                    k)

                lat, new_key = jax.lax.cond(
                    emit, run_sde,
                    lambda k: (jnp.zeros((1, latent), jnp.float32), k),
                    c["key"])
                latbuf = jnp.where(
                    emit,
                    jax.lax.dynamic_update_slice(c["latbuf"], lat,
                                                 (n_lat, 0)),
                    c["latbuf"])
                n_lat = n_lat + emit.astype(jnp.int32)
                fin = c["finished"] | is_end

                emb_lat = self._connector(p, lat)[0]
                emb_tok = emb_w[valid[a]]
                embed = jnp.where(is_diff, emb_lat.astype(emb_w.dtype),
                                  emb_tok.astype(emb_w.dtype))
                embed = jnp.broadcast_to(
                    embed, (rows, 1, embed.shape[-1]))
                # the reference advances the negative stream only on
                # diffusion embeds (kugelaudio.py:256-266); a re-emitted
                # START steps the positive row alone. The batched write
                # still lands row 1's kv at this slot, but neg_mask never
                # admits it and row 1's hidden is held.
                adv_neg = is_diff
                neg_mask = c["neg_mask"]
                neg_pos = c["neg_pos"]

                def do_step(cs):
                    j = jnp.arange(cache_len)
                    m0 = j <= offset
                    if use_cfg:
                        m1 = neg_mask | (j == offset)
                        mask = jnp.stack([m0, m1])
                        positions = jnp.stack(
                            [offset, neg_pos])[:, None]
                    else:
                        mask = m0[None]
                        positions = offset[None, None]
                    hseq, ncs = llama_forward(
                        p["language_model"], lm_cfg, embed,
                        positions=positions, caches=list(cs),
                        offset=offset, mask=mask)
                    h = hseq[:, 0]
                    if use_cfg:
                        h = h.at[1].set(
                            jnp.where(adv_neg, h[1], hidden[1]))
                    return tuple(ncs), h

                caches, hidden = jax.lax.cond(
                    fin, lambda cs: (cs, hidden), do_step, caches)
                step_ran = ~fin
                return i + 1, {
                    "caches": caches, "hidden": hidden,
                    "offset": jnp.where(fin, offset, offset + 1),
                    "neg_mask": jnp.where(
                        step_ran & adv_neg,
                        neg_mask | (jnp.arange(cache_len) == offset),
                        neg_mask),
                    "neg_pos": neg_pos + (step_ran & adv_neg),
                    "n_lat": n_lat, "n_tok": c["n_tok"] + 1,
                    "latbuf": latbuf, "finished": fin, "key": new_key}

            _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), carry))
            status = jnp.stack([out["n_lat"], out["n_tok"],
                                out["finished"].astype(jnp.int32)])
            return out, status

        fn = jax.jit(chunk, donate_argnums=(1,))
        self._jit_cache[key] = fn
        return fn

    def _sde_fn(self, steps: int, cfg_scale: float):
        sde = self._jit_cache.get(("sde", steps, cfg_scale))
        if sde is None:
            sde = jax.jit(self._sde_core(steps, cfg_scale))
            self._jit_cache[("sde", steps, cfg_scale)] = sde
        return sde

    def _sde_core(self, ddpm_steps: int, cfg_scale: float):
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

        return run

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
        if max_tokens > LAT_MAX:
            # the compiled chunk's while-cond and the latent accumulator
            # are both capped at LAT_MAX; a larger budget would freeze
            # n_tok at the cap and spin the host loop forever
            import warnings

            warnings.warn(
                f"kugelaudio max_tokens={max_tokens} exceeds the on-device "
                f"latent capacity LAT_MAX={LAT_MAX}; clamping", stacklevel=2)
            max_tokens = LAT_MAX
        steps = ddpm_steps if ddpm_steps is not None else \
            cfg.diffusion_head_config.ddpm_num_inference_steps
        t0 = time.perf_counter()

        prompt = self._build_prompt_tokens(text)
        plen = len(prompt)
        pb = _bucket(plen, PROMPT_BUCKETS)
        use_cfg = cfg_scale > 1.0
        rows = 2 if use_cfg else 1
        cache_len = _bucket(plen + min(max_tokens, LAT_MAX) + 1,
                            CACHE_BUCKETS)
        ids = np.zeros((rows, pb), np.int32)
        ids[0, :plen] = prompt
        if use_cfg:
            ids[1, 0] = SPEECH_START_ID

        collect = getattr(self, "_collect_stats", False)
        pf = self._prefill2_fn(pb, use_cfg, cache_len)
        caches, hidden = pf(self.params, jnp.asarray(ids), jnp.int32(plen))
        if collect:
            jax.block_until_ready(hidden)
            t_pf = time.perf_counter() - t0
        chunk = self._chunk_fn(steps, cfg_scale, cache_len)

        carry = {
            "caches": caches, "hidden": hidden,
            "offset": jnp.int32(plen), "n_lat": jnp.int32(0),
            "n_tok": jnp.int32(0),
            "neg_mask": jnp.arange(cache_len) == 0,
            "neg_pos": jnp.int32(1),
            "latbuf": jnp.zeros(
                (LAT_MAX, cfg.diffusion_head_config.latent_size),
                jnp.float32),
            "finished": jnp.asarray(False), "key": jax.random.PRNGKey(seed)}
        plen_d = jnp.int32(plen)
        max_lat = jnp.int32(min(max_tokens, LAT_MAX))
        n_lat = n_tok = n_chunks = 0
        t_ar0 = time.perf_counter()
        prev_tok = -1
        while True:
            carry, status = chunk(self.params, carry, plen_d, max_lat)
            n_lat, n_tok, fin = (int(x) for x in np.asarray(status))
            n_chunks += 1
            # n_tok == prev_tok: the device while-cond refused every step
            # (latent buffer full) — a further dispatch would be a no-op
            if fin or n_tok >= max_tokens or n_tok == prev_tok:
                break
            prev_tok = n_tok
        if collect:
            self._last_gen_stats = {
                "prefill_s": round(t_pf, 4),
                "ar_s": round(time.perf_counter() - t_ar0, 4),
                "n_chunks": n_chunks, "n_frames": n_tok, "n_lat": n_lat}
        total = plen + n_tok

        dt = max(time.perf_counter() - t0, 1e-6)
        if n_lat == 0:
            yield self._result(np.zeros((0,), np.float32), total, dt)
            return
        # scale/slice/decode fused in ONE device program fed straight from
        # the on-device latent buffer: no latbuf D2H->H2D bounce and no
        # scalar fetches of the scaling factors (2 tunnel RTTs each call)
        lb = min(_bucket(n_lat, LATENT_BUCKETS),
                 int(carry["latbuf"].shape[0]))
        dec = self._jit_cache.get(("dec", lb))
        if dec is None:
            a = cfg.acoustic_tokenizer_config

            def dec_fn(p, latbuf):
                seq = jax.lax.dynamic_slice_in_dim(latbuf, 0, lb, 0)[None]
                scale = p["speech_scaling_factor"]
                bias = p["speech_bias_factor"]
                seq = jnp.where(jnp.isnan(scale), seq, seq / scale - bias)
                return decode_latents(p["acoustic_tokenizer"], a,
                                      seq.astype(jnp.float32))

            dec = jax.jit(dec_fn)
            self._jit_cache[("dec", lb)] = dec
        hop = int(np.prod(cfg.acoustic_tokenizer_config.ratios))
        t_dec0 = time.perf_counter()
        audio = np.asarray(dec(self.params, carry["latbuf"]))[
            0, :n_lat * hop]
        if collect:
            self._last_gen_stats["vae_s"] = round(
                time.perf_counter() - t_dec0, 4)
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
