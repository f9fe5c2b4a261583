"""Qwen2-Audio: Whisper-style tower (+2x avg-pool) + Qwen2 LM.

Parity: /root/reference/mlx_audio/stt/models/qwen2_audio/qwen2_audio.py
(Qwen2AudioEncoder :95 — conv stem, sinusoidal positions, post-layer 2x
average pooling; MultiModalProjector :143; chat-template prompt with
"Audio N: <|audio_bos|>...<|audio_eos|>" lines :351; cumsum-gather audio
splice :380-425; greedy decode).

TPU design: the tower is one bucketed jitted forward per 30-s whisper-mel
chunk; the Qwen2 LM rides the shared llama backbone (qkv bias) and the
whole greedy decode runs as one compiled while_loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, init_linear
from ....tts.models.llama.llama import (
    ModelConfig as LlamaConfig,
    decode_step,
    init_caches,
    init_llama,
    llama_forward,
    logits_from_hidden,
)
from ...models.base import STTOutput
from ..voxtral.voxtral import AudioConfig, audio_tower_forward, \
    init_audio_tower
from ..whisper.audio import N_FRAMES, SAMPLE_RATE, log_mel_spectrogram

Array = jax.Array

PROMPT_BUCKETS = (512, 1024, 2048, 4096)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


def sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "qwen2_audio"
    audio_config: Optional[dict] = None
    text_config: Optional[dict] = None
    audio_token_id: int = 151646
    audio_bos_token_id: int = 151647
    audio_eos_token_id: int = 151648
    model_path: str = ""

    def __post_init__(self):
        self.audio = AudioConfig.from_dict(self.audio_config or {})
        t = dict(self.text_config or {})
        t.setdefault("attention_bias", True)   # Qwen2 qkv bias
        self.text = LlamaConfig.from_dict(t)


class Model(FunctionalModel):
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
        return SAMPLE_RATE

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cfg = self.config
        tower = init_audio_tower(k1, cfg.audio)
        # qwen2_audio uses fixed sinusoidal positions (reference :31-39)
        tower["embed_positions"] = {"weight": jnp.asarray(sinusoids(
            cfg.audio.max_source_positions + 1, cfg.audio.d_model))}
        return {
            "audio_tower": tower,
            "multi_modal_projector": {"linear": init_linear(
                k2, cfg.audio.d_model, cfg.text.hidden_size)},
            "language_model": init_llama(k3, cfg.text),
        }

    # ----------------------------------------------------------- encoding

    def get_audio_embeds(self, audio: np.ndarray) -> Tuple[Array, int]:
        """30-s chunk -> (n_tokens, lm_hidden): tower + 2x avg pool +
        linear projector."""
        a = self.config.audio
        fn = self._jit_cache.get("tower")
        if fn is None:
            # like the voxtral tower but with 2x average pooling BEFORE the
            # final layer norm (reference :121-141), then the projector
            def full(p, mel):
                from ....nn import apply_conv1d, apply_layer_norm
                from ....ops.attention import attention

                tp = p["audio_tower"]
                x = jax.nn.gelu(apply_conv1d(tp["conv1"], mel, padding=1),
                                approximate=False)
                x = jax.nn.gelu(apply_conv1d(tp["conv2"], x, stride=2,
                                             padding=1), approximate=False)
                x = x + tp["embed_positions"]["weight"][None, : x.shape[1]]
                b, t, d = x.shape
                h = a.encoder_attention_heads
                for i in range(a.encoder_layers):
                    lp = tp["layers"][str(i)]
                    hn = apply_layer_norm(lp["self_attn_layer_norm"], x)
                    sa = lp["self_attn"]
                    q = apply_linear(sa["q_proj"], hn).reshape(b, t, h,
                                                               d // h)
                    k = apply_linear(sa["k_proj"], hn).reshape(b, t, h,
                                                               d // h)
                    v = apply_linear(sa["v_proj"], hn).reshape(b, t, h,
                                                               d // h)
                    o = attention(q, k, v).reshape(b, t, d)
                    x = x + apply_linear(sa["out_proj"], o)
                    hn = apply_layer_norm(lp["final_layer_norm"], x)
                    x = x + apply_linear(lp["fc2"], jax.nn.gelu(
                        apply_linear(lp["fc1"], hn), approximate=False))
                # 2x average pool then final norm (reference :121-141)
                t2 = (t // 2) * 2
                x = x[:, :t2].reshape(b, t2 // 2, 2, d).mean(axis=2)
                x = apply_layer_norm(tp["layer_norm"], x)
                return apply_linear(p["multi_modal_projector"]["linear"], x)

            fn = jax.jit(full)
            self._jit_cache["tower"] = fn
        wav = np.asarray(audio, np.float32).reshape(-1)
        mel = np.zeros((N_FRAMES, a.num_mel_bins), np.float32)
        m = np.asarray(log_mel_spectrogram(wav[: N_FRAMES * 160],
                                           n_mels=a.num_mel_bins))
        mel[: m.shape[0]] = m[:N_FRAMES]
        out = fn(self.params, jnp.asarray(mel[None]))[0]
        return out, out.shape[0]

    def _build_prompt_ids(self, n_audio_tokens: int,
                          prompt: Optional[str]) -> List[int]:
        cfg = self.config
        user_prompt = prompt or "Please transcribe the speech."
        tok = self._tokenizer
        if tok is not None and hasattr(tok, "apply_chat_template"):
            content = ("Audio 1: <|audio_bos|>"
                       + "<|AUDIO|>" * n_audio_tokens
                       + "<|audio_eos|>\n" + user_prompt)
            chat = [{"role": "user", "content": content}]
            text = tok.apply_chat_template(chat, tokenize=False,
                                           add_generation_prompt=True)
            return list(tok.encode(text))
        # minimal fallback: text ids best-effort + audio placeholders
        ids = [cfg.audio_bos_token_id] + \
            [cfg.audio_token_id] * n_audio_tokens + [cfg.audio_eos_token_id]
        if tok is not None:
            ids += list(tok.encode(user_prompt))
        return ids

    # ------------------------------------------------------------- decode

    def _lm_fns(self, pb: int, max_tokens: int, eos_ids: Tuple[int, ...],
                temperature: float = 0.0, top_k: int = 0,
                top_p: float = 1.0, min_p: float = 0.0,
                repetition_penalty: float = 1.0,
                repetition_context_size: int = 20):
        key_ = ("lm", pb, max_tokens, eos_ids, temperature, top_k, top_p,
                min_p, repetition_penalty, repetition_context_size)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        from ....ops.sampling import apply_repetition_penalty, make_sampler

        sampler = make_sampler(temperature=temperature, top_k=top_k,
                               top_p=top_p, min_p=min_p)
        t = self.config.text
        cap = pb + max_tokens
        eos = jnp.asarray(eos_ids, jnp.int32)

        def prefill(p, embeds, length):
            caches = init_caches(t, 1, cap, dtype=jnp.float32)
            pad = jnp.where(jnp.arange(cap)[None] < length, 0.0, -jnp.inf)
            hidden, caches = llama_forward(p["language_model"], t, embeds,
                                           caches=caches, offset=0,
                                           mask=pad)
            lg = logits_from_hidden(
                p["language_model"], t,
                hidden[jnp.arange(1), length - 1][:, None])[:, 0]
            return lg, caches

        def decode(p, lg, caches, plen, rng):
            toks0 = jnp.full((max_tokens,), -1, jnp.int32)
            hist0 = jnp.full((1, repetition_context_size), -1, jnp.int32)

            def cond(st):
                i = st[0]
                done = st[-1]
                return jnp.logical_and(i < max_tokens,
                                       jnp.logical_not(done))

            def body(st):
                i, lg, caches, toks, hist, rng, done = st
                if temperature <= 0.0 and repetition_penalty == 1.0:
                    tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)[0]
                else:
                    lg2 = apply_repetition_penalty(
                        lg.astype(jnp.float32), hist, repetition_penalty)
                    rng, sub = jax.random.split(rng)
                    tok = sampler(sub, lg2)[0] if temperature > 0.0 \
                        else jnp.argmax(lg2, axis=-1).astype(jnp.int32)[0]
                is_eos = jnp.any(tok == eos)
                toks = jnp.where(is_eos, toks, toks.at[i].set(tok))
                hist = jnp.roll(hist, -1, axis=1).at[:, -1].set(
                    jnp.where(is_eos, -1, tok))
                lg2, caches = decode_step(p["language_model"], t,
                                          tok[None, None], caches,
                                          plen + i)
                return (i + 1, lg2, caches, toks, hist, rng,
                        jnp.logical_or(done, is_eos))

            _, _, _, toks, _, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), lg, caches, toks0, hist0, rng,
                             jnp.bool_(False)))
            return toks

        fns = (jax.jit(prefill), jax.jit(decode))
        self._jit_cache[key_] = fns
        return fns

    def generate(self, audio, *, prompt: Optional[str] = None,
                 max_tokens: int = 256, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0,
                 repetition_context_size: int = 20, seed: int = 0,
                 verbose: bool = False,
                 **kwargs) -> STTOutput:
        t0 = time.time()
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio

            audio = np.asarray(load_audio(str(audio), SAMPLE_RATE))
        audio_embeds, n_audio = self.get_audio_embeds(audio)
        ids = self._build_prompt_ids(n_audio, prompt)
        n = len(ids)
        pb = _bucket(n, PROMPT_BUCKETS)
        tok_arr = np.zeros((1, pb), np.int32)
        tok_arr[0, :n] = ids
        embeds = np.array(apply_embedding(
            self.params["language_model"]["model"]["embed_tokens"],
            jnp.asarray(np.where(tok_arr >= self.config.text.vocab_size, 0,
                                 tok_arr))))
        pos = np.where(tok_arr[0, :n] == self.config.audio_token_id)[0]
        m = min(len(pos), n_audio)
        embeds[0, pos[:m]] = np.asarray(audio_embeds)[:m]

        eos = self._eos_ids()
        prefill, decode = self._lm_fns(
            pb, max_tokens, eos, temperature=float(temperature),
            top_k=int(top_k), top_p=float(top_p), min_p=float(min_p),
            repetition_penalty=float(repetition_penalty),
            repetition_context_size=int(repetition_context_size))
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.int32(n))
        toks = np.asarray(decode(self.params, lg, caches, jnp.int32(n),
                                 jax.random.PRNGKey(seed)))
        generated = [int(x) for x in toks[toks >= 0]]
        text = (self._tokenizer.decode(generated,
                                       skip_special_tokens=True)
                if self._tokenizer is not None
                else " ".join(map(str, generated)))
        dt = time.time() - t0
        if verbose:
            print(text)
        return STTOutput(
            text=text.strip(), language="en",
            segments=[{"text": text.strip(), "start": 0.0,
                       "end": len(np.asarray(audio).reshape(-1))
                       / SAMPLE_RATE}],
            prompt_tokens=n, generation_tokens=len(generated),
            total_tokens=n + len(generated), total_time=dt,
            prompt_tps=n / dt if dt else 0.0,
            generation_tps=len(generated) / dt if dt else 0.0)

    __call__ = generate

    def _eos_ids(self) -> Tuple[int, ...]:
        ids = set()
        tok = self._tokenizer
        if tok is not None:
            if getattr(tok, "eos_token_id", None) is not None:
                ids.add(int(tok.eos_token_id))
            conv = getattr(tok, "convert_tokens_to_ids", None)
            if conv is not None:
                for s in ("<|im_end|>", "<|endoftext|>"):
                    i = conv(s)
                    if i is not None and i != getattr(tok, "unk_token_id",
                                                      None):
                        ids.add(int(i))
        if not ids:
            ids.update((151645, 151643))
        return tuple(sorted(ids))

    # ------------------------------------------------------------ loading

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.endswith("rotary_emb.inv_freq"):
                continue
            if "embed_positions" in k:
                # keep the checkpoint's position table under the tree's name
                out["audio_tower.embed_positions.weight"] = v
                continue
            if "conv" in k and k.endswith("weight") and v.ndim == 3 \
                    and v.shape[0] > v.shape[-1]:
                v = jnp.transpose(v, (2, 1, 0))
            out[k] = v
        if "audio_tower.embed_positions.weight" not in out:
            # checkpoints that omit the table get whisper sinusoids
            a = self.config.audio
            out["audio_tower.embed_positions.weight"] = jnp.asarray(
                sinusoids(a.max_source_positions + 1, a.d_model))
        return out

    def model_quant_predicate(self, path, w):
        return not path.startswith("audio_tower")

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer

            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path))
        except Exception:
            model._tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "sinusoids"]
