"""Voxtral: Whisper-style audio tower + Mistral LM transcription.

Parity: /root/reference/mlx_audio/stt/models/voxtral/voxtral.py (Encoder
:141 — conv stem + learned positions + pre-LN layers, MultiModalProjector
:181 grouping 4 encoder frames per LM token, audio-token splice :249,
greedy/sampled decode :371-483) and config.py.

TPU design: the audio tower is one bucketed jitted forward per 30-s chunk
(whisper mel, 3000 frames); the LM rides the shared llama backbone and the
whole decode (prefill over the spliced embeds + AR loop + EOS stop) is one
compiled while_loop. The tekken tokenizer handles both directions with a
greedy byte-level encoder for the short "lang:xx" prompt piece.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache
from ...models.base import STTOutput
from ....tts.models.llama.llama import (
    ModelConfig as LlamaConfig,
    decode_step,
    init_caches,
    init_llama,
    llama_forward,
    logits_from_hidden,
)
from ..whisper.audio import N_FRAMES, SAMPLE_RATE, log_mel_spectrogram

Array = jax.Array

PROMPT_BUCKETS = (512, 1024, 2048, 4096)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@dataclass
class AudioConfig(BaseModelArgs):
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    num_mel_bins: int = 128
    max_source_positions: int = 1500
    intermediate_size: int = 5120


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "voxtral"
    audio_config: Optional[AudioConfig] = None
    text_config: Optional[dict] = None
    audio_token_id: int = 24
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.audio_config, dict):
            self.audio_config = AudioConfig.from_dict(self.audio_config)
        if self.audio_config is None:
            self.audio_config = AudioConfig()
        self.text = LlamaConfig.from_dict(self.text_config or {})


# ------------------------------------------------------------ audio tower

def init_audio_tower(key, a: AudioConfig) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * a.encoder_layers))
    d = a.d_model
    layers = {}
    for i in range(a.encoder_layers):
        layers[str(i)] = {
            "self_attn_layer_norm": init_layer_norm(d),
            "self_attn": {
                "q_proj": init_linear(next(ks), d, d),
                "k_proj": init_linear(next(ks), d, d, bias=False),
                "v_proj": init_linear(next(ks), d, d),
                "out_proj": init_linear(next(ks), d, d)},
            "final_layer_norm": init_layer_norm(d),
            "fc1": init_linear(next(ks), d, a.encoder_ffn_dim),
            "fc2": init_linear(next(ks), a.encoder_ffn_dim, d),
        }
    return {"conv1": init_conv1d(next(ks), a.num_mel_bins, d, 3),
            "conv2": init_conv1d(next(ks), d, d, 3),
            "embed_positions": init_embedding(
                next(ks), a.max_source_positions, d),
            "layers": layers,
            "layer_norm": init_layer_norm(d)}


def audio_tower_forward(p: dict, a: AudioConfig, mel: Array) -> Array:
    """mel (B, 3000, n_mels) -> (B, 1500, d_model)."""
    x = jax.nn.gelu(apply_conv1d(p["conv1"], mel, padding=1),
                    approximate=False)
    x = jax.nn.gelu(apply_conv1d(p["conv2"], x, stride=2, padding=1),
                    approximate=False)
    x = x + p["embed_positions"]["weight"][None, : x.shape[1]]
    b, t, d = x.shape
    h = a.encoder_attention_heads
    for i in range(a.encoder_layers):
        lp = p["layers"][str(i)]
        hn = apply_layer_norm(lp["self_attn_layer_norm"], x)
        sa = lp["self_attn"]
        q = apply_linear(sa["q_proj"], hn).reshape(b, t, h, d // h)
        k = apply_linear(sa["k_proj"], hn).reshape(b, t, h, d // h)
        v = apply_linear(sa["v_proj"], hn).reshape(b, t, h, d // h)
        o = attention(q, k, v).reshape(b, t, d)
        x = x + apply_linear(sa["out_proj"], o)
        hn = apply_layer_norm(lp["final_layer_norm"], x)
        x = x + apply_linear(lp["fc2"], jax.nn.gelu(
            apply_linear(lp["fc1"], hn), approximate=False))
    return apply_layer_norm(p["layer_norm"], x)


# --------------------------------------------------------------- tokenizer

class TekkenEncoder:
    """tekken.json tokenizer with decode + greedy byte-level encode and the
    named special tokens the transcription prompt needs."""

    def __init__(self, tekken_path: str):
        import base64
        import json

        data = json.loads(Path(tekken_path).read_text(encoding="utf-8"))
        self.n_special = int(data.get("config", {}).get(
            "default_num_special_tokens", 1000))
        self.vocab_bytes = [base64.b64decode(v["token_bytes"])
                            for v in data["vocab"]]
        self.byte2id = {}
        for i, b in enumerate(self.vocab_bytes):
            self.byte2id.setdefault(b, i)
        self.special = {}
        for st in data.get("special_tokens", []):
            if "rank" in st and ("token_str" in st or "name" in st):
                self.special[st.get("token_str") or st.get("name")] = \
                    int(st["rank"])
        self.eos_ids = {r for n, r in self.special.items()
                        if n and ("</s>" in n or "eos" in n.lower())}

    def special_id(self, name: str) -> Optional[int]:
        for k, v in self.special.items():
            if k == name or (k and name in k):
                return v
        return None

    def encode_text(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        ids, i = [], 0
        max_len = 16
        while i < len(data):
            for ln in range(min(max_len, len(data) - i), 0, -1):
                tid = self.byte2id.get(data[i:i + ln])
                if tid is not None:
                    ids.append(tid + self.n_special)
                    i += ln
                    break
            else:
                i += 1
        return ids

    def decode(self, token_ids) -> str:
        out = bytearray()
        for tid in token_ids:
            tid = int(tid)
            if tid < self.n_special:
                continue
            vid = tid - self.n_special
            if 0 <= vid < len(self.vocab_bytes):
                out += self.vocab_bytes[vid]
        return out.decode("utf-8", errors="replace")


# -------------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._processor = None     # transformers AutoProcessor when available
        self._tekken: Optional[TekkenEncoder] = None

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE

    def init_params(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        cfg = self.config
        t = cfg.text
        return {
            "audio_tower": init_audio_tower(k1, cfg.audio_config),
            "multi_modal_projector": {
                "linear_1": init_linear(k2, cfg.audio_config.intermediate_size,
                                        t.hidden_size, bias=False),
                "linear_2": init_linear(k3, t.hidden_size, t.hidden_size,
                                        bias=False)},
            "language_model": init_llama(k4, t),
        }

    # ----------------------------------------------------------- encoding

    def get_audio_embeds(self, audio: np.ndarray) -> Array:
        """waveform -> (n_tokens, lm_hidden): 30-s whisper-mel chunks
        through the tower, 4 encoder frames grouped per LM token."""
        a = self.config.audio_config
        wav = np.asarray(audio, np.float32).reshape(-1)
        n_chunk = N_FRAMES * 160
        chunks = [wav[i:i + n_chunk] for i in range(0, max(len(wav), 1),
                                                    n_chunk)]
        fn = self._jit_cache.get("tower")
        if fn is None:
            fn = jax.jit(lambda p, m: audio_tower_forward(
                p["audio_tower"], a, m))
            self._jit_cache["tower"] = fn
        embeds = []
        for c in chunks:
            mel = np.zeros((N_FRAMES, a.num_mel_bins), np.float32)
            m = np.asarray(log_mel_spectrogram(c, n_mels=a.num_mel_bins))
            mel[: m.shape[0]] = m[:N_FRAMES]
            enc = fn(self.params, jnp.asarray(mel[None]))     # (1, 1500, d)
            grouped = enc.reshape(-1, a.intermediate_size)
            mm = self.params["multi_modal_projector"]
            h = apply_linear(mm["linear_1"], grouped)
            h = apply_linear(mm["linear_2"],
                             jax.nn.gelu(h, approximate=False))
            embeds.append(h)
        return jnp.concatenate(embeds, axis=0)

    def _build_prompt_ids(self, n_audio_tokens: int, language: str
                          ) -> List[int]:
        """Transcription-request token ids (mistral_common layout):
        <s>[INST][BEGIN_AUDIO][AUDIO]*n lang:xx[TRANSCRIBE][/INST]."""
        tk = self._tekken
        if tk is None:
            raise RuntimeError("tekken.json tokenizer not loaded")

        def sid(name, default):
            v = tk.special_id(name)
            return v if v is not None else default

        bos = sid("<s>", 1)
        inst = sid("[INST]", 3)
        inst_end = sid("[/INST]", 4)
        begin_audio = sid("[BEGIN_AUDIO]", 12)
        audio = sid("[AUDIO]", self.config.audio_token_id)
        transcribe = sid("[TRANSCRIBE]", 34)
        ids = [bos, inst, begin_audio] + [audio] * n_audio_tokens
        ids += tk.encode_text(f"lang:{language}")
        ids += [transcribe, inst_end]
        self._audio_id = audio
        return ids

    # ------------------------------------------------------------- decode

    def _lm_fns(self, pb: int, max_tokens: int, eos_ids: Tuple[int, ...],
                temperature: float = 0.0, top_k: int = 0,
                top_p: float = 1.0, min_p: float = 0.0):
        key_ = ("lm", pb, max_tokens, eos_ids, temperature, top_k, top_p,
                min_p)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        from ....ops.sampling import make_sampler

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

            def cond(st):
                i, _, _, _, _, done = st
                return jnp.logical_and(i < max_tokens,
                                       jnp.logical_not(done))

            def body(st):
                i, lg, caches, toks, rng, done = st
                if temperature <= 0.0:
                    tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)[0]
                else:
                    rng, sub = jax.random.split(rng)
                    tok = sampler(sub, lg.astype(jnp.float32))[0]
                is_eos = jnp.any(tok == eos)
                toks = jnp.where(is_eos, toks, toks.at[i].set(tok))
                lg2, caches = decode_step(p["language_model"], t,
                                          tok[None, None], caches,
                                          plen + i)
                return (i + 1, lg2, caches, toks, rng,
                        jnp.logical_or(done, is_eos))

            _, _, _, toks, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), lg, caches, toks0, rng,
                             jnp.bool_(False)))
            return toks

        fns = (jax.jit(prefill), jax.jit(decode))
        self._jit_cache[key_] = fns
        return fns

    def generate(self, audio, *, language: str = "en",
                 max_tokens: int = 128, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0, min_p: float = 0.0,
                 seed: int = 0, verbose: bool = False,
                 **kwargs) -> STTOutput:
        t0 = time.time()
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio

            audio = np.asarray(load_audio(str(audio), SAMPLE_RATE))
        audio_embeds = self.get_audio_embeds(audio)
        ids = self._build_prompt_ids(audio_embeds.shape[0], language)
        n = len(ids)
        pb = _bucket(n, PROMPT_BUCKETS)
        tok_ids = np.zeros((1, pb), np.int32)
        tok_ids[0, :n] = ids
        embeds = np.array(apply_embedding(
            self.params["language_model"]["model"]["embed_tokens"],
            jnp.asarray(tok_ids)))
        pos = np.where(tok_ids[0, :n] == self._audio_id)[0]
        m = min(len(pos), audio_embeds.shape[0])
        embeds[0, pos[:m]] = np.asarray(audio_embeds)[:m]

        eos = tuple(sorted(self._tekken.eos_ids)) or (2,)
        prefill, decode = self._lm_fns(
            pb, max_tokens, eos, temperature=float(temperature),
            top_k=int(top_k), top_p=float(top_p), min_p=float(min_p))
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.int32(n))
        toks = np.asarray(decode(self.params, lg, caches, jnp.int32(n),
                                 jax.random.PRNGKey(seed)))
        generated = [int(x) for x in toks[toks >= 0]]
        text = self._tekken.decode(generated)
        dt = time.time() - t0
        if verbose:
            print(text)
        return STTOutput(
            text=text, language=language,
            segments=[{"text": text, "start": 0.0,
                       "end": len(np.asarray(audio).reshape(-1))
                       / SAMPLE_RATE}],
            prompt_tokens=n, generation_tokens=len(generated),
            total_tokens=n + len(generated), total_time=dt,
            prompt_tps=n / dt if dt else 0.0,
            generation_tps=len(generated) / dt if dt else 0.0)

    __call__ = generate

    # ------------------------------------------------------------ loading

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if "conv" in k and k.endswith("weight") and v.ndim == 3:
                # torch (O, I, K) -> WIO
                if v.shape[0] > v.shape[-1]:
                    v = jnp.transpose(v, (2, 1, 0))
            if k.endswith("rotary_emb.inv_freq"):
                continue
            out[k] = v
        return out

    def model_quant_predicate(self, path, w):
        return not path.startswith("audio_tower")

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        model_path = Path(model_path)
        tekken = model_path / "tekken.json"
        if tekken.exists():
            model._tekken = TekkenEncoder(str(tekken))
        return model


__all__ = ["Model", "ModelConfig", "AudioConfig", "TekkenEncoder",
           "audio_tower_forward", "init_audio_tower"]
