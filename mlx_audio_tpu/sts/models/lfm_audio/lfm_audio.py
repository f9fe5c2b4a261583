"""LFM2.5-Audio: omni-modal audio LM (TTS / ASR / speech-to-speech).

Parity: /root/reference/mlx_audio/sts/models/lfm_audio/model.py —
LFM2AudioModel (:217) = FastConformer audio encoder + MLP adapter +
LFM2 hybrid backbone + shared offset audio-in embedding (:77) +
depth-transformer audio head sampling 8 mimi codebooks sequentially
(:684-764), with `generate_interleaved` (:766, fixed n_text/n_audio
alternation, <|text_end|>/audio-EOS protocol) and `generate_sequential`
(:905, model-driven switching on <|audio_start|>).

TPU design: four jitted programs drive generation — bucketed prefill,
one-token LFM step, text sampling (tied head + top-k), and the audio
frame sampler (a `lax.scan` over the 8 codebooks with a fixed 8-slot KV
cache and stacked per-codebook embedding tables) — so the host loop only
does modality switching and EOS checks. The reference re-runs eager
per-codebook Python loops each frame.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_layer_norm,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_layer_norm,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs
from ....ops.sampling import top_k_top_p_filter
from ....stt.models.parakeet.conformer import (
    ConformerArgs,
    conformer_forward,
    init_conformer,
)
from .lfm2 import (
    LFM2Config,
    apply_swiglu,
    init_lfm2,
    init_swiglu,
    lfm2_embed,
    lfm2_forward,
    lfm2_logits,
    make_lfm2_caches,
)
from .processor import LFMModality, PreprocessorConfig

Array = jax.Array

# Special token IDs (reference model.py:37-41)
AUDIO_START_TOKEN = 128  # <|audio_start|>
IM_END_TOKEN = 7         # <|im_end|>
TEXT_END_TOKEN = 130     # <|text_end|>
AUDIO_EOS_TOKEN = 2048


@dataclass
class GenerationConfig:
    max_new_tokens: int = 512
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 1.0
    audio_temperature: float = 1.0
    audio_top_k: int = 4


@dataclass
class DepthformerConfig(BaseModelArgs):
    layers: int = 6
    dim: int = 1024
    num_heads: int = 32
    num_kv_heads: int = 8
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    tie: bool = True

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def ff_dim(self) -> int:
        # dim*4 SwiGLU with 2/3 shrink rounded to 256 (ref transformer.py:74)
        ff = int(2 * (self.dim * 4) / 3)
        return 256 * ((ff + 255) // 256)


@dataclass
class LFM2AudioConfig(BaseModelArgs):
    model_type: str = "lfm_audio"
    sample_rate: int = 24000
    codebooks: int = 8
    tie_audio_embeddings: bool = False
    audio_vocab_size: int = 2049  # 2048 + audio EOS
    interleaved_n_text: int = 6
    interleaved_n_audio: int = 12
    preprocessor: dict = field(default_factory=dict)
    encoder: dict = field(default_factory=dict)
    lfm: dict = field(default_factory=dict)
    depthformer: dict = field(default_factory=dict)
    adapter_hidden_dims: List[int] = field(default_factory=lambda: [2048])
    adapter_use_layer_norm: bool = True
    max_decode_len: int = 4096
    model_path: str = ""

    def __post_init__(self):
        self.preprocessor_config = PreprocessorConfig.from_dict(
            self.preprocessor or {})
        enc = {k: v for k, v in (self.encoder or {}).items()
               if k in ConformerArgs.__dataclass_fields__}
        enc.setdefault("feat_in", 128)
        enc.setdefault("n_layers", 17)
        enc.setdefault("d_model", 512)
        enc.setdefault("n_heads", 8)
        enc.setdefault("subsampling_factor", 8)
        enc.setdefault("subsampling_conv_channels", 256)
        enc.setdefault("conv_kernel_size", 9)
        self.encoder_args = ConformerArgs(**enc)
        self.lfm_config = LFM2Config.from_dict(self.lfm or {})
        self.depthformer_config = DepthformerConfig.from_dict(
            self.depthformer or {})


# ------------------------------------------------------------ depthformer

def _init_depth_block(ks, d: DepthformerConfig) -> dict:
    hd = d.head_dim
    return {
        "attn_norm": init_rms_norm(d.dim),
        "attn": {
            "q_proj": init_linear(next(ks), d.dim, d.num_heads * hd,
                                  bias=False),
            "k_proj": init_linear(next(ks), d.dim, d.num_kv_heads * hd,
                                  bias=False),
            "v_proj": init_linear(next(ks), d.dim, d.num_kv_heads * hd,
                                  bias=False),
            "o_proj": init_linear(next(ks), d.num_heads * hd, d.dim,
                                  bias=False),
            "q_norm": init_rms_norm(hd),
            "k_norm": init_rms_norm(hd),
        },
        "ffn_norm": init_rms_norm(d.dim),
        "ffn": init_swiglu(ks, d.dim, d.ff_dim),
    }


def _depth_block_step(p, d: DepthformerConfig, x: Array, cache: KVCache,
                      offset: Array) -> Tuple[Array, KVCache]:
    """One position (B, 1, dim) through a depthformer block."""
    b = x.shape[0]
    h, kvh, hd = d.num_heads, d.num_kv_heads, d.head_dim
    xn = apply_rms_norm(p["attn_norm"], x, eps=d.norm_eps)
    q = apply_linear(p["attn"]["q_proj"], xn).reshape(b, 1, h, hd)
    k = apply_linear(p["attn"]["k_proj"], xn).reshape(b, 1, kvh, hd)
    v = apply_linear(p["attn"]["v_proj"], xn).reshape(b, 1, kvh, hd)
    q = apply_rms_norm(p["attn"]["q_norm"], q, eps=d.norm_eps)
    k = apply_rms_norm(p["attn"]["k_norm"], k, eps=d.norm_eps)
    inv = rope_freqs(hd, d.rope_theta)
    pos = jnp.broadcast_to(offset, (b, 1))
    # interleaved-pairs rotation (reference transformer.py:25-60)
    q = apply_rope(q, pos, inv, interleaved=True)
    k = apply_rope(k, pos, inv, interleaved=True)
    cache = kv_update(cache, k, v, offset)
    ok = jnp.arange(cache.k.shape[1])[None, None, None, :] <= offset
    out = attention(q, cache.k, cache.v,
                    mask=jnp.where(ok, 0.0, -jnp.inf))
    x = x + apply_linear(p["attn"]["o_proj"], out.reshape(b, 1, h * hd))
    x = x + apply_swiglu(p["ffn"],
                         apply_rms_norm(p["ffn_norm"], x, eps=d.norm_eps))
    return x, cache


def sample_audio_frame(params: dict, c: LFM2AudioConfig, hidden: Array,
                       key: Array, temperature: float,
                       top_k: int) -> Array:
    """hidden (B, 1, D) -> codes (B, codebooks), sequential conditioning
    over the codebooks via a lax.scan (reference _sample_audio_frame
    :684-764 runs the same loop eagerly)."""
    d = c.depthformer_config
    b = hidden.shape[0]
    din = apply_linear(params["depth_linear"], hidden)[:, 0]
    din = din.reshape(b, c.codebooks, d.dim)
    emb_w = params["depth_embeddings"]["embedding"]      # (K, V, dim)
    logit_w = params["depth_embeddings"]["to_logits"]    # (K, V, dim)
    caches = [KVCache.init(b, c.codebooks, d.num_kv_heads, d.head_dim,
                           hidden.dtype)
              for _ in range(d.layers)]
    greedy = temperature is None or temperature <= 0 or top_k == 1

    def step(carry, i):
        prev, caches, key = carry
        x = (jnp.take(din, i, axis=1) + prev)[:, None]  # (B, 1, dim)
        new_caches = []
        for li in range(d.layers):
            x, nc = _depth_block_step(
                params["audio_head"]["blocks"][str(li)], d, x,
                caches[li], i)
            new_caches.append(nc)
        logits = x[:, 0] @ jnp.take(logit_w, i, axis=0).T  # (B, V)
        if greedy:
            code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            key, kk = jax.random.split(key)
            filt = top_k_top_p_filter(logits / temperature, top_k=top_k)
            code = jax.random.categorical(kk, filt).astype(jnp.int32)
        prev = jnp.take(emb_w, i, axis=0)[code]  # raw embed (ref :760)
        return (prev, new_caches, key), code

    init = (jnp.zeros((b, d.dim), hidden.dtype), caches, key)
    _, codes = jax.lax.scan(step, init, jnp.arange(c.codebooks))
    return codes.T  # (B, codebooks)


def embed_audio_codes(params: dict, c: LFM2AudioConfig,
                      codes: Array) -> Array:
    """codes (B, T, K) or (B, K) -> summed shared-table embeddings
    (reference AudioEmbedding :110-135)."""
    squeeze = codes.ndim == 2
    if squeeze:
        codes = codes[:, None]
    offs = jnp.arange(c.codebooks) * c.audio_vocab_size
    emb = params["audio_embedding"]["embedding"]["weight"][
        codes + offs[None, None]]
    out = emb.sum(axis=2)  # (B, T, D)
    return out[:, 0] if squeeze else out


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """LFM2.5-Audio (reference LFM2AudioModel :217)."""

    def __init__(self, config: Optional[LFM2AudioConfig] = None, **kwargs):
        if config is None:
            config = LFM2AudioConfig.from_dict(kwargs) if kwargs else \
                LFM2AudioConfig()
        elif isinstance(config, dict):
            config = LFM2AudioConfig.from_dict(config)
        super().__init__(config)
        self._processor = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def processor(self):
        if self._processor is None:
            from .processor import LFM2AudioProcessor

            self._processor = LFM2AudioProcessor.from_pretrained(
                self.config.model_path, config=self.config)
        return self._processor

    # -------------------------------------------------------------- init

    def init_params(self, key):
        c = self.config
        lfm, d = c.lfm_config, c.depthformer_config
        ks = iter(jax.random.split(key, 16 * d.layers + 64))
        adapter: Dict[str, Any] = {}
        if c.adapter_use_layer_norm:
            adapter["norm"] = init_layer_norm(c.encoder_args.d_model)
        dims = ([c.encoder_args.d_model] + list(c.adapter_hidden_dims)
                + [lfm.hidden_size])
        for i in range(len(dims) - 1):
            adapter[f"fc{i + 1}"] = init_linear(next(ks), dims[i],
                                                dims[i + 1])
        total_av = c.audio_vocab_size * c.codebooks
        return {
            "audio_encoder": init_conformer(next(ks), c.encoder_args),
            "audio_adapter": adapter,
            "lfm": init_lfm2(next(ks), lfm),
            "audio_embedding": {
                "embedding": init_embedding(next(ks), total_av,
                                            lfm.hidden_size),
                "embedding_norm": init_rms_norm(lfm.hidden_size),
                "to_logits": init_linear(next(ks), lfm.hidden_size,
                                         total_av, bias=False),
            },
            "depth_linear": init_linear(next(ks), lfm.hidden_size,
                                        c.codebooks * d.dim),
            "depth_embeddings": {
                "embedding": 0.02 * jax.random.normal(
                    next(ks), (c.codebooks, c.audio_vocab_size, d.dim)),
                "embedding_norm": jnp.ones(
                    (c.codebooks, d.dim)),
                "to_logits": 0.02 * jax.random.normal(
                    next(ks), (c.codebooks, c.audio_vocab_size, d.dim)),
            },
            "audio_head": {"blocks": {
                str(i): _init_depth_block(ks, d) for i in range(d.layers)}},
        }

    # ---------------------------------------------------------- embedding

    def _embed_text(self, tokens: Array) -> Array:
        return lfm2_embed(self.params["lfm"], tokens)

    def _embed_audio_codes(self, codes: Array) -> Array:
        return embed_audio_codes(self.params, self.config,
                                 jnp.asarray(codes))

    def encode_audio(self, mel: Array) -> Array:
        """mel (B, T, feat) -> adapted LFM-space embeddings (B, T', D)."""
        fn = self._jit_cache.get(("enc", mel.shape[1]))
        if fn is None:
            c = self.config

            def run(p, m):
                enc = conformer_forward(p["audio_encoder"], c.encoder_args,
                                        m)
                a = p["audio_adapter"]
                h = enc
                if "norm" in a:
                    h = apply_layer_norm(a["norm"], h)
                n_fc = len([k for k in a if k.startswith("fc")])
                for i in range(n_fc):
                    h = apply_linear(a[f"fc{i + 1}"], h)
                    if i != n_fc - 1:
                        h = jax.nn.gelu(h)
                return h

            fn = jax.jit(run)
            self._jit_cache[("enc", mel.shape[1])] = fn
        return fn(self.params, jnp.asarray(mel))

    def _build_embeddings(self, text_tokens, audio_features, audio_codes,
                          modalities) -> np.ndarray:
        """Interleave per-modality embeddings by flag
        (reference _build_interleaved_embeddings :569-657)."""
        d = self.config.lfm_config.hidden_size
        parts = []
        if modalities is None:
            if text_tokens is not None:
                parts.append(np.asarray(
                    self._embed_text(jnp.asarray(text_tokens))))
            if audio_features is not None:
                parts.append(np.asarray(
                    self.encode_audio(jnp.asarray(audio_features))))
            if audio_codes is not None:
                parts.append(np.asarray(self._embed_audio_codes(
                    jnp.asarray(audio_codes))))
            return np.concatenate(parts, axis=1)
        mods = np.asarray(modalities)[0]
        b = 1
        out = np.zeros((b, len(mods), d), np.float32)
        if text_tokens is not None:
            te = np.asarray(self._embed_text(jnp.asarray(text_tokens)))
            pos = np.nonzero(mods == int(LFMModality.TEXT))[0]
            n = min(len(pos), te.shape[1])
            out[:, pos[:n]] = te[:, :n]
        if audio_features is not None:
            ae = np.asarray(self.encode_audio(jnp.asarray(audio_features)))
            pos = np.nonzero(mods == int(LFMModality.AUDIO_IN))[0]
            n = min(len(pos), ae.shape[1])
            out[:, pos[:n]] = ae[:, :n]
        if audio_codes is not None:
            ce = np.asarray(self._embed_audio_codes(
                jnp.asarray(audio_codes)))
            pos = np.nonzero(mods == int(LFMModality.AUDIO_OUT))[0]
            n = min(len(pos), ce.shape[1])
            out[:, pos[:n]] = ce[:, :n]
        return out

    # ------------------------------------------------------------ jit fns

    def _prefill_fn(self, t_pad: int):
        key = ("prefill", t_pad)
        fn = self._jit_cache.get(key)
        if fn is None:
            lfm = self.config.lfm_config

            def run(p, emb, caches, length):
                hidden, caches = lfm2_forward(p["lfm"], lfm, emb, caches,
                                              jnp.int32(0), length)
                last = jax.lax.dynamic_slice(
                    hidden, (0, length - 1, 0),
                    (hidden.shape[0], 1, hidden.shape[2]))
                return last, caches

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    def _step_fn(self, kind: str):
        key = ("step", kind)
        fn = self._jit_cache.get(key)
        if fn is None:
            lfm = self.config.lfm_config

            if kind == "text":
                def run(p, token, caches, offset):
                    emb = lfm2_embed(p["lfm"], token)
                    return lfm2_forward(p["lfm"], lfm, emb, caches, offset)
            else:
                c = self.config

                def run(p, frame, caches, offset):
                    emb = embed_audio_codes(p, c, frame)[:, None]
                    return lfm2_forward(p["lfm"], lfm, emb, caches, offset)

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    def _sample_text_fn(self, temperature: float, top_k: int):
        key = ("sample_text", temperature, top_k)
        fn = self._jit_cache.get(key)
        if fn is None:
            def run(p, hidden, k):
                logits = lfm2_logits(p["lfm"], hidden[:, -1])
                if temperature <= 0:
                    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
                filt = top_k_top_p_filter(logits / temperature,
                                          top_k=top_k)
                return jax.random.categorical(k, filt).astype(jnp.int32)

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    def _sample_frame_fn(self, temperature: float, top_k: int):
        key = ("sample_frame", temperature, top_k)
        fn = self._jit_cache.get(key)
        if fn is None:
            c = self.config
            fn = jax.jit(lambda p, h, k: sample_audio_frame(
                p, c, h, k, temperature, top_k))
            self._jit_cache[key] = fn
        return fn

    # ----------------------------------------------------------- prefill

    def _prefill(self, text_tokens=None, audio_features=None,
                 audio_codes=None, modalities=None, max_len: int = 0):
        emb = self._build_embeddings(text_tokens, audio_features,
                                     audio_codes, modalities)
        b, t, d = emb.shape
        cap = max(self.config.max_decode_len, t + 64, max_len)
        caches = make_lfm2_caches(self.config.lfm_config, b, cap)
        t_pad = max(64, 1 << (t - 1).bit_length())
        emb_p = np.zeros((b, t_pad, d), np.float32)
        emb_p[:, :t] = emb
        hidden, caches = self._prefill_fn(t_pad)(
            self.params, jnp.asarray(emb_p), caches, jnp.int32(t))
        return hidden, caches, t

    # -------------------------------------------------------- generation

    def generate_interleaved(
        self, text_tokens=None, audio_features=None, audio_codes=None,
        modalities=None, max_new_tokens: int = 512,
        temperature: float = 1.0, top_k: int = 50,
        audio_temperature: float = 1.0, audio_top_k: int = 4,
        interleaved_n_text: Optional[int] = None,
        interleaved_n_audio: Optional[int] = None, seed: int = 0,
    ) -> Generator[Tuple[np.ndarray, LFMModality], None, None]:
        """Fixed text/audio alternation (reference :766-903)."""
        c = self.config
        n_text = interleaved_n_text or c.interleaved_n_text
        n_audio = interleaved_n_audio or c.interleaved_n_audio
        hidden, caches, offset = self._prefill(
            text_tokens, audio_features, audio_codes, modalities,
            max_len=offset_cap(max_new_tokens))
        key = jax.random.PRNGKey(seed)
        step_text = self._step_fn("text")
        step_audio = self._step_fn("audio")
        sample_text = self._sample_text_fn(temperature, top_k)
        sample_frame = self._sample_frame_fn(audio_temperature, audio_top_k)

        generated = 0
        modality_left = n_text
        text_done = False
        modality = LFMModality.TEXT
        while generated < max_new_tokens:
            if modality == LFMModality.TEXT:
                key, k0 = jax.random.split(key)
                token = sample_text(self.params, hidden, k0)
                tid = int(token[0])
                if tid == IM_END_TOKEN:
                    break
                yield np.asarray(token), LFMModality.TEXT
                if tid == TEXT_END_TOKEN:
                    text_done = True
                hidden, caches = step_text(self.params, token[:, None],
                                           caches, jnp.int32(offset))
                offset += 1
                generated += 1
                modality_left -= 1
                if modality_left <= 0 or text_done:
                    modality_left = n_audio
                    modality = LFMModality.AUDIO_OUT
            else:
                key, k0 = jax.random.split(key)
                frame = sample_frame(self.params, hidden, k0)
                if int(frame[0, 0]) == AUDIO_EOS_TOKEN:
                    frame = jnp.full_like(frame, AUDIO_EOS_TOKEN)
                    yield np.asarray(frame[0]), LFMModality.AUDIO_OUT
                    # feed EOS back before resuming text (reference :869)
                    hidden, caches = step_audio(self.params, frame, caches,
                                                jnp.int32(offset))
                    offset += 1
                    generated += 1
                    if text_done:
                        break
                    modality_left = n_text
                    modality = LFMModality.TEXT
                    continue
                yield np.asarray(frame[0]), LFMModality.AUDIO_OUT
                hidden, caches = step_audio(self.params, frame, caches,
                                            jnp.int32(offset))
                offset += 1
                generated += 1
                modality_left -= 1
                if modality_left <= 0 and not text_done:
                    modality_left = n_text
                    modality = LFMModality.TEXT

    def generate_sequential(
        self, text_tokens=None, audio_features=None, audio_codes=None,
        modalities=None, max_new_tokens: int = 512,
        temperature: float = 1.0, top_k: int = 50,
        audio_temperature: float = 1.0, audio_top_k: int = 4,
        seed: int = 0,
    ) -> Generator[Tuple[np.ndarray, LFMModality], None, None]:
        """Model-driven switching on <|audio_start|> (reference :905)."""
        hidden, caches, offset = self._prefill(
            text_tokens, audio_features, audio_codes, modalities,
            max_len=offset_cap(max_new_tokens))
        key = jax.random.PRNGKey(seed)
        step_text = self._step_fn("text")
        step_audio = self._step_fn("audio")
        sample_text = self._sample_text_fn(temperature, top_k)
        sample_frame = self._sample_frame_fn(audio_temperature, audio_top_k)

        modality = LFMModality.TEXT
        if text_tokens is not None and \
                int(np.asarray(text_tokens)[0, -1]) == AUDIO_START_TOKEN:
            modality = LFMModality.AUDIO_OUT
        for _ in range(max_new_tokens):
            if modality == LFMModality.TEXT:
                key, k0 = jax.random.split(key)
                token = sample_text(self.params, hidden, k0)
                tid = int(token[0])
                if tid == IM_END_TOKEN:
                    yield np.asarray(token), LFMModality.TEXT
                    break
                if tid == AUDIO_START_TOKEN:
                    modality = LFMModality.AUDIO_OUT
                    hidden, caches = step_text(self.params, token[:, None],
                                               caches, jnp.int32(offset))
                    offset += 1
                    continue
                yield np.asarray(token), LFMModality.TEXT
                hidden, caches = step_text(self.params, token[:, None],
                                           caches, jnp.int32(offset))
                offset += 1
            else:
                key, k0 = jax.random.split(key)
                frame = sample_frame(self.params, hidden, k0)
                if int(frame[0, 0]) == AUDIO_EOS_TOKEN:
                    frame = jnp.full_like(frame, AUDIO_EOS_TOKEN)
                    modality = LFMModality.TEXT
                yield np.asarray(frame[0]), LFMModality.AUDIO_OUT
                hidden, caches = step_audio(self.params, frame, caches,
                                            jnp.int32(offset))
                offset += 1

    def generate_from_chat_state(self, chat_state, mode: str = "interleaved",
                                 **kwargs):
        gen = (self.generate_interleaved if mode == "interleaved"
               else self.generate_sequential)
        yield from gen(text_tokens=chat_state.get_text_tokens(),
                       audio_features=chat_state.get_audio_features(),
                       modalities=chat_state.get_modalities(), **kwargs)

    # -------------------------------------------------- high-level surface

    def generate(self, text: Optional[str] = None, audio=None,
                 sample_rate: int = 24000, system_prompt: Optional[str]
                 = None, max_new_tokens: int = 512,
                 temperature: float = 0.7, top_k: int = 50,
                 audio_temperature: float = 0.8, audio_top_k: int = 4,
                 mode: str = "interleaved", seed: int = 0, **kwargs):
        """Chat-driven generate: text and/or audio in, text + audio out.

        Requires the model_path to carry a text tokenizer (the STS CLI /
        server path); lower-level `generate_interleaved` works without.
        """
        from .processor import ChatState

        t0 = time.perf_counter()
        proc = self.processor
        chat = ChatState(proc)
        if system_prompt:
            chat.new_turn("system")
            chat.add_text(system_prompt)
            chat.end_turn()
        chat.new_turn("user")
        if audio is not None:
            if isinstance(audio, str):
                from ....utils import load_audio

                audio = np.asarray(load_audio(
                    audio, proc.audio_preprocessor.config.sample_rate))
                sample_rate = proc.audio_preprocessor.config.sample_rate
            chat.add_audio(audio, sample_rate)
        if text:
            chat.add_text(text)
        chat.end_turn()
        chat.new_turn("assistant")

        text_out: List[int] = []
        audio_out: List[np.ndarray] = []
        for token, mod in self.generate_from_chat_state(
                chat, mode=mode, max_new_tokens=max_new_tokens,
                temperature=temperature, top_k=top_k,
                audio_temperature=audio_temperature,
                audio_top_k=audio_top_k, seed=seed):
            if mod == LFMModality.TEXT:
                text_out.append(int(np.asarray(token).reshape(-1)[0]))
            else:
                if int(np.asarray(token)[0]) == AUDIO_EOS_TOKEN:
                    continue
                audio_out.append(np.asarray(token))
        waveform = np.zeros(0, np.float32)
        if audio_out:
            codes = np.stack(audio_out, axis=1)[None]  # (1, K, T)
            waveform = np.asarray(proc.decode_with_detokenizer(codes))[0]
        dt = time.perf_counter() - t0

        from ....tts.models.base import GenerationResult, format_duration

        dur = len(waveform) / self.sample_rate
        return GenerationResult(
            audio=waveform, samples=len(waveform),
            sample_rate=self.sample_rate, segment_idx=0,
            token_count=len(text_out) + len(audio_out),
            audio_duration=format_duration(dur),
            real_time_factor=(dt / dur if dur else 0.0),
            prompt={"tokens": len(text_out),
                    "text": proc.decode_text(text_out) if text_out else "",
                    "tokens-per-sec": (len(text_out) / dt if dt else 0.0)},
            audio_samples={"samples": len(waveform),
                           "samples-per-sec": (len(waveform) / dt
                                               if dt else 0.0)},
            processing_time_seconds=dt, peak_memory_usage=0.0,
            is_final_chunk=True)

    # ------------------------------------------------------------ loading

    def sanitize(self, weights: Dict[str, jnp.ndarray]) -> Dict:
        c = self.config
        out: Dict[str, jnp.ndarray] = {}
        depth_tables: Dict[str, Dict[int, jnp.ndarray]] = {
            "embedding": {}, "embedding_norm": {}, "to_logits": {}}
        sub_map = {"conv.0.": "layers.00_conv.", "conv.2.": "layers.01_dw.",
                   "conv.3.": "layers.02_pw.", "conv.5.": "layers.03_dw.",
                   "conv.6.": "layers.04_pw."}
        skip = ("audio_loss_weights", "codebook_offsets",
                ".num_batches_tracked", "pos_enc.pe", ".freqs",
                "downsample.", "upsample.", "istft.window")
        for k, v in weights.items():
            if any(s in k for s in skip):
                continue
            v = jnp.asarray(v)
            if k.startswith("depth_embeddings."):
                parts = k.split(".")
                idx = int(parts[1])
                name = parts[2]
                depth_tables[name][idx] = v
                continue
            if k.startswith("conformer."):
                k = k.replace("conformer.", "audio_encoder.")
                if ".pre_encode." in k:
                    for old, new in sub_map.items():
                        k = k.replace("pre_encode." + old,
                                      "pre_encode." + new)
                if k.endswith("weight") and v.ndim == 4:
                    v = jnp.transpose(v, (2, 3, 1, 0))   # OIHW -> HWIO
                elif k.endswith("weight") and v.ndim == 3:
                    v = jnp.transpose(v, (2, 1, 0))      # OIK -> WIO
            elif k.startswith("audio_adapter.model."):
                parts = k.split(".")
                idx = int(parts[2])
                # Sequential: 0 = LayerNorm, then Linear/GELU pairs
                if c.adapter_use_layer_norm and idx == 0:
                    k = f"audio_adapter.norm.{parts[3]}"
                else:
                    base = 1 if c.adapter_use_layer_norm else 0
                    fc = (idx - base) // 2 + 1
                    k = f"audio_adapter.fc{fc}.{parts[3]}"
            elif k.startswith("lfm."):
                k = k.replace(".feed_forward.linear1.", ".feed_forward.w1.")
                k = k.replace(".feed_forward.linear2.", ".feed_forward.w2.")
                k = k.replace(".feed_forward.linear3.", ".feed_forward.w3.")
                if k.endswith("conv.conv.weight") and v.ndim == 3:
                    v = v[:, 0].T                         # (D,1,K) -> (K,D)
                    k = k.replace("conv.conv.weight", "conv.weight")
                elif k.endswith("conv.conv.bias"):
                    k = k.replace("conv.conv.bias", "conv.bias")
            elif k.startswith("depthformer.layers."):
                parts = k.split(".")
                li = parts[2]
                rest = ".".join(parts[3:])
                base = f"audio_head.blocks.{li}"
                if rest == "operator.qkv_proj.weight":
                    d = c.depthformer_config
                    q_dim = d.num_heads * d.head_dim
                    kv_dim = d.num_kv_heads * d.head_dim
                    out[f"{base}.attn.q_proj.weight"] = v[:q_dim]
                    out[f"{base}.attn.k_proj.weight"] = \
                        v[q_dim:q_dim + kv_dim]
                    out[f"{base}.attn.v_proj.weight"] = v[q_dim + kv_dim:]
                    continue
                mapping = {
                    "operator.out_proj.weight": "attn.o_proj.weight",
                    "operator.bounded_attention.q_layernorm.weight":
                        "attn.q_norm.weight",
                    "operator.bounded_attention.k_layernorm.weight":
                        "attn.k_norm.weight",
                }
                if rest in mapping:
                    k = f"{base}.{mapping[rest]}"
                elif rest.startswith("operator_norm."):
                    k = f"{base}.attn_norm.{rest.split('.', 1)[1]}"
                elif rest.startswith("feed_forward."):
                    k = f"{base}.ffn.{rest.split('.', 1)[1]}"
                elif rest.startswith("ffn_norm."):
                    k = f"{base}.{rest}"
                else:
                    k = f"{base}.{rest}"
            out[k] = v
        for name, table in depth_tables.items():
            if table:
                stacked = jnp.stack([table[i]
                                     for i in sorted(table)], axis=0)
                suffix = {"embedding": "embedding",
                          "embedding_norm": "embedding_norm",
                          "to_logits": "to_logits"}[name]
                out[f"depth_embeddings.{suffix}"] = stacked
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        from .processor import LFM2AudioProcessor

        try:
            model._processor = LFM2AudioProcessor.from_pretrained(
                str(model_path), config=model.config)
        except Exception:
            pass
        return model


def offset_cap(max_new_tokens: int) -> int:
    return max(256, 1 << (max_new_tokens + 64 - 1).bit_length())


LFM2AudioModel = Model
ModelConfig = LFM2AudioConfig

__all__ = ["Model", "LFM2AudioModel", "ModelConfig", "LFM2AudioConfig",
           "DepthformerConfig", "GenerationConfig", "LFMModality",
           "sample_audio_frame", "AUDIO_START_TOKEN", "IM_END_TOKEN",
           "TEXT_END_TOKEN", "AUDIO_EOS_TOKEN"]
