"""GLM-ASR: Whisper-RoPE encoder + merge adapter + llama decoder.

Parity: reference stt/models/glmasr/glmasr.py — pre-norm Whisper encoder
with conv1(k3,s1)+conv2(k3,s2) stem and either learned positions or partial
traditional RoPE over head_dim//2 dims (:139-257), post-encoder layer norm,
merge_factor frame stacking into the adapting MLP (fc1/gelu/fc2, HF keys
adapting.{0,2}, :266-346), prompt "<|user|>\\n<|begin_of_audio|>" +
placeholders + "<|end_of_audio|>\\nPlease transcribe this audio into
text<|assistant|>\\n" with audio embeddings spliced at the placeholder span
(:668-700), llama decoder with an EOS id set (config.py:63), slaney-mel
whisper features (:555-588), 30-s low-energy chunking, and the
adapting/model-prefix/conv sanitize (:471-507).

TPU design: the encoder is one jitted program per mel-length bucket with a
validity key-mask (the convs see identical zero padding in tight and padded
shapes, so bucketed == tight exactly); decode is the shared compiled
chunk-stepper (lax.scan, in-graph EOS-set masking) over fixed-capacity
caches via the shared llama backbone.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....dsp import log_mel_spectrogram
from ....model import FunctionalModel
from ....nn import (apply_embedding, apply_layer_norm, apply_linear,
                    init_conv1d, init_embedding, init_layer_norm,
                    init_linear)
from ....ops.attention import attention
from ....ops.kvcache import KVCache
from ....ops.rope import apply_rope_interleaved, rope_freqs
from ....ops.sampling import make_sampler
from ....tts.models.llama.llama import ModelConfig as LlamaBackboneConfig
from ....tts.models.llama.llama import (init_llama, llama_forward,
                                        logits_from_hidden)
from ...models.base import STTOutput
from ..qwen3_asr.qwen3_asr import (StreamingResult,
                                   split_audio_into_chunks)
from ....nn import apply_conv1d

Array = jax.Array

DEC_CHUNK = 32
MEL_BUCKETS = (128, 256, 512, 1024, 2048, 3072)
PROMPT_BUCKETS = (128, 256, 512, 1024, 2048)


@dataclass
class WhisperConfig(BaseModelArgs):
    model_type: str = "whisper"
    d_model: int = 1280
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    encoder_layers: int = 32
    num_mel_bins: int = 128
    max_source_positions: int = 1500
    scale_embedding: bool = False
    rope_traditional: bool = True


@dataclass
class LlamaConfig(BaseModelArgs):
    model_type: str = "llama"
    vocab_size: int = 59264
    hidden_size: int = 2048
    intermediate_size: int = 6144
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 4
    head_dim: Optional[int] = None
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    pad_token_id: int = 59260
    eos_token_id: List[int] = field(
        default_factory=lambda: [59246, 59253, 59255])


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "glmasr"
    whisper_config: Optional[Dict] = None
    lm_config: Optional[Dict] = None
    adapter_type: str = "mlp"
    merge_factor: int = 4
    use_rope: bool = True
    max_whisper_length: int = 1500
    sample_rate: int = 16000
    model_path: str = ""

    def __post_init__(self):
        if not isinstance(self.whisper_config, WhisperConfig):
            self.whisper_config = WhisperConfig.from_dict(
                self.whisper_config or {})
        if not isinstance(self.lm_config, LlamaConfig):
            self.lm_config = LlamaConfig.from_dict(self.lm_config or {})


def _backbone_cfg(c: LlamaConfig) -> LlamaBackboneConfig:
    return LlamaBackboneConfig(
        hidden_size=c.hidden_size, num_hidden_layers=c.num_hidden_layers,
        intermediate_size=c.intermediate_size,
        num_attention_heads=c.num_attention_heads,
        num_key_value_heads=c.num_key_value_heads,
        vocab_size=c.vocab_size, rms_norm_eps=c.rms_norm_eps,
        rope_theta=c.rope_theta, head_dim=c.head_dim,
        attention_bias=c.attention_bias,
        tie_word_embeddings=c.tie_word_embeddings)


# ------------------------------------------------------------------ init

def init_glmasr(key, cfg: ModelConfig) -> dict:
    w = cfg.whisper_config
    ks = iter(jax.random.split(key, 16 + 8 * w.encoder_layers))
    d = w.d_model
    layers = {}
    for i in range(w.encoder_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": init_linear(next(ks), d, d),
                "k_proj": init_linear(next(ks), d, d, bias=False),
                "v_proj": init_linear(next(ks), d, d),
                "out_proj": init_linear(next(ks), d, d)},
            "self_attn_layer_norm": init_layer_norm(d),
            "fc1": init_linear(next(ks), d, w.encoder_ffn_dim),
            "fc2": init_linear(next(ks), w.encoder_ffn_dim, d),
            "final_layer_norm": init_layer_norm(d)}
    lm_h = cfg.lm_config.hidden_size
    audio_encoder = {
        "whisper": {
            "conv1": init_conv1d(next(ks), w.num_mel_bins, d, 3),
            "conv2": init_conv1d(next(ks), d, d, 3),
            "embed_positions": init_embedding(
                next(ks), w.max_source_positions, d),
            "layers": layers},
        "layer_norm": init_layer_norm(d),
        "proj": init_linear(next(ks), d, lm_h),   # kept for weight parity
        "adapting": {
            "fc1": init_linear(next(ks), d * cfg.merge_factor, 2 * lm_h),
            "fc2": init_linear(next(ks), 2 * lm_h, lm_h)},
        "audio_bos_eos_token": init_embedding(next(ks), 2, lm_h)}
    lm = init_llama(next(ks), _backbone_cfg(cfg.lm_config), lm_head=True)
    return {"audio_encoder": audio_encoder, "language_model": lm}


# --------------------------------------------------------------- encoder

def encode_audio(p: dict, cfg: ModelConfig, mel: Array, n_valid: Array,
                 n_merged: int) -> Array:
    """(1, T_bucket, n_mels) -> (1, n_merged, lm_hidden) audio embeds."""
    w = cfg.whisper_config
    enc = p["whisper"]
    x = jax.nn.gelu(apply_conv1d(enc["conv1"], mel, padding=1),
                    approximate=False)
    x = jax.nn.gelu(apply_conv1d(enc["conv2"], x, stride=2, padding=1),
                    approximate=False)
    t = x.shape[1]
    enc_valid = (n_valid - 1) // 2 + 1
    if not cfg.use_rope:
        x = x + enc["embed_positions"]["weight"][None, :t]
    mask = jnp.where(jnp.arange(t)[None, None, None, :]
                     < enc_valid, 0.0, -jnp.inf)
    nh = w.encoder_attention_heads
    hd = w.d_model // nh
    inv_freq = rope_freqs(hd // 2, 10000.0) if cfg.use_rope else None
    positions = jnp.arange(t)[None]
    for i in range(w.encoder_layers):
        blk = p["whisper"]["layers"][str(i)]
        r = x
        h = apply_layer_norm(blk["self_attn_layer_norm"], x)
        a = blk["self_attn"]
        q = apply_linear(a["q_proj"], h).reshape(1, t, nh, hd)
        k = apply_linear(a["k_proj"], h).reshape(1, t, nh, hd)
        v = apply_linear(a["v_proj"], h).reshape(1, t, nh, hd)
        if cfg.use_rope:
            q = apply_rope_interleaved(q, positions, inv_freq)
            k = apply_rope_interleaved(k, positions, inv_freq)
        o = attention(q, k, v, mask=mask).reshape(1, t, -1)
        x = r + apply_linear(a["out_proj"], o)
        r = x
        h = apply_layer_norm(blk["final_layer_norm"], x)
        x = r + apply_linear(blk["fc2"],
                             jax.nn.gelu(apply_linear(blk["fc1"], h),
                                         approximate=False))
    x = apply_layer_norm(p["layer_norm"], x)
    mf = cfg.merge_factor
    merged = x[:, : n_merged * mf].reshape(1, n_merged, mf * x.shape[-1])
    h = jax.nn.gelu(apply_linear(p["adapting"]["fc1"], merged),
                    approximate=False)
    return apply_linear(p["adapting"]["fc2"], h)


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_glmasr(key, self.config)

    # ----------------------------------------------------------- encode

    def _mel(self, audio: np.ndarray) -> np.ndarray:
        """Whisper mel, slaney filterbank (reference :555-588)."""
        mel = log_mel_spectrogram(
            jnp.asarray(audio, jnp.float32), n_fft=400, hop_length=160,
            n_mels=self.config.whisper_config.num_mel_bins,
            sample_rate=16000, log_base="log10_whisper",
            mel_norm="slaney", mel_scale="slaney")
        return np.asarray(mel)[:-1]        # drop the trailing frame

    def encode(self, audio: np.ndarray) -> Tuple[np.ndarray, int]:
        """Audio -> (1, n_merged, lm_hidden) embeds + token count."""
        cfg = self.config
        mel = self._mel(audio)
        n = min(mel.shape[0], cfg.max_whisper_length * 2)
        b = next((x for x in MEL_BUCKETS if n <= x),
                 ((n + 511) // 512) * 512)
        padded = np.zeros((1, b, mel.shape[1]), np.float32)
        padded[0, :n] = mel[:n]
        enc_len = (n - 1) // 2 + 1
        mf = cfg.merge_factor
        n_merged = min((enc_len - mf) // mf + 1,
                       cfg.max_whisper_length // mf)
        key_ = ("enc", b, n_merged)
        fn = self._jit_cache.get(key_)
        if fn is None:
            fn = jax.jit(lambda p, m, v: encode_audio(
                p["audio_encoder"], cfg, m, v, n_merged))
            self._jit_cache[key_] = fn
        out = np.asarray(fn(self.params, jnp.asarray(padded),
                            jnp.int32(n)))
        return out, n_merged

    # -------------------------------------------------------- LM pieces

    def _lm_fns(self, bucket: int, max_tokens: int, sampling,
                eos_ids: Tuple[int, ...]):
        key_ = ("lm", bucket, max_tokens, tuple(sampling), eos_ids)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        bc = _backbone_cfg(self.config.lm_config)
        cap = bucket + max_tokens
        (temperature, top_k, top_p, min_p, repetition_penalty,
         repetition_context_size, min_tokens_to_keep) = sampling
        sampler = make_sampler(temperature=temperature, top_k=top_k,
                               top_p=top_p, min_p=min_p,
                               min_tokens_to_keep=min_tokens_to_keep,
                               repetition_penalty=repetition_penalty)
        use_rep = repetition_penalty != 1.0
        eos = jnp.asarray(eos_ids, jnp.int32)

        def prefill(p, embeds, length):
            caches = [KVCache.init(1, cap, bc.num_key_value_heads,
                                   bc.resolved_head_dim,
                                   dtype=jnp.float32)
                      for _ in range(bc.num_hidden_layers)]
            pad = jnp.where(jnp.arange(cap)[None, :] < length[:, None],
                            0.0, -jnp.inf)
            hidden, caches = llama_forward(
                p["language_model"], bc, embeds, caches=caches,
                offset=jnp.int32(0), mask=pad)
            logits = logits_from_hidden(p["language_model"], bc, hidden)
            last = jnp.take_along_axis(
                logits, (length - 1)[:, None, None]
                .repeat(logits.shape[-1], 2), axis=1)
            return last[:, 0], caches

        def chunk(p, lg, caches, t0, rng, done):
            hist0 = jnp.full((1, max(repetition_context_size, 1)), -1,
                             jnp.int32)

            def body(carry, i):
                lg, caches, key, done, hist = carry
                key, sub = jax.random.split(key)
                tok = sampler(sub, lg, hist if use_rep else None) \
                    .astype(jnp.int32)
                done2 = jnp.logical_or(done, jnp.any(tok[0] == eos))
                hist = jnp.concatenate([hist[:, 1:], tok[:, None]],
                                       axis=1) if use_rep else hist
                emb = apply_embedding(
                    p["language_model"]["model"]["embed_tokens"],
                    tok[:, None])
                hidden, caches = llama_forward(
                    p["language_model"], bc, emb, caches=caches,
                    offset=t0 + i)
                lg2 = logits_from_hidden(p["language_model"], bc,
                                         hidden)[:, -1]
                return (lg2, caches, key, done2, hist), \
                    jnp.where(done2, -1, tok[0])

            (lg, caches, rng, done, _), toks = jax.lax.scan(
                body, (lg, caches, rng, done, hist0),
                jnp.arange(DEC_CHUNK))
            return lg, caches, rng, done, toks

        fns = (jax.jit(prefill), jax.jit(chunk))
        self._jit_cache[key_] = fns
        return fns

    # ---------------------------------------------------------- decode

    def _transcribe_chunk(self, audio: np.ndarray, max_tokens: int,
                          sampling, seed: int
                          ) -> Tuple[List[int], int]:
        if isinstance(sampling, float):
            sampling = (sampling, 0, 1.0, 0.0, 1.0, 20, 1)
        feats, n_audio = self.encode(audio)
        head = list(self._tokenizer.encode("<|user|>\n<|begin_of_audio|>"))
        tail = list(self._tokenizer.encode(
            "<|end_of_audio|>\nPlease transcribe this audio into "
            "text<|assistant|>\n"))
        ids = head + [0] * n_audio + tail
        n = len(ids)
        pb = next((b for b in PROMPT_BUCKETS if n <= b),
                  ((n + 511) // 512) * 512)
        tok_ids = np.zeros((1, pb), np.int32)
        tok_ids[0, :n] = ids
        embeds = np.array(apply_embedding(
            self.params["language_model"]["model"]["embed_tokens"],
            jnp.asarray(tok_ids)))
        embeds[0, len(head):len(head) + n_audio] = feats[0]
        eos = tuple(self.config.lm_config.eos_token_id)
        prefill, chunk = self._lm_fns(pb, max_tokens, sampling, eos)
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.asarray([n]))
        rng = jax.random.PRNGKey(seed)
        done = jnp.bool_(False)
        t = jnp.int32(n)
        out: List[int] = []
        while len(out) < max_tokens:
            lg, caches, rng, done, toks = chunk(self.params, lg, caches,
                                                t, rng, done)
            t = t + DEC_CHUNK
            arr = np.asarray(toks)
            out.extend(int(x) for x in arr[arr >= 0])
            if bool(done):
                break
        return out[:max_tokens], n

    def generate(self, audio, *, max_tokens: int = 128,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0,
                 repetition_context_size: int = 20,
                 min_tokens_to_keep: int = 1,
                 chunk_duration: float = 30.0,
                 min_chunk_duration: float = 1.0, verbose: bool = False,
                 stream: bool = False, seed: int = 0, **kwargs):
        sampling = (float(temperature), int(top_k), float(top_p),
                    float(min_p), float(repetition_penalty),
                    int(repetition_context_size), int(min_tokens_to_keep))
        if stream:
            return self.stream_transcribe(
                audio, max_tokens=max_tokens, temperature=sampling,
                chunk_duration=chunk_duration, seed=seed)
        if self._tokenizer is None:
            raise RuntimeError("glmasr needs its HF tokenizer (place "
                               "tokenizer files in the model directory)")
        t0 = time.time()
        audio_np = self._load(audio)
        chunks = split_audio_into_chunks(audio_np, self.sample_rate,
                                         chunk_duration,
                                         min_chunk_duration)
        texts, segments = [], []
        p_tok = g_tok = 0
        for wav, off in chunks:
            toks, n_prompt = self._transcribe_chunk(
                wav, max_tokens, sampling, seed)
            text = self._tokenizer.decode(toks, skip_special_tokens=True)
            texts.append(text)
            p_tok += n_prompt
            g_tok += len(toks)
            segments.append({"text": text, "start": off,
                             "end": off + len(wav) / self.sample_rate})
        dt = time.time() - t0
        return STTOutput(
            text=" ".join(texts), segments=segments, language="en",
            prompt_tokens=p_tok, generation_tokens=g_tok,
            total_tokens=p_tok + g_tok, total_time=dt,
            prompt_tps=p_tok / dt if dt > 0 else 0,
            generation_tps=g_tok / dt if dt > 0 else 0)

    def stream_transcribe(self, audio, *, max_tokens: int = 128,
                          temperature: float = 0.0,
                          chunk_duration: float = 30.0,
                          min_chunk_duration: float = 1.0, seed: int = 0,
                          **kwargs) -> Generator[StreamingResult, None,
                                                 None]:
        if self._tokenizer is None:
            raise RuntimeError("glmasr needs its HF tokenizer")
        audio_np = self._load(audio)
        chunks = split_audio_into_chunks(audio_np, self.sample_rate,
                                         chunk_duration,
                                         min_chunk_duration)
        p_tok = g_tok = 0
        for ci, (wav, off) in enumerate(chunks):
            dur = len(wav) / self.sample_rate
            toks, n_prompt = self._transcribe_chunk(
                wav, max_tokens, temperature, seed)
            p_tok += n_prompt
            g_tok += len(toks)
            text = self._tokenizer.decode(toks, skip_special_tokens=True)
            if text:
                yield StreamingResult(text=text, is_final=False,
                                      start_time=off, end_time=off + dur,
                                      language="en")
            yield StreamingResult(
                text="", is_final=(ci == len(chunks) - 1),
                start_time=off, end_time=off + dur, language="en",
                prompt_tokens=p_tok, generation_tokens=g_tok)

    @staticmethod
    def _load(audio) -> np.ndarray:
        from ...utils import load_audio
        x = audio[0] if isinstance(audio, list) else audio
        if isinstance(x, str):
            x = load_audio(x)
        return np.asarray(x, np.float32).reshape(-1)

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if "audio_encoder.adapting.0." in k:
                k = k.replace(".adapting.0.", ".adapting.fc1.")
            elif "audio_encoder.adapting.2." in k:
                k = k.replace(".adapting.2.", ".adapting.fc2.")
            if k.startswith(("model.", "lm_head.")):
                k = "language_model." + k
            if "conv" in k and k.endswith("weight") and v.ndim == 3 \
                    and v.shape[-1] == 3 and v.shape[0] != 3:
                v = jnp.transpose(v, (2, 1, 0))   # torch (O, I, K) -> WIO
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer
            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path), trust_remote_code=True)
        except Exception:
            model._tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "WhisperConfig", "LlamaConfig",
           "encode_audio", "init_glmasr"]
