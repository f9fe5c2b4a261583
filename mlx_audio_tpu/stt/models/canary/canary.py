"""Canary: NVIDIA multilingual ASR/AST (FastConformer + transformer dec).

Parity: reference stt/models/canary/ — encoder reuses the parakeet
FastConformer with an optional output projection (canary.py:18-60), NeMo
preprocessor (per-feature-normalized log mel with preemphasis,
config.py:7-38), pre-norm transformer decoder with interleaved fixed
sinusoidal positions scaled by 1/sqrt(d) (decoder.py:103-263), Canary
prompt format <|startofcontext|>..<|nodiarize|> with source/target
language + pnc flags (tokenizer.py:100-126), greedy decode to
<|endoftext|> (canary.py:146-240), and the three-layout sanitize
(canary.py:262-300; the MLX-native community layout maps linear_q ->
q_proj etc.).

TPU design: the encoder runs bucketed with validity masks (the shared
conformer now takes `lengths`); the decoder prefill + greedy loop run as
one compiled `lax.while_loop` over fixed-capacity caches with
precomputed cross K/V — same pattern as moonshine, one compile per
(bucket, max_tokens).
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
from ....nn import (apply_embedding, apply_layer_norm, apply_linear,
                    init_embedding, init_layer_norm, init_linear)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ..base import STTOutput
from ..parakeet.conformer import (ConformerArgs, conformer_forward,
                                  init_conformer, subsampled_length)

Array = jax.Array

MEL_BUCKETS = (256, 512, 1024, 2048, 3008)


@dataclass
class PreprocessorConfig(BaseModelArgs):
    sample_rate: int = 16000
    normalize: str = "per_feature"
    features: int = 128
    n_fft: int = 512
    window_size: float = 0.025
    window_stride: float = 0.01
    preemph: float = 0.97


@dataclass
class DecoderConfig(BaseModelArgs):
    num_layers: int = 8
    hidden_size: int = 1024
    num_attention_heads: int = 16
    inner_size: int = 4096
    max_sequence_length: int = 1024


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "canary"
    vocab_size: int = 16384
    enc_output_dim: int = 1024
    encoder: dict = field(default_factory=dict)
    transf_decoder: Optional[DecoderConfig] = None
    preprocessor: Optional[PreprocessorConfig] = None

    def __post_init__(self):
        if isinstance(self.transf_decoder, dict):
            self.transf_decoder = DecoderConfig.from_dict(
                self.transf_decoder)
        if self.transf_decoder is None:
            self.transf_decoder = DecoderConfig()
        if isinstance(self.preprocessor, dict):
            self.preprocessor = PreprocessorConfig.from_dict(
                self.preprocessor)
        if self.preprocessor is None:
            self.preprocessor = PreprocessorConfig()

    def conformer_args(self) -> ConformerArgs:
        valid = {f for f in ConformerArgs.__dataclass_fields__}
        return ConformerArgs(**{k: v for k, v in self.encoder.items()
                                if k in valid})


# ----------------------------------------------------------- tokenizer

class CanaryTokenizer:
    """SentencePiece tokenizer + Canary prompt format
    (reference tokenizer.py). When sentencepiece is unavailable, a plain
    piece list (`tokens.json`, index -> piece) gives decode-only support
    — enough for transcription, mirroring the sensevoice fallback."""

    def __init__(self, model_path: Optional[str] = None, *,
                 model_proto: Optional[bytes] = None,
                 piece_list: Optional[List[str]] = None):
        self.sp = None
        if piece_list is not None:
            self.vocab_size = len(piece_list)
            self.token2id = {s: i for i, s in enumerate(piece_list)}
            self._pieces = piece_list
            return
        import sentencepiece as spm
        if model_proto is not None:
            self.sp = spm.SentencePieceProcessor(model_proto=model_proto)
        else:
            self.sp = spm.SentencePieceProcessor()
            self.sp.load(model_path)
        self.vocab_size = self.sp.get_piece_size()
        self.token2id = {self.sp.id_to_piece(i): i
                         for i in range(self.vocab_size)}

    def encode(self, text: str) -> List[int]:
        if self.sp is None:
            raise RuntimeError("encode() needs the sentencepiece model")
        return self.sp.encode(text)

    def decode(self, ids: List[int]) -> str:
        if self.sp is None:
            return "".join(self._pieces[i] for i in ids
                           if 0 <= i < self.vocab_size) \
                .replace("\u2581", " ").strip()
        return self.sp.decode(ids)

    def build_prompt_tokens(self, source_lang: str = "en",
                            target_lang: str = "en",
                            use_pnc: bool = True) -> List[int]:
        t = self.token2id
        return [t["<|startofcontext|>"], t["<|startoftranscript|>"],
                t["<|emo:undefined|>"], t[f"<|{source_lang}|>"],
                t[f"<|{target_lang}|>"],
                t["<|pnc|>"] if use_pnc else t["<|nopnc|>"],
                t["<|noitn|>"], t["<|notimestamp|>"], t["<|nodiarize|>"]]

    @property
    def eos_id(self) -> int:
        return self.token2id.get("<|endoftext|>", 0)


# -------------------------------------------------------------- decoder

def _fixed_positions(max_len: int, d: int) -> np.ndarray:
    """Interleaved sin/cos scaled by 1/sqrt(d) (reference decoder.py
    FixedPositionalEncoding)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32)
                 * (-np.log(10000.0) / d))
    ang = pos * div
    pe = np.stack([np.sin(ang), np.cos(ang)], axis=2).reshape(max_len, d)
    return (pe / np.sqrt(d)).astype(np.float32)


def init_decoder(key, cfg: DecoderConfig, vocab: int, d: int) -> dict:
    ks = iter(jax.random.split(key, 4 + 12 * cfg.num_layers))
    p = {"embedding": init_embedding(next(ks), vocab, d),
         "embedding_layer_norm": init_layer_norm(d),
         "blocks": {}, "final_norm": init_layer_norm(d),
         "output_proj": init_linear(next(ks), d, vocab)}
    for i in range(cfg.num_layers):
        p["blocks"][str(i)] = {
            "self_attn_norm": init_layer_norm(d),
            "self_attn": {k: init_linear(next(ks), d, d)
                          for k in ("q_proj", "k_proj", "v_proj",
                                    "out_proj")},
            "cross_attn_norm": init_layer_norm(d),
            "cross_attn": {k: init_linear(next(ks), d, d)
                           for k in ("q_proj", "k_proj", "v_proj",
                                     "out_proj")},
            "ff_norm": init_layer_norm(d),
            "ff1": init_linear(next(ks), d, cfg.inner_size),
            "ff2": init_linear(next(ks), cfg.inner_size, d),
        }
    return p


def _heads(x: Array, n: int) -> Array:
    b, t, _ = x.shape
    return x.reshape(b, t, n, -1)


def cross_kv(p: dict, cfg: DecoderConfig, enc: Array) -> List:
    return [( _heads(apply_linear(p["blocks"][str(i)]["cross_attn"]
                                  ["k_proj"], enc),
                     cfg.num_attention_heads),
              _heads(apply_linear(p["blocks"][str(i)]["cross_attn"]
                                  ["v_proj"], enc),
                     cfg.num_attention_heads))
            for i in range(cfg.num_layers)]


def decoder_forward(p: dict, cfg: DecoderConfig, tokens: Array,
                    enc_mask: Array, caches: List[KVCache],
                    ckv: List, offset: Array, pos_table: Array
                    ) -> Tuple[Array, List[KVCache]]:
    """tokens (B, T) with self-KV written at `offset` -> logits (B, T, V)."""
    b, t = tokens.shape
    h = cfg.num_attention_heads
    x = apply_embedding(p["embedding"], tokens)
    pos = offset + jnp.arange(t)
    x = x + pos_table[pos][None]
    x = apply_layer_norm(p["embedding_layer_norm"], x)
    ebias = jnp.where(enc_mask, 0.0, -1e9)[:, None, None, :]

    new_caches = []
    for i in range(cfg.num_layers):
        bp = p["blocks"][str(i)]
        hn = apply_layer_norm(bp["self_attn_norm"], x)
        a = bp["self_attn"]
        q = _heads(apply_linear(a["q_proj"], hn), h)
        k = _heads(apply_linear(a["k_proj"], hn), h)
        v = _heads(apply_linear(a["v_proj"], hn), h)
        cache = kv_update(caches[i], k, v, offset)
        new_caches.append(cache)
        if t == 1:
            o = decode_attention(q, cache.k, cache.v, offset + 1)
        else:
            s = cache.k.shape[1]
            pos_s = jnp.arange(s)[None, None, None, :]
            causal = pos_s <= (offset + jnp.arange(t))[None, None, :,
                                                       None]
            bias = jnp.where(causal, 0.0, -jnp.inf)
            o = attention(q, cache.k, cache.v, mask=bias)
        x = x + apply_linear(a["out_proj"], o.reshape(b, t, -1))

        hn = apply_layer_norm(bp["cross_attn_norm"], x)
        q = _heads(apply_linear(bp["cross_attn"]["q_proj"], hn), h)
        ck, cv = ckv[i]
        o = attention(q, ck, cv, mask=ebias)
        x = x + apply_linear(bp["cross_attn"]["out_proj"],
                             o.reshape(b, t, -1))

        hn = apply_layer_norm(bp["ff_norm"], x)
        x = x + apply_linear(bp["ff2"],
                             jax.nn.relu(apply_linear(bp["ff1"], hn)))
    x = apply_layer_norm(p["final_norm"], x)
    return apply_linear(p["output_proj"], x), new_caches


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer: Optional[CanaryTokenizer] = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.preprocessor.sample_rate

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        args = self.config.conformer_args()
        p = {"encoder": init_conformer(k1, args),
             "decoder": init_decoder(k2, self.config.transf_decoder,
                                     self.config.vocab_size,
                                     self.config.enc_output_dim)}
        if args.d_model != self.config.enc_output_dim:
            p["encoder_proj"] = init_linear(k3, args.d_model,
                                            self.config.enc_output_dim)
        return p

    # ------------------------------------------------------- features

    def _log_mel(self, audio: np.ndarray) -> np.ndarray:
        from ....dsp import log_mel_spectrogram
        pp = self.config.preprocessor
        x = np.asarray(audio, np.float32).reshape(-1)
        if pp.preemph:
            x = np.concatenate([x[:1], x[1:] - pp.preemph * x[:-1]])
        mel = np.asarray(log_mel_spectrogram(
            x, n_fft=pp.n_fft,
            hop_length=int(pp.window_stride * pp.sample_rate),
            n_mels=pp.features, sample_rate=pp.sample_rate,
            log_base="ln", log_floor_mode="add"))
        mean = mel.mean(axis=0, keepdims=True)
        std = mel.std(axis=0, keepdims=True) + 1e-5
        return (mel - mean) / std

    # -------------------------------------------------------- compiled

    def _fns(self, bucket: int, max_tokens: int,
             temperature: float = 0.0):
        key_ = (bucket, max_tokens, temperature)
        fns = self._jit_cache.get(key_)
        if fns is None:
            cfg = self.config
            args = cfg.conformer_args()
            dec = cfg.transf_decoder
            pos_table = jnp.asarray(_fixed_positions(
                dec.max_sequence_length, cfg.enc_output_dim))

            def encode(p, mel, n):
                enc = conformer_forward(p["encoder"], args, mel,
                                        lengths=n)
                if "encoder_proj" in p:
                    enc = apply_linear(p["encoder_proj"], enc)
                enc_len = subsampled_length(args, n)
                mask = jnp.arange(enc.shape[1])[None, :] \
                    < enc_len[:, None]
                return enc, mask

            def decode(p, enc, enc_mask, prompt, prompt_len, eos_id,
                       rng):
                cap = prompt.shape[1] + max_tokens
                ckv = cross_kv(p["decoder"], dec, enc)
                caches = [KVCache.init(
                    1, cap, dec.num_attention_heads,
                    cfg.enc_output_dim // dec.num_attention_heads,
                    dtype=jnp.float32) for _ in range(dec.num_layers)]
                logits, caches = decoder_forward(
                    p["decoder"], dec, prompt, enc_mask, caches, ckv,
                    jnp.int32(0), pos_table)
                last = logits[:, prompt_len - 1]
                tokens0 = jnp.zeros((max_tokens,), jnp.int32)

                def cond(st):
                    i, done = st[0], st[-1]
                    return jnp.logical_and(i < max_tokens,
                                           jnp.logical_not(done))

                def body(st):
                    i, lg, caches, toks, rng, done = st
                    if temperature > 0.0:
                        rng, sub = jax.random.split(rng)
                        nxt = jax.random.categorical(
                            sub, lg[0] / temperature).astype(jnp.int32)
                    else:
                        nxt = jnp.argmax(lg[0]).astype(jnp.int32)
                    is_eos = nxt == eos_id
                    toks = jnp.where(is_eos, toks, toks.at[i].set(nxt))
                    lg2, caches = decoder_forward(
                        p["decoder"], dec, nxt[None, None], enc_mask,
                        caches, ckv, prompt_len + i, pos_table)
                    return (i + 1, lg2[:, 0], caches, toks, rng,
                            jnp.logical_or(done, is_eos))

                i, _, _, toks, _, done = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), last, caches, tokens0,
                                 rng, jnp.bool_(False)))
                return toks, jnp.where(done, i - 1, i)

            fns = (jax.jit(encode), jax.jit(decode))
            self._jit_cache[key_] = fns
        return fns

    # --------------------------------------------------------- generate

    def generate(self, audio, *, max_tokens: int = 200,
                 source_lang: str = "en", target_lang: str = "en",
                 use_pnc: bool = True, temperature: float = 0.0,
                 seed: int = 0, stream: bool = False,
                 verbose: bool = False,
                 **kwargs) -> STTOutput:
        # stream: reference canary.py:169 "Not supported yet (returns
        # STTOutput)" — same contract here
        language = kwargs.pop("language", None)
        if language:
            source_lang = target_lang = language
        t0 = time.time()
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio
            audio = load_audio(str(audio), self.sample_rate)
        mel = self._log_mel(np.asarray(audio))
        t = mel.shape[0]
        tb = next((b for b in MEL_BUCKETS if t <= b),
                  ((t + 511) // 512) * 512)
        mel_pad = np.zeros((1, tb, mel.shape[1]), np.float32)
        mel_pad[0, :t] = mel

        if self._tokenizer is None:
            raise RuntimeError("tokenizer not loaded (place the "
                               "sentencepiece model beside the weights)")
        prompt = self._tokenizer.build_prompt_tokens(source_lang,
                                                     target_lang, use_pnc)
        encode, decode = self._fns(tb, max_tokens, float(temperature))
        enc, enc_mask = encode(self.params, jnp.asarray(mel_pad),
                               jnp.asarray([t]))
        toks, count = decode(self.params, enc, enc_mask,
                             jnp.asarray([prompt], jnp.int32),
                             jnp.int32(len(prompt)),
                             jnp.int32(self._tokenizer.eos_id),
                             jax.random.PRNGKey(seed))
        generated = np.asarray(toks)[: int(count)].tolist()
        text = self._tokenizer.decode(generated).strip()
        dt = time.time() - t0
        if verbose:
            print(f"Text: {text}")
        return STTOutput(
            text=text, language=source_lang,
            segments=[{"text": text, "start": 0.0, "end": 0.0}],
            prompt_tokens=len(prompt), generation_tokens=len(generated),
            total_tokens=len(prompt) + len(generated), total_time=dt,
            prompt_tps=len(prompt) / dt if dt else 0,
            generation_tps=len(generated) / dt if dt else 0)

    __call__ = generate

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """Map the MLX-native community layout (transf_decoder.layers.N.
        first_sub_layer.linear_q etc., head.classifier) and NeMo-native
        names onto our tree; conv kernels to WIO/HWIO via the parakeet
        conventions."""
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            k = k.replace("transf_decoder._decoder.layers.",
                          "decoder.blocks.")
            k = k.replace("transf_decoder.layers.", "decoder.blocks.")
            k = k.replace(".first_sub_layer.", ".self_attn.")
            k = k.replace(".second_sub_layer.", ".cross_attn.")
            k = k.replace(".third_sub_layer.", ".ff.")
            k = k.replace(".linear_q.", ".q_proj.")
            k = k.replace(".linear_k.", ".k_proj.")
            k = k.replace(".linear_v.", ".v_proj.")
            k = k.replace(".linear_out.", ".out_proj.")
            k = k.replace(".ff.dense_in.", "_TMP_ff1.")
            k = k.replace(".ff.dense_out.", "_TMP_ff2.")
            k = k.replace("_TMP_ff1.", ".ff1.")
            k = k.replace("_TMP_ff2.", ".ff2.")
            k = k.replace("head.classifier.", "decoder.output_proj.")
            k = k.replace("transf_decoder.embedding.token_embedding.",
                          "decoder.embedding.")
            if k.endswith("weight") and v.ndim == 4 \
                    and v.shape[-1] == v.shape[-2] \
                    and v.shape[0] > v.shape[-1]:
                v = jnp.transpose(v, (2, 3, 1, 0))   # conv2d -> HWIO
            elif k.endswith("weight") and v.ndim == 3 \
                    and v.shape[0] > v.shape[-1]:
                v = jnp.transpose(v, (2, 1, 0))      # conv1d -> WIO
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        import base64
        import json
        model_path = Path(model_path)
        for name in ("tokenizer.model", "spm.model",
                     "canary_tokenizer.model"):
            f = model_path / name
            if f.exists():
                try:
                    model._tokenizer = CanaryTokenizer(str(f))
                    return model
                except Exception:
                    pass
        cfg = model_path / "config.json"
        if cfg.exists():
            d = json.loads(cfg.read_text())
            proto = d.get("tokenizer_model_base64")
            if proto:
                try:
                    model._tokenizer = CanaryTokenizer(
                        model_proto=base64.b64decode(proto))
                    return model
                except Exception:
                    pass
        tokens = model_path / "tokens.json"
        if model._tokenizer is None and tokens.exists():
            model._tokenizer = CanaryTokenizer(
                piece_list=json.loads(tokens.read_text()))
        return model


__all__ = ["Model", "ModelConfig", "CanaryTokenizer", "decoder_forward",
           "init_decoder", "cross_kv"]
