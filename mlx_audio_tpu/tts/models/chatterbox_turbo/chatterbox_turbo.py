"""Chatterbox-Turbo TTS: GPT2 T3 + the shared chatterbox S3Gen stack.

Parity: /root/reference/mlx_audio/tts/models/chatterbox_turbo/
(chatterbox_turbo.py — punc_norm :31, prepare_conditionals :707 with 15 s
encoder / 10 s decoder conditioning + BS.1770 loudness normalize :615,
generate :780, stream_generate :1018; models/t3/t3.py — GPT2 backbone,
inference_turbo :211 sampled decode with repetition penalty over all
generated tokens, no CFG; models/s3gen — the same causal-CFM S3Gen the
base chatterbox family uses).

TPU design: the T3 decode (prefill + top-k/top-p sampled while_loop with
repetition penalty over the whole generated buffer + EOS stop) is ONE
compiled program per prompt bucket — the reference syncs per token.
S3Gen/voice-encoder/S3-tokenizer are the shared chatterbox functional
stacks. Streaming yields per token-chunk by decoding the full token prefix
and emitting the new samples; because the upsample-conformer encoder is
bidirectional, already-emitted samples are frozen while the model would
refine them slightly with more context, so streamed audio matches offline
within ~1e-3 (the reference's flow-cache streaming has the same property).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, init_embedding, init_linear
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..chatterbox.chatterbox import drop_invalid_tokens, punc_norm
from ..chatterbox.s3gen.flow import S3GenConfig, S3Token2Wav, init_s3gen
from ..chatterbox.voice_encoder import (
    VoiceEncoder,
    init_voice_encoder,
    sanitize_voice_encoder,
)
from .gpt2 import GPT2Config, gpt2_forward, init_gpt2, init_gpt2_caches

Array = jax.Array

S3_SR = 16000
S3GEN_SR = 24000
SPEECH_VOCAB_SIZE = 6561
PROMPT_BUCKETS = (128, 256, 512, 1024)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class T3TurboConfig(BaseModelArgs):
    def __init__(self, start_text_token=255, stop_text_token=0,
                 text_tokens_dict_size=50276, start_speech_token=6561,
                 stop_speech_token=6562, speech_tokens_dict_size=6563,
                 speech_cond_prompt_len=375, speaker_embed_size=256,
                 gpt2=None, **kwargs):
        self.start_text_token = start_text_token
        self.stop_text_token = stop_text_token
        self.text_tokens_dict_size = text_tokens_dict_size
        self.start_speech_token = start_speech_token
        self.stop_speech_token = stop_speech_token
        self.speech_tokens_dict_size = speech_tokens_dict_size
        self.speech_cond_prompt_len = speech_cond_prompt_len
        self.speaker_embed_size = speaker_embed_size
        self.gpt2 = GPT2Config(**gpt2) if isinstance(gpt2, dict) \
            else (gpt2 or GPT2Config())


class ModelConfig(BaseModelArgs):
    def __init__(self, model_type: str = "chatterbox_turbo", t3_config=None,
                 s3gen_config=None, sample_rate: int = 24000,
                 model_path: str = "", **kwargs):
        self.model_type = model_type
        self.sample_rate = sample_rate
        self.model_path = model_path
        self.t3_config = T3TurboConfig(**t3_config) \
            if isinstance(t3_config, dict) else (t3_config or
                                                 T3TurboConfig())
        self.s3gen_config = s3gen_config or S3GenConfig()

    @classmethod
    def from_dict(cls, params: dict) -> "ModelConfig":
        from ..chatterbox.chatterbox import ModelConfig as BaseCfg

        known = {k: v for k, v in params.items()
                 if k in ("model_type", "t3_config", "sample_rate",
                          "model_path")}
        sg = params.get("s3gen_config")
        if isinstance(sg, dict):
            known["s3gen_config"] = BaseCfg.from_dict(
                {"s3gen_config": sg}).s3gen_config
        elif sg is not None:
            known["s3gen_config"] = sg
        return cls(**known)


def init_t3_turbo(key, hp: T3TurboConfig) -> dict:
    ks = iter(jax.random.split(key, 8))
    d = hp.gpt2.n_embd
    return {
        "tfmr": init_gpt2(next(ks), hp.gpt2),
        "text_emb": init_embedding(next(ks), hp.text_tokens_dict_size, d),
        "speech_emb": init_embedding(next(ks), hp.speech_tokens_dict_size,
                                     d),
        "text_head": init_linear(next(ks), d, hp.text_tokens_dict_size,
                                 bias=False),
        "speech_head": init_linear(next(ks), d, hp.speech_tokens_dict_size),
        "cond_enc": {"spkr_enc": init_linear(
            next(ks), hp.speaker_embed_size, d)},
    }


class T3Turbo:
    """GPT2 token LM with the turbo conditioning layout
    ([spkr, prompt speech emb] ++ text ++ speech)."""

    def __init__(self, hp: T3TurboConfig):
        self.hp = hp
        self.params: Optional[dict] = None
        self._jit_cache: Dict = {}

    def cond_embeds(self, speaker_emb: np.ndarray,
                    cond_prompt_tokens: Optional[np.ndarray]) -> Array:
        p = self.params
        spk = apply_linear(
            p["cond_enc"]["spkr_enc"],
            jnp.asarray(speaker_emb, jnp.float32).reshape(
                1, self.hp.speaker_embed_size))[:, None]
        if cond_prompt_tokens is not None:
            prompt_emb = apply_embedding(
                p["speech_emb"],
                jnp.asarray(cond_prompt_tokens).reshape(1, -1))
            return jnp.concatenate([spk, prompt_emb], axis=1)
        return spk

    def _decode_fn(self, pb: int, max_gen: int, temperature: float,
                   top_k: int, top_p: float, repetition_penalty: float):
        key_ = ("t3t", pb, max_gen, temperature, top_k, top_p,
                repetition_penalty)
        fn = self._jit_cache.get(key_)
        if fn is not None:
            return fn
        hp = self.hp
        cfg = hp.gpt2
        stop = hp.stop_speech_token
        from ....ops.sampling import (apply_repetition_penalty,
                                      top_k_top_p_filter)

        def sample(k, lg, history):
            lg = lg.astype(jnp.float32)
            if repetition_penalty != 1.0:
                lg = apply_repetition_penalty(lg, history,
                                              repetition_penalty)
            if temperature == 0.0:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(lg / temperature, top_k=top_k,
                                    top_p=top_p)
            return jax.random.categorical(k, lg, axis=-1).astype(jnp.int32)

        def decode(p, embeds, plen, key):
            cap = pb + max_gen
            caches = init_gpt2_caches(cfg, 1, cap)
            pad = jnp.where(jnp.arange(cap)[None] < plen, 0.0, -jnp.inf)
            hidden, caches = gpt2_forward(p["tfmr"], cfg, embeds, caches,
                                          0, mask=pad)
            lg = apply_linear(p["speech_head"],
                              hidden[jnp.arange(1), plen - 1])
            toks0 = jnp.full((1, max_gen), -1, jnp.int32)

            def cond_fn(st):
                i, _, _, _, done, _ = st
                return jnp.logical_and(i < max_gen, jnp.logical_not(done))

            def body(st):
                i, lg, caches, toks, done, key = st
                key, k0 = jax.random.split(key)
                tok = sample(k0, lg, toks)[0]
                is_stop = tok == stop
                toks = jnp.where(is_stop, toks, toks.at[0, i].set(tok))
                emb = apply_embedding(p["speech_emb"], tok[None, None])
                hidden, caches = gpt2_forward(p["tfmr"], cfg, emb, caches,
                                              plen + i)
                lg2 = apply_linear(p["speech_head"], hidden[:, 0])
                return (i + 1, lg2, caches, toks,
                        jnp.logical_or(done, is_stop), key)

            i, _, _, toks, done, _ = jax.lax.while_loop(
                cond_fn, body, (jnp.int32(0), lg, caches, toks0,
                                jnp.bool_(False), key))
            return toks[0], jnp.where(done, i - 1, i)

        fn = jax.jit(decode)
        self._jit_cache[key_] = fn
        return fn

    def inference_turbo(self, speaker_emb, text_tokens,
                        cond_prompt_tokens=None, temperature: float = 0.8,
                        top_k: int = 1000, top_p: float = 0.95,
                        repetition_penalty: float = 1.2,
                        max_gen_len: int = 1000, seed: int = 0
                        ) -> np.ndarray:
        """text tokens -> speech tokens (reference inference_turbo :211),
        the whole sampled loop compiled."""
        hp = self.hp
        cond = self.cond_embeds(speaker_emb, cond_prompt_tokens)
        text = apply_embedding(self.params["text_emb"],
                               jnp.asarray(text_tokens).reshape(1, -1))
        start = apply_embedding(
            self.params["speech_emb"],
            jnp.asarray([[hp.start_speech_token]]))
        embeds = jnp.concatenate([cond, text, start], axis=1)
        plen = embeds.shape[1]
        pb = _bucket(plen, PROMPT_BUCKETS)
        embeds = jnp.pad(embeds, ((0, 0), (0, pb - plen), (0, 0)))
        fn = self._decode_fn(pb, max_gen_len, temperature, top_k, top_p,
                             repetition_penalty)
        toks, count = fn(self.params, embeds, jnp.int32(plen),
                         jax.random.PRNGKey(seed))
        return np.asarray(toks)[: int(count)]


class Model(FunctionalModel):
    """Chatterbox-Turbo (voice cloning, no CFG)."""

    ENC_COND_LEN = 15 * S3_SR     # 15 s for T3/voice-encoder conditioning
    DEC_COND_LEN = 10 * S3GEN_SR  # 10 s for the S3Gen reference

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.t3 = T3Turbo(config.t3_config)
        self.s3gen = S3Token2Wav(config.s3gen_config)
        self.ve = VoiceEncoder()
        self.tokenizer = None
        self._s3_tokenizer = None
        self._conds: Optional[Dict] = None

    @property
    def sample_rate(self) -> int:
        return S3GEN_SR

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"t3": init_t3_turbo(k1, self.config.t3_config),
                "s3gen": init_s3gen(k2, self.config.s3gen_config),
                "ve": init_voice_encoder(k3)}

    def bind_params(self, params):
        self.params = params
        self.t3.params = params["t3"]
        self.s3gen.params = params["s3gen"]
        self.ve.params = params["ve"]

    def init_and_bind(self, seed: int = 0):
        self.bind_params(self.init_params(jax.random.PRNGKey(seed)))
        return self

    # ------------------------------------------------------ conditioning

    def norm_loudness(self, wav: np.ndarray, sr: int,
                      target: float = -27.0) -> np.ndarray:
        """BS.1770 loudness normalize (reference :615-643)."""
        try:
            from ....dsp import integrated_loudness

            loud = float(integrated_loudness(wav, sr))
            if np.isfinite(loud):
                gain = 10.0 ** ((target - loud) / 20.0)
                wav = np.clip(wav * gain, -1.0, 1.0)
        except Exception:
            pass
        return wav

    def prepare_conditionals(self, ref_wav, ref_sr: Optional[int] = None,
                             norm_loudness: bool = True, **kwargs) -> Dict:
        from ....utils import load_audio, resample_audio

        if isinstance(ref_wav, (str, Path)):
            ref_wav = load_audio(str(ref_wav), sample_rate=S3GEN_SR)
            ref_sr = S3GEN_SR
        ref_sr = ref_sr or S3GEN_SR
        wav24 = np.asarray(ref_wav, np.float32).reshape(-1)
        if ref_sr != S3GEN_SR:
            wav24 = np.asarray(resample_audio(wav24, ref_sr, S3GEN_SR))
        if norm_loudness:
            wav24 = self.norm_loudness(wav24, S3GEN_SR)
        wav16 = np.asarray(resample_audio(wav24, S3GEN_SR, S3_SR))
        wav24_dec = wav24[: self.DEC_COND_LEN]
        wav16_dec = wav16[: int(self.DEC_COND_LEN * S3_SR / S3GEN_SR)]
        wav16_enc = wav16[: self.ENC_COND_LEN]

        t3_prompt_tokens = None
        gen_ref = None
        if self._s3_tokenizer is not None:
            s3gen_tokens = np.asarray(
                self._s3_tokenizer.encode(wav16_dec)).reshape(1, -1)
            gen_ref = self.s3gen.embed_ref(wav24_dec, s3gen_tokens,
                                           ref_wav_16k=wav16_dec)
            t3_tokens = np.asarray(
                self._s3_tokenizer.encode(wav16_enc)).reshape(1, -1)
            plen = self.config.t3_config.speech_cond_prompt_len
            t3_prompt_tokens = t3_tokens[:, :plen]
        ve_embed = np.asarray(self.ve.embeds_from_wavs([wav16_enc]))
        return {"t3": {"speaker_emb": ve_embed,
                       "cond_prompt_speech_tokens": t3_prompt_tokens},
                "gen": gen_ref}

    # ---------------------------------------------------------- generate

    def generate(self, text: str, ref_audio=None, audio_prompt=None,
                 audio_prompt_sr: Optional[int] = None,
                 conds: Optional[Dict] = None, temperature: float = 0.8,
                 top_k: int = 1000, top_p: float = 0.95,
                 repetition_penalty: float = 1.2,
                 max_tokens: Optional[int] = None,
                 max_new_tokens: int = 1000, n_timesteps: int = 10,
                 stream: bool = False, streaming_interval: float = 2.0,
                 seed: int = 0, verbose: bool = False, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        t0 = time.perf_counter()
        hp = self.config.t3_config
        if max_tokens is not None:
            max_new_tokens = max_tokens
        if audio_prompt is None and ref_audio is not None:
            audio_prompt = ref_audio
            audio_prompt_sr = audio_prompt_sr or self.sample_rate
        if conds is None:
            if audio_prompt is not None:
                conds = self.prepare_conditionals(audio_prompt,
                                                  audio_prompt_sr)
            elif self._conds is not None:
                conds = self._conds
            else:
                raise ValueError(
                    "No conditionals: pass ref_audio for voice cloning or "
                    "place conds.safetensors in the model directory")

        text = punc_norm(text)
        if self.tokenizer is None:
            raise RuntimeError("chatterbox_turbo needs tokenizer.json in "
                               "the model directory")
        ids = np.asarray(self.tokenizer.text_to_tokens(text))
        token_count = ids.shape[1]
        ids = np.concatenate([
            np.full((1, 1), hp.start_text_token, np.int32), ids,
            np.full((1, 1), hp.stop_text_token, np.int32)], axis=1)

        speech = self.t3.inference_turbo(
            conds["t3"]["speaker_emb"], ids,
            cond_prompt_tokens=conds["t3"]["cond_prompt_speech_tokens"],
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty,
            max_gen_len=max_new_tokens, seed=seed)
        speech = speech[speech >= 0]
        speech = speech[speech < SPEECH_VOCAB_SIZE]
        if conds.get("gen") is None:
            raise ValueError("S3Gen reference missing (no s3 tokenizer "
                             "loaded and no conds.safetensors)")

        if stream and len(speech) > 0:
            chunk_tokens = max(10, int(streaming_interval * 25))
            emitted = 0
            seg = 0
            seg_t0 = time.perf_counter()
            for end in list(range(chunk_tokens, len(speech),
                                  chunk_tokens)) + [len(speech)]:
                wav = self.s3gen(speech[:end], conds["gen"],
                                 n_timesteps=n_timesteps, seed=seed)
                new = np.asarray(wav)[emitted:]
                emitted += len(new)
                dt = time.perf_counter() - seg_t0
                seg_t0 = time.perf_counter()
                yield self._result(new, seg, end, dt,
                                   streaming=True,
                                   final=end == len(speech))
                seg += 1
            return

        wav = self.s3gen(speech, conds["gen"], n_timesteps=n_timesteps,
                         seed=seed)
        dt = time.perf_counter() - t0
        yield self._result(np.asarray(wav), 0, token_count, dt, final=True)

    def _result(self, wav, seg, token_count, dt, streaming=False,
                final=False) -> GenerationResult:
        dur = len(wav) / self.sample_rate
        return GenerationResult(
            audio=jnp.asarray(wav), samples=len(wav),
            sample_rate=self.sample_rate, segment_idx=seg,
            token_count=token_count, audio_duration=format_duration(dur),
            real_time_factor=round(dt / dur, 2) if dur else 0.0,
            prompt={"tokens": token_count,
                    "tokens-per-sec": round(token_count / dt, 2)
                    if dt else 0},
            audio_samples={"samples": len(wav),
                           "samples-per-sec": round(len(wav) / dt, 2)
                           if dt else 0},
            processing_time_seconds=dt,
            peak_memory_usage=peak_memory_gb(),
            is_streaming_chunk=streaming, is_final_chunk=final)

    # ------------------------------------------------------------ loading

    def sanitize(self, weights: Dict) -> Dict:
        from ..chatterbox.chatterbox import Model as BaseChatterbox

        ve_w, t3_w, gen_w, out = {}, {}, {}, {}
        for k, v in weights.items():
            if k.startswith("ve."):
                ve_w[k[3:]] = v
            elif k.startswith("t3."):
                t3_w[k[3:]] = v
            elif k.startswith("s3gen."):
                gen_w[k[6:]] = v
            elif k.startswith(("lstm.", "similarity", "proj.")):
                ve_w[k] = v
            elif k.startswith(("tfmr.", "text_emb.", "speech_emb.",
                               "text_head.", "speech_head.", "cond_enc.")):
                t3_w[k] = v
            elif k.startswith(("flow.", "mel2wav.", "speaker_encoder.",
                               "f0_predictor.", "input_embedding.",
                               "spk_embed_affine_layer.", "encoder.",
                               "encoder_proj.", "decoder.")):
                gen_w[k] = v
            else:
                out[k] = jnp.asarray(v)
        for k, v in self._sanitize_t3(t3_w).items():
            out[f"t3.{k}"] = v
        for k, v in sanitize_voice_encoder(ve_w).items():
            out[f"ve.{k}"] = jnp.asarray(v)
        base = BaseChatterbox.__new__(BaseChatterbox)
        base.config = type("C", (), {
            "s3gen_config": self.config.s3gen_config})()
        for k, v in base._sanitize_s3gen(gen_w).items():
            out[f"s3gen.{k}"] = v
        return out

    def _sanitize_t3(self, weights: Dict) -> Dict:
        """GPT2 keys map 1:1; torch Conv1D layouts ((in, out)) are
        detected via c_attn's rectangular shape and transposed."""
        out = {}
        conv1d_layout = any(
            k.endswith("attn.c_attn.weight")
            and np.asarray(v).shape[1] == 3 * np.asarray(v).shape[0]
            for k, v in weights.items())
        for k, v in weights.items():
            v = jnp.asarray(v)
            if conv1d_layout and k.endswith(".weight") and v.ndim == 2 \
                    and (".c_attn." in k or ".c_proj." in k
                         or ".c_fc." in k):
                v = v.T
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        model_path = Path(model_path)
        model.bind_params(model.params)
        try:
            from ..chatterbox.tokenizer import EnTokenizer

            tok_path = model_path / "tokenizer.json"
            if tok_path.exists():
                model.tokenizer = EnTokenizer(tok_path)
        except Exception:
            model.tokenizer = None
        s3_path = model_path / "s3_tokenizer"
        if s3_path.exists():
            try:
                from ....utils import base_load_model

                model._s3_tokenizer = base_load_model(
                    str(s3_path), "codec", {"s3": "s3"})
            except Exception:
                model._s3_tokenizer = None
        conds_path = model_path / "conds.safetensors"
        if conds_path.exists():
            from safetensors.numpy import load_file

            data = load_file(str(conds_path))
            gen = {k[len("gen."):]: np.asarray(v) for k, v in data.items()
                   if k.startswith("gen.")}
            model._conds = {
                "t3": {"speaker_emb": np.asarray(
                    data.get("t3.speaker_emb", np.zeros((1, 256)))),
                    "cond_prompt_speech_tokens":
                        np.asarray(data["t3.cond_prompt_speech_tokens"])
                        if "t3.cond_prompt_speech_tokens" in data else None},
                "gen": gen if gen else None}
        return model


__all__ = ["Model", "ModelConfig", "T3Turbo", "T3TurboConfig",
           "init_t3_turbo"]
