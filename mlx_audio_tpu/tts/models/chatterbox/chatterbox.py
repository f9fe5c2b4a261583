"""Chatterbox TTS: T3 (llama token LM) + S3Gen (CFM + HiFT) + voice clone.

Parity: reference tts/models/chatterbox/chatterbox.py — punc_norm text
cleanup (:34-76), SOT/EOT framing, CFG pair with zeroed unconditional
text, speech-token extraction between SOS/EOS with vocab filtering
(:79-107, :858-874), prepare_conditionals (6 s 16 kHz for T3 prompt
tokens and voice-encoder embedding; 10 s 24 kHz for the S3Gen prompt
mel/tokens; :610-712), conds.safetensors pre-computed voices
(:571-606), and component-routed sanitize (:185-276).

TPU design: T3 decode is the compiled CFG chunk stepper (t3.py); the
flow matching solve is one lax.scan (s3gen/flow.py); the S3 speech
tokenizer is the shared codec s3 module."""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Generator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ..base import GenerationResult, format_duration
from .s3gen.flow import S3GenConfig, S3Token2Wav, init_s3gen
from .t3 import T3, T3Config, init_t3, sanitize_t3
from .voice_encoder import (VoiceEncoder, init_voice_encoder,
                            sanitize_voice_encoder)

S3_SR = 16000
S3GEN_SR = 24000
SPEECH_VOCAB_SIZE = 6561


def punc_norm(text: str) -> str:
    """Reference chatterbox.py:34-76."""
    if len(text) == 0:
        return "You need to add some text for me to talk."
    if text[0].islower():
        text = text[0].upper() + text[1:]
    text = " ".join(text.split())
    for old, new in [("...", ", "), ("…", ", "), (":", ","),
                     (" - ", ", "), (";", ", "), ("—", "-"), ("–", "-"),
                     (" ,", ","), ("“", "\""), ("”", "\""), ("‘", "'"),
                     ("’", "'")]:
        text = text.replace(old, new)
    text = text.rstrip(" ")
    if not any(text.endswith(p) for p in (".", "!", "?", "-", ",")):
        text += "."
    return text


def drop_invalid_tokens(tokens: np.ndarray, sos: int, eos: int
                        ) -> np.ndarray:
    """Slice between SOS and EOS and drop out-of-vocab ids."""
    x = np.asarray(tokens).reshape(-1)
    s = 0
    sos_pos = np.nonzero(x == sos)[0]
    if len(sos_pos):
        s = int(sos_pos[0]) + 1
    e = len(x)
    eos_pos = np.nonzero(x == eos)[0]
    if len(eos_pos):
        e = int(eos_pos[0])
    x = x[s:e]
    return x[x < SPEECH_VOCAB_SIZE]


class ModelConfig(BaseModelArgs):
    def __init__(self, model_type: str = "chatterbox", t3_config=None,
                 s3gen_config=None, multilingual: bool = False,
                 sample_rate: int = 24000, model_path: str = "",
                 **kwargs):
        self.model_type = model_type
        self.multilingual = multilingual
        self.sample_rate = sample_rate
        self.model_path = model_path
        self.t3_config = T3Config(**t3_config) \
            if isinstance(t3_config, dict) else (t3_config or T3Config())
        self.s3gen_config = s3gen_config or S3GenConfig()

    @classmethod
    def from_dict(cls, params: dict) -> "ModelConfig":
        known = {k: v for k, v in params.items()
                 if k in ("model_type", "t3_config", "multilingual",
                          "sample_rate", "model_path")}
        sg = params.get("s3gen_config")
        if isinstance(sg, dict):
            sg = dict(sg)
            from .s3gen.hifigan import HiFTConfig
            from .s3gen.matcha import DecoderConfig
            from .s3gen.xvector import CAMPPlusConfig
            dec = sg.pop("decoder", None)
            hift = sg.pop("hift", None)
            camp = sg.pop("campplus", None)
            camp_layers = (camp or {}).pop("block_layers", None)
            cfg = S3GenConfig(
                **sg,
                decoder=DecoderConfig(**dec) if dec else None,
                hift=HiFTConfig(**hift) if hift else None,
                campplus=CAMPPlusConfig(**camp) if camp else None)
            if camp_layers:
                cfg.campplus.block_layers = tuple(camp_layers)
            known["s3gen_config"] = cfg
        return cls(**known)


class Model(FunctionalModel):
    ENC_COND_LEN = 6 * S3_SR
    DEC_COND_LEN = 10 * S3GEN_SR

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.t3 = T3(config.t3_config)
        self.s3gen = S3Token2Wav(config.s3gen_config)
        self.ve = VoiceEncoder()
        self.tokenizer = None
        self.mtl_tokenizer = None
        self._s3_tokenizer = None        # codec s3 Model (optional)
        self._conds: Optional[Dict] = None

    @property
    def sample_rate(self) -> int:
        return S3GEN_SR

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"t3": init_t3(k1, self.config.t3_config),
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

    def prepare_conditionals(self, ref_wav, ref_sr: Optional[int] = None,
                             exaggeration: float = 0.5) -> Dict:
        from ....utils import load_audio, resample_audio
        if isinstance(ref_wav, (str, Path)):
            ref_wav = load_audio(str(ref_wav), sample_rate=S3GEN_SR)
            ref_sr = S3GEN_SR
        ref_sr = ref_sr or S3GEN_SR
        wav = np.asarray(ref_wav, np.float32).reshape(-1)
        wav24 = wav if ref_sr == S3GEN_SR else np.asarray(
            resample_audio(wav, ref_sr, S3GEN_SR))
        wav24 = wav24[: self.DEC_COND_LEN]
        wav16_from24 = np.asarray(resample_audio(wav24, S3GEN_SR, S3_SR))
        wav16_full = wav if ref_sr == S3_SR else np.asarray(
            resample_audio(wav, ref_sr, S3_SR))
        wav16 = wav16_full[: self.ENC_COND_LEN]

        t3_prompt_tokens = None
        gen_ref = None
        if self._s3_tokenizer is not None:
            s3gen_tokens = np.asarray(
                self._s3_tokenizer.encode(wav16_from24)).reshape(1, -1)
            gen_ref = self.s3gen.embed_ref(wav24, s3gen_tokens,
                                           ref_wav_16k=wav16_from24)
            t3_tokens = np.asarray(
                self._s3_tokenizer.encode(wav16)).reshape(1, -1)
            plen = self.config.t3_config.speech_cond_prompt_len
            t3_prompt_tokens = t3_tokens[:, :plen]
        ve_embed = np.asarray(self.ve.embeds_from_wavs([wav16_full]))
        return {"t3": {"speaker_emb": ve_embed,
                       "cond_prompt_speech_tokens": t3_prompt_tokens,
                       "emotion_adv": float(exaggeration)},
                "gen": gen_ref}

    # --------------------------------------------------------- generate

    def generate(self, text: str, ref_audio=None,
                 audio_prompt=None, audio_prompt_sr: Optional[int] = None,
                 conds: Optional[Dict] = None, exaggeration: float = 0.5,
                 cfg_weight: float = 0.5, temperature: float = 0.8,
                 repetition_penalty: float = 1.2, min_p: float = 0.05,
                 top_p: float = 1.0, max_tokens: Optional[int] = None,
                 max_new_tokens: int = 1000, lang_code: str = "en",
                 n_timesteps: int = 10, verbose: bool = False,
                 seed: int = 0, **kwargs
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
                                                  audio_prompt_sr,
                                                  exaggeration)
            elif self._conds is not None:
                conds = self._conds
            else:
                raise ValueError(
                    "No conditionals: pass ref_audio for voice cloning "
                    "or place conds.safetensors in the model directory")
        conds["t3"]["emotion_adv"] = float(exaggeration)

        text = punc_norm(text)
        if lang_code == "en" or self.mtl_tokenizer is None:
            if self.tokenizer is None:
                raise RuntimeError("chatterbox needs tokenizer.json in "
                                   "the model directory")
            ids = self.tokenizer.text_to_tokens(text)
        else:
            ids = self.mtl_tokenizer.text_to_tokens(
                text, language_id=lang_code)
        token_count = ids.shape[1]
        ids = np.concatenate([
            np.full((1, 1), hp.start_text_token, np.int32), ids,
            np.full((1, 1), hp.stop_text_token, np.int32)], axis=1)

        speech = self.t3.inference(
            conds["t3"]["speaker_emb"], ids,
            cond_prompt_tokens=conds["t3"]["cond_prompt_speech_tokens"],
            emotion_adv=conds["t3"]["emotion_adv"],
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, min_p=min_p,
            repetition_penalty=repetition_penalty,
            cfg_weight=cfg_weight, seed=seed)
        speech = drop_invalid_tokens(
            np.asarray([hp.start_speech_token] + speech),
            hp.start_speech_token, hp.stop_speech_token)
        if conds.get("gen") is None:
            raise ValueError("S3Gen reference missing (no s3 tokenizer "
                             "loaded and no conds.safetensors)")
        wav = self.s3gen(speech, conds["gen"], n_timesteps=n_timesteps,
                         seed=seed)
        dt = time.perf_counter() - t0
        dur = len(wav) / self.sample_rate
        yield GenerationResult(
            audio=jnp.asarray(wav), samples=len(wav),
            sample_rate=self.sample_rate, segment_idx=0,
            token_count=token_count, audio_duration=format_duration(dur),
            real_time_factor=round(dt / dur, 2) if dur else 0.0,
            prompt={"tokens": token_count,
                    "tokens-per-sec":
                        round(token_count / dt, 2) if dt else 0},
            audio_samples={"samples": len(wav),
                           "samples-per-sec":
                               round(len(wav) / dt, 2) if dt else 0},
            processing_time_seconds=dt, peak_memory_usage=0.0)

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
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
                               "text_head.", "speech_head.",
                               "cond_enc.", "text_pos_emb.",
                               "speech_pos_emb.")):
                t3_w[k] = v
            elif k.startswith(("flow.", "mel2wav.", "speaker_encoder.",
                               "f0_predictor.")):
                gen_w[k] = v
            elif k.startswith("gen."):
                continue                       # conditionals, not weights
            else:
                out[k] = jnp.asarray(v)
        for k, v in sanitize_t3(t3_w).items():
            out[f"t3.{k}"] = v
        for k, v in sanitize_voice_encoder(ve_w).items():
            out[f"ve.{k}"] = jnp.asarray(v)
        for k, v in self._sanitize_s3gen(gen_w).items():
            out[f"s3gen.{k}"] = v
        return out

    def _sanitize_s3gen(self, weights: Dict) -> Dict:
        """Weight-norm folds + component routing (reference s3gen
        sanitize): speaker encoder via CAMPPlus rules, HiFT convs,
        matcha decoder key renames + conv layouts."""
        import re
        from .s3gen.hifigan import sanitize_hift
        from .s3gen.xvector import sanitize_campplus
        spk, hift, rest = {}, {}, {}
        for k, v in weights.items():
            if k.startswith("speaker_encoder."):
                spk[k[len("speaker_encoder."):]] = v
            elif k.startswith("mel2wav."):
                hift[k[len("mel2wav."):]] = v
            else:
                rest[k] = jnp.asarray(v)
        out = {}
        for k, v in sanitize_campplus(spk).items():
            out[f"speaker_encoder.{k}"] = v
        for k, v in sanitize_hift(hift, self.config.s3gen_config.hift
                                  ).items():
            out[f"mel2wav.{k}"] = v
        # weight-norm folds
        staged, g_map = {}, {}
        for k, v in rest.items():
            if "parametrizations.weight.original0" in k:
                g_map[k.replace(".parametrizations.weight.original0",
                                "")] = v
            elif "parametrizations.weight.original1" in k:
                staged[k.replace(".parametrizations.weight.original1",
                                 ".weight#v")] = v
            else:
                staged[k] = v
        for k, v in list(staged.items()):
            if k.endswith(".weight#v"):
                base = k[:-len(".weight#v")]
                g = g_map[base]
                norm = jnp.sqrt(jnp.sum(
                    v * v, axis=tuple(range(1, v.ndim)), keepdims=True))
                staged[base + ".weight"] = g * v / (norm + 1e-12)
                del staged[k]
        for k, v in staged.items():
            if "num_batches_tracked" in k:
                continue
            # decoder block renames (reference s3gen.py:289-345)
            k = re.sub(r"down_blocks\.(\d+)\.0\.",
                       r"down_blocks_\1.resnet.", k)
            k = re.sub(r"down_blocks\.(\d+)\.1\.(\d+)\.",
                       r"down_blocks_\1.transformer_\2.", k)
            k = re.sub(r"down_blocks\.(\d+)\.2\.",
                       r"down_blocks_\1.downsample.", k)
            k = re.sub(r"mid_blocks\.(\d+)\.0\.",
                       r"mid_blocks_\1.resnet.", k)
            k = re.sub(r"mid_blocks\.(\d+)\.1\.(\d+)\.",
                       r"mid_blocks_\1.transformer_\2.", k)
            k = re.sub(r"up_blocks\.(\d+)\.0\.", r"up_blocks_\1.resnet.",
                       k)
            k = re.sub(r"up_blocks\.(\d+)\.1\.(\d+)\.",
                       r"up_blocks_\1.transformer_\2.", k)
            k = re.sub(r"up_blocks\.(\d+)\.2\.",
                       r"up_blocks_\1.upsample.", k)
            k = re.sub(r"\.block1\.block\.0\.", r".block1.conv.conv.", k)
            k = re.sub(r"\.block1\.block\.2\.", r".block1.norm.", k)
            k = re.sub(r"\.block2\.block\.0\.", r".block2.conv.conv.", k)
            k = re.sub(r"\.block2\.block\.2\.", r".block2.norm.", k)
            k = re.sub(r"\.mlp\.1\.", r".mlp_linear.", k)
            k = k.replace(".attn1.to_q.", ".attn.query_proj.")
            k = k.replace(".attn1.to_k.", ".attn.key_proj.")
            k = k.replace(".attn1.to_v.", ".attn.value_proj.")
            k = k.replace(".attn1.to_out.0.", ".attn.out_proj.")
            k = k.replace(".ff.net.0.proj.", ".ff.layers.0.")
            k = k.replace(".ff.net.2.", ".ff.layers.1.")
            if k.endswith(".weight") and v.ndim == 3 \
                    and v.shape[-1] < v.shape[0]:
                v = jnp.transpose(v, (2, 1, 0))   # torch (O,I,K) -> WIO
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        model_path = Path(model_path)
        model.bind_params(model.params)
        try:
            from .tokenizer import EnTokenizer, MTLTokenizer
            tok_path = model_path / "tokenizer.json"
            if tok_path.exists():
                model.tokenizer = EnTokenizer(tok_path)
                if model.config.multilingual:
                    model.mtl_tokenizer = MTLTokenizer(tok_path)
        except Exception:
            model.tokenizer = None
        # optional S3 speech tokenizer (shared codec module)
        s3_path = model_path / "s3_tokenizer"
        if s3_path.exists():
            try:
                from ....utils import base_load_model
                model._s3_tokenizer = base_load_model(
                    str(s3_path), "codec", {"s3": "s3"})
            except Exception:
                model._s3_tokenizer = None
        # pre-computed conditionals
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
                        if "t3.cond_prompt_speech_tokens" in data
                        else None,
                    "emotion_adv": float(np.asarray(
                        data.get("t3.emotion_adv", 0.5)).reshape(-1)[0])},
                "gen": gen if gen else None}
        return model


__all__ = ["Model", "ModelConfig", "punc_norm", "drop_invalid_tokens"]
