"""Spark-TTS: Qwen2-0.5B token LM + BiCodec voice cloning.

Parity: /root/reference/mlx_audio/tts/models/spark/spark.py (prompt assembly
process_prompt :112-169 / process_prompt_control :171-216, sampled decode
w/ repetition penalty :218-392) and audio_tokenizer.py (BiCodecTokenizer —
wav2vec2 feature mix of layers 11/14/16 :75-89, ref-clip tiling :40-54).

TPU design: the LM rides the shared llama backbone (qwen2 = llama +
qkv bias + tied embeddings); the full sampled AR decode — prefill +
repetition-penalized sampling + stop detection — is ONE compiled
`lax.while_loop` over fixed KV caches (no per-token host syncs, unlike the
reference's mlx_lm stream_generate loop). BiCodec tokenize/detokenize are
exact-shape jitted drivers (bicodec.py).
"""

from __future__ import annotations

import re
import time
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....ops.kvcache import KVCache
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..llama.llama import (
    decode_step,
    init_caches,
    init_llama,
    llama_forward,
    logits_from_hidden,
)
from .bicodec import BiCodec
from .config import BiCodecConfig, ModelConfig

Array = jax.Array

PITCH_MAP = SPEED_MAP = {0.0: "very_low", 0.5: "low", 1.0: "moderate",
                         1.5: "high", 2.0: "very_high"}
LEVELS_MAP = {"very_low": 0, "low": 1, "moderate": 2, "high": 3,
              "very_high": 4}
GENDER_MAP = {"female": 0, "male": 1}
TASK_TOKEN_MAP = {"tts": "<|task_tts|>",
                  "controllable_tts": "<|task_controllable_tts|>"}
STOP_TOKEN_ID = 128258  # reference spark.py:301 hard stop
REP_CONTEXT = 20
PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Model(FunctionalModel):
    """Spark-TTS (voice cloning + controllable voice creation)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None
        self.bicodec: Optional[BiCodec] = None
        self._w2v = None      # (params, cfg) of wav2vec2-large-xlsr-53

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_llama(key, self.config)

    def sanitize(self, weights):
        return {k: v for k, v in weights.items()
                if not k.endswith("rotary_emb.inv_freq")}

    def model_quant_predicate(self, path, w):
        return not path.startswith(("bicodec", "_audio_tokenizer"))

    # ------------------------------------------------------------- loading

    @classmethod
    def post_load_hook(cls, model: "Model", model_path) -> "Model":
        model_path = Path(model_path)
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model.tokenizer = None
        bdir = model_path / "BiCodec"
        if bdir.exists():
            try:
                model.bicodec = _load_bicodec(bdir, model_path)
            except Exception as e:  # pragma: no cover - asset variations
                print(f"spark: BiCodec load failed: {e}")
        wdir = model_path / "wav2vec2-large-xlsr-53"
        if wdir.exists():
            try:
                model._w2v = _load_wav2vec2(wdir)
            except Exception as e:  # pragma: no cover
                print(f"spark: wav2vec2 load failed: {e}")
        return model

    # -------------------------------------------------------------- prompt

    def process_prompt(self, text: str, ref_audio, ref_text: Optional[str]
                       ) -> Tuple[str, np.ndarray]:
        """Voice-clone prompt (reference spark.py:112-169)."""
        global_ids, semantic_ids = self.tokenize_ref(ref_audio)
        gstr = "".join(f"<|bicodec_global_{int(i)}|>"
                       for i in np.asarray(global_ids).reshape(-1))
        if ref_text is not None:
            sstr = "".join(f"<|bicodec_semantic_{int(i)}|>"
                           for i in np.asarray(semantic_ids).reshape(-1))
            parts = [TASK_TOKEN_MAP["tts"], "<|start_content|>", ref_text,
                     text, "<|end_content|>", "<|start_global_token|>",
                     gstr, "<|end_global_token|>",
                     "<|start_semantic_token|>", sstr]
        else:
            parts = [TASK_TOKEN_MAP["tts"], "<|start_content|>", text,
                     "<|end_content|>", "<|start_global_token|>", gstr,
                     "<|end_global_token|>"]
        return "".join(parts), np.asarray(global_ids)

    @staticmethod
    def process_prompt_control(gender: str, pitch: str, speed: str,
                               text: str) -> str:
        """Voice-creation prompt (reference spark.py:171-216)."""
        assert gender in GENDER_MAP and pitch in LEVELS_MAP \
            and speed in LEVELS_MAP
        attrs = (f"<|gender_{GENDER_MAP[gender]}|>"
                 f"<|pitch_label_{LEVELS_MAP[pitch]}|>"
                 f"<|speed_label_{LEVELS_MAP[speed]}|>")
        return "".join([TASK_TOKEN_MAP["controllable_tts"],
                        "<|start_content|>", text, "<|end_content|>",
                        "<|start_style_label|>", attrs,
                        "<|end_style_label|>"])

    def tokenize_ref(self, ref_audio) -> Tuple[np.ndarray, np.ndarray]:
        """Reference audio -> (global tokens, semantic tokens) via
        wav2vec2 feature mix + BiCodec (reference audio_tokenizer.py)."""
        if self.bicodec is None:
            raise ValueError("BiCodec audio tokenizer not loaded; voice "
                             "cloning requires the BiCodec/ assets")
        wav = self._load_ref(ref_audio)
        bc = self.bicodec.config
        ref_len = (int(bc.sample_rate * bc.ref_segment_duration)
                   // bc.latent_hop_length * bc.latent_hop_length)
        ref = np.tile(wav, ref_len // len(wav) + 1)[:ref_len] \
            if len(wav) < ref_len else wav[:ref_len]
        feat = self.extract_wav2vec2_features(wav)
        glob, sem = self.bicodec.tokenize(feat, ref[None])
        return glob, sem

    def _load_ref(self, ref_audio) -> np.ndarray:
        if isinstance(ref_audio, (str, Path)):
            from ....utils import load_audio

            return np.asarray(load_audio(
                str(ref_audio), sample_rate=self.sample_rate,
                volume_normalize=True), np.float32)
        return np.asarray(ref_audio, np.float32).reshape(-1)

    def extract_wav2vec2_features(self, wav: np.ndarray) -> np.ndarray:
        """Mix of wav2vec2 hidden states 11/14/16 (audio_tokenizer.py:75)."""
        if self._w2v is None:
            raise ValueError("wav2vec2 feature extractor not loaded")
        from ....stt.models.wav2vec.wav2vec import wav2vec2_forward

        params, cfg = self._w2v
        x = np.asarray(wav, np.float32).reshape(1, -1)
        x = (x - x.mean()) / (x.std() + 1e-7)   # Wav2Vec2FeatureExtractor
        _, _, hidden = wav2vec2_forward(params, cfg, jnp.asarray(x),
                                        jnp.asarray([x.shape[1]]),
                                        collect_hidden=True)
        return np.asarray((hidden[11] + hidden[14] + hidden[16]) / 3.0)

    # -------------------------------------------------------------- decode

    def _decode_fn(self, pb: int, max_tokens: int, temperature: float,
                   top_k: int, top_p: float, repetition_penalty: float):
        key_ = ("decode", pb, max_tokens, temperature, top_k, top_p,
                repetition_penalty)
        fn = self._jit_cache.get(key_)
        if fn is not None:
            return fn
        cfg = self.config
        from ....ops.sampling import (apply_repetition_penalty,
                                      top_k_top_p_filter)

        def sample(k, lg):
            lg = lg.astype(jnp.float32)
            if temperature == 0.0:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(lg / temperature, top_k=top_k,
                                    top_p=top_p)
            return jax.random.categorical(k, lg, axis=-1).astype(jnp.int32)

        def decode(params, prompt, plen, key):
            cap = pb + max_tokens
            caches = init_caches(cfg, 1, cap, dtype=jnp.bfloat16)
            pad_mask = jnp.where(jnp.arange(cap)[None] < plen, 0.0, -jnp.inf)
            hidden, caches = llama_forward(params, cfg, prompt,
                                           caches=caches, offset=0,
                                           mask=pad_mask)
            last = logits_from_hidden(
                params, cfg, hidden[jnp.arange(1), plen - 1][:, None])[:, 0]
            toks0 = jnp.full((max_tokens,), STOP_TOKEN_ID, jnp.int32)
            hist0 = jnp.full((1, REP_CONTEXT), -1, jnp.int32)

            def cond(st):
                i, _, _, _, _, done, _ = st
                return jnp.logical_and(i < max_tokens, jnp.logical_not(done))

            def body(st):
                i, lg, caches, toks, hist, done, key = st
                if repetition_penalty != 1.0:
                    lg = apply_repetition_penalty(lg, hist,
                                                  repetition_penalty)
                key, k0 = jax.random.split(key)
                tok = sample(k0, lg)[0]
                is_stop = jnp.logical_or(tok == STOP_TOKEN_ID,
                                         tok == cfg.eos_token_id)
                toks = jnp.where(is_stop, toks, toks.at[i].set(tok))
                hist = jnp.roll(hist, -1, axis=-1).at[:, -1].set(tok)
                lg2, caches = decode_step(params, cfg, tok[None, None],
                                          caches, plen + i)
                return (i + 1, lg2, caches, toks, hist,
                        jnp.logical_or(done, is_stop), key)

            i, _, _, toks, _, done, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), last, caches, toks0, hist0,
                             jnp.bool_(False), key))
            return toks, jnp.where(done, i - 1, i)

        fn = jax.jit(lambda p, prompt, plen, key: decode(p, prompt, plen,
                                                         key))
        self._jit_cache[key_] = fn
        return fn

    # ------------------------------------------------------------ generate

    def generate(
        self,
        text: str,
        *,
        ref_audio=None,
        ref_text: Optional[str] = None,
        gender: str = "male",
        pitch: float = 1.0,
        speed: float = 1.0,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        repetition_penalty: float = 1.3,
        max_tokens: int = 3000,
        split_pattern: str = "\n",
        seed: int = 0,
        verbose: bool = False,
        **kwargs,
    ):
        """Yield one GenerationResult per text split (reference :218)."""
        if self.tokenizer is None:
            raise ValueError("text tokenizer not loaded")
        if ref_audio is not None:
            gender = None
        pitch_f = PITCH_MAP.get(pitch, pitch if isinstance(pitch, str)
                                else "moderate")
        speed_f = SPEED_MAP.get(speed, speed if isinstance(speed, str)
                                else "moderate")

        for seg_idx, piece in enumerate(text.split(split_pattern)):
            if not piece.strip():
                continue
            t0 = time.time()
            global_ids = None
            if gender is not None:
                prompt = self.process_prompt_control(gender, pitch_f,
                                                     speed_f, piece)
            else:
                prompt, global_ids = self.process_prompt(piece, ref_audio,
                                                         ref_text)
            ids = np.asarray(self.tokenizer.encode(
                prompt, add_special_tokens=False), np.int32).reshape(1, -1)
            plen = ids.shape[1]
            pb = _bucket(plen, PROMPT_BUCKETS)
            ids_pad = np.zeros((1, pb), np.int32)
            ids_pad[0, :plen] = ids

            fn = self._decode_fn(pb, max_tokens, temperature, top_k, top_p,
                                 repetition_penalty)
            toks, count = fn(self.params, jnp.asarray(ids_pad),
                             jnp.int32(plen),
                             jax.random.PRNGKey(seed + seg_idx))
            generated = np.asarray(toks)[: int(count)].tolist()
            predicts = self.tokenizer.decode(generated,
                                             skip_special_tokens=False)
            semantic = [int(t) for t in
                        re.findall(r"bicodec_semantic_(\d+)", predicts)]
            if gender is not None:
                global_ids = np.asarray(
                    [[int(t) for t in
                      re.findall(r"bicodec_global_(\d+)", predicts)]])
            if not semantic or global_ids is None or global_ids.size == 0:
                continue
            if self.bicodec is None:
                raise ValueError("BiCodec audio tokenizer not loaded")
            audio = self.bicodec.detokenize(
                np.asarray([semantic], np.int32),
                np.asarray(global_ids, np.int32))[0]
            dt = time.time() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=np.asarray(audio), samples=len(audio),
                sample_rate=self.sample_rate, segment_idx=seg_idx,
                token_count=len(semantic),
                audio_duration=format_duration(dur),
                real_time_factor=round(dur / dt, 3) if dt > 0 else 0.0,
                prompt={"tokens": len(semantic),
                        "tokens-per-sec": round(len(semantic) / dt, 2)
                        if dt > 0 else 0},
                audio_samples={"samples": len(audio),
                               "samples-per-sec": round(len(audio) / dt, 2)
                               if dt > 0 else 0},
                processing_time_seconds=dt,
                peak_memory_usage=peak_memory_gb())


# --------------------------------------------------------------- asset load

def _load_bicodec(bdir: Path, model_dir: Path) -> BiCodec:
    import json

    cfg_dict = {}
    ycfg = bdir / "config.yaml"
    if ycfg.exists():
        try:
            import yaml

            raw = yaml.safe_load(ycfg.read_text())
            cfg_dict = raw.get("audio_tokenizer", raw)
        except Exception:
            cfg_dict = {}
    jcfg = bdir / "config.json"
    if jcfg.exists():
        cfg_dict = json.loads(jcfg.read_text())
    at_cfg = model_dir / "audio_tokenizer_config.yaml"
    if at_cfg.exists():
        try:
            import yaml

            top = yaml.safe_load(at_cfg.read_text()) or {}
            for k in ("sample_rate", "ref_segment_duration",
                      "latent_hop_length", "volume_normalize"):
                if k in top:
                    cfg_dict[k] = top[k]
        except Exception:
            pass
    bc = BiCodec(BiCodecConfig.from_dict(cfg_dict))
    weights = {}
    for f in sorted(bdir.glob("*.safetensors")):
        from safetensors.numpy import load_file

        weights.update({k: jnp.asarray(v)
                        for k, v in load_file(str(f)).items()})
    if weights:
        from ....utils import unflatten

        bc.bind(unflatten(bc.sanitize(weights)))
    else:
        bc.init_and_bind()
    return bc


def _load_wav2vec2(wdir: Path):
    import json

    from safetensors.numpy import load_file

    from ....stt.models.wav2vec.wav2vec import (
        ModelConfig as W2VConfig,
        init_wav2vec2,
        sanitize_wav2vec2,
    )
    from ....utils import unflatten

    cfg = W2VConfig.from_dict(json.loads((wdir / "config.json").read_text()))
    weights = {}
    for f in sorted(wdir.glob("*.safetensors")):
        weights.update(load_file(str(f)))
    params = unflatten(sanitize_wav2vec2(weights))
    return params, cfg


__all__ = ["Model", "ModelConfig"]
