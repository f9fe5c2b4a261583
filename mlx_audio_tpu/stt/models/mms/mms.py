"""MMS: massively-multilingual CTC speech recognition over Wav2Vec2.

Parity: reference mlx_audio/stt/models/mms/mms.py — wav2vec2 backbone +
`lm_head` CTC projection (:15-31), greedy CTC collapse (:33-45), vocab /
per-language adapter loading in post_load_hook (:130-163), and generate()
returning STTOutput with zero-mean unit-variance input normalization
(:55-105).

TPU design: the waveform is padded to a length bucket and the whole
(normalize -> conv features -> transformer -> lm_head -> argmax) pipeline
is one jitted program per bucket; the greedy CTC collapse is a vectorized
host pass over the downloaded argmax ids (a few bytes per 20 ms frame).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import init_linear, apply_linear
from ..base import STTOutput
from ..wav2vec import (ModelConfig, feature_lengths, init_wav2vec2,
                       sanitize_wav2vec2, wav2vec2_forward)

Array = jax.Array

LENGTH_BUCKETS = (16000, 48000, 160000, 480000)   # 1 s / 3 s / 10 s / 30 s


def _bucket(n: int) -> int:
    for b in LENGTH_BUCKETS:
        if n <= b:
            return b
    return ((n + 159999) // 160000) * 160000


def ctc_collapse(ids: np.ndarray, length: int, blank: int = 0) -> List[int]:
    """Greedy CTC: drop repeats then blanks (vectorized)."""
    ids = np.asarray(ids[:length])
    if ids.size == 0:
        return []
    keep = np.ones(ids.shape, bool)
    keep[1:] = ids[1:] != ids[:-1]
    ids = ids[keep]
    return ids[ids != blank].tolist()


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._vocab: Optional[Dict[int, str]] = None
        self._fwd_cache: Dict[int, callable] = {}

    @property
    def sample_rate(self) -> int:
        return 16000

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {"wav2vec2": init_wav2vec2(k1, self.config),
                "lm_head": init_linear(k2, self.config.hidden_size,
                                       self.config.vocab_size)}

    def _forward_fn(self, bucket: int):
        fn = self._fwd_cache.get(bucket)
        if fn is None:
            cfg = self.config

            def run(p, wave, n):
                mask = (jnp.arange(wave.shape[1])[None, :] < n[:, None]) \
                    .astype(wave.dtype)
                denom = jnp.maximum(n[:, None].astype(wave.dtype), 1.0)
                mean = (wave * mask).sum(-1, keepdims=True) / denom
                var = (jnp.square(wave - mean) * mask).sum(
                    -1, keepdims=True) / denom
                wave = (wave - mean) * jax.lax.rsqrt(var + 1e-7) * mask
                h, frames = wav2vec2_forward(p["wav2vec2"], cfg, wave, n)
                logits = apply_linear(p["lm_head"], h)
                return jnp.argmax(logits, axis=-1), frames

            fn = jax.jit(run)
            self._fwd_cache[bucket] = fn
        return fn

    def transcribe_ids(self, audio: np.ndarray) -> List[int]:
        """mono waveform -> CTC-collapsed token ids."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        n = len(audio)
        if n == 0:
            return []
        b = _bucket(n)
        wave = np.zeros((1, b), np.float32)
        wave[0, :n] = audio
        ids, frames = self._forward_fn(b)(
            self.params, jnp.asarray(wave), jnp.asarray([n]))
        return ctc_collapse(np.asarray(ids[0]), int(frames[0]),
                            blank=self.config.pad_token_id)

    def _tokens_to_text(self, tokens: List[int]) -> str:
        if self._vocab is None:
            return " ".join(str(t) for t in tokens)
        return "".join(self._vocab.get(t, "") for t in tokens) \
            .replace("|", " ")

    def generate(self, audio, *, verbose: bool = False, **kwargs
                 ) -> STTOutput:
        t0 = time.time()
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio
            audio = load_audio(str(audio), self.sample_rate)
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.reshape(-1)
        tokens = self.transcribe_ids(audio)
        text = self._tokens_to_text(tokens).strip()
        if verbose:
            print(f"Text: {text}")
        return STTOutput(
            text=text,
            segments=[{"text": text, "start": 0.0, "end": 0.0}],
            total_time=time.time() - t0)

    __call__ = generate

    # loading ---------------------------------------------------------

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        head = {}
        for k, v in weights.items():
            if k.startswith("lm_head."):
                head[k] = v
            else:
                out[k] = v
        out = sanitize_wav2vec2(out, strip_prefix=False)
        # backbone keys live under wav2vec2.*; add prefix if absent
        fixed = {}
        for k, v in out.items():
            if not k.startswith("wav2vec2."):
                k = "wav2vec2." + k
            fixed[k] = v
        fixed.update(head)
        return fixed

    @staticmethod
    def post_load_hook(model: "Model", model_path: Path) -> "Model":
        """Merge a per-language adapter and pick up vocab.json."""
        from ....utils import flatten, unflatten
        model_path = Path(model_path)

        adapters = sorted(model_path.glob("adapter.*.safetensors"))
        preferred = model_path / "adapter.eng.safetensors"
        adapter_path = preferred if preferred.exists() else \
            (adapters[0] if adapters else None)
        if adapter_path is not None:
            from safetensors.numpy import load_file
            extra = model.sanitize(load_file(str(adapter_path)))
            flat = flatten(model.params)
            for k, v in extra.items():
                if k in flat:
                    flat[k] = jnp.asarray(v)
            model.bind(unflatten(flat))

        vocab_path = model_path / "vocab.json"
        if vocab_path.exists():
            vocab = json.loads(vocab_path.read_text())
            if isinstance(next(iter(vocab.values())), dict):
                vocab = vocab.get("eng", vocab.get(
                    "en", next(iter(vocab.values()))))
            model._vocab = {v: k for k, v in vocab.items()}
        return model


__all__ = ["Model", "ModelConfig", "ctc_collapse"]
