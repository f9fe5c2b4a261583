"""MMS-LID: spoken language identification via Wav2Vec2.

Parity: reference mlx_audio/lid/models/wav2vec2/wav2vec_lid.py —
Wav2Vec2ForSequenceClassification: backbone -> projector -> masked mean
pool -> classifier (:38-64), zero-mean unit-variance input normalization
and top-k (lang, prob) output in predict (:104-150); config extension with
classifier_proj_size / num_labels / id2label (config.py:9-17).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import apply_linear, init_linear
from ....stt.models.wav2vec import (ModelConfig as Wav2Vec2Config,
                               init_wav2vec2, sanitize_wav2vec2,
                               wav2vec2_forward)

Array = jax.Array


@dataclass
class ModelConfig(Wav2Vec2Config):
    classifier_proj_size: int = 256
    num_labels: int = 2
    id2label: Optional[Dict[str, str]] = None

    def __post_init__(self):
        if self.id2label is not None:
            self.num_labels = len(self.id2label)


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._fwd_cache: Dict[int, callable] = {}

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cfg = self.config
        return {
            "wav2vec2": init_wav2vec2(k1, cfg),
            "projector": init_linear(k2, cfg.hidden_size,
                                     cfg.classifier_proj_size),
            "classifier": init_linear(k3, cfg.classifier_proj_size,
                                      cfg.num_labels),
        }

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
                proj = apply_linear(p["projector"], h)
                fmask = (jnp.arange(proj.shape[1])[None, :]
                         < frames[:, None]).astype(proj.dtype)[..., None]
                pooled = (proj * fmask).sum(1) / jnp.maximum(
                    fmask.sum(1), 1.0)
                return jax.nn.softmax(
                    apply_linear(p["classifier"], pooled), axis=-1)

            fn = jax.jit(run)
            self._fwd_cache[bucket] = fn
        return fn

    def predict(self, audio, top_k: int = 5) -> List[Tuple[str, float]]:
        """mono waveform (or file path) -> top-k (language, prob)."""
        if isinstance(audio, str):
            from ....stt.utils import load_audio
            audio = load_audio(audio, 16000)
        audio = np.asarray(audio, np.float32).reshape(-1)
        from ....stt.models.mms.mms import _bucket  # shared length buckets
        n = len(audio)
        b = _bucket(max(n, 1))
        wave = np.zeros((1, b), np.float32)
        wave[0, :n] = audio
        probs = np.asarray(self._forward_fn(b)(
            self.params, jnp.asarray(wave), jnp.asarray([n])))[0]
        order = np.argsort(-probs)[:top_k]
        id2label = self.config.id2label or {}
        return [(id2label.get(str(int(i)), f"LABEL_{int(i)}"),
                 float(probs[i])) for i in order]

    __call__ = predict

    def sanitize(self, weights: Dict) -> Dict:
        # keep the wav2vec2. prefix (the head lives beside it) and drop
        # training-only tensors; lm_head never exists on LID checkpoints
        return sanitize_wav2vec2(
            {k: v for k, v in weights.items()
             if not k.startswith("lm_head.")}, strip_prefix=False)


__all__ = ["Model", "ModelConfig"]
