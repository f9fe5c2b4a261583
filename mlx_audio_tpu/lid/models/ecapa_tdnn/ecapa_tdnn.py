"""ECAPA-TDNN spoken language ID (VoxLingua107, 107 languages).

Parity: /root/reference/mlx_audio/lid/models/ecapa_tdnn/ecapa_tdnn.py
(classifier :23-75, Model :82-163 incl. sentence-mean normalization and
`predict` -> top-k (lang, prob)); mel.py SpeechBrain front-end (periodic
Hamming window, zero center pad, HTK mels, 10*log10, top_db=80).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....dsp import _mel_filters_np, _window_np, frame_signal
from ....model import FunctionalModel
from ....nn import apply_linear, init_linear
from ....codec.models.ecapa_tdnn import (
    EcapaTdnnConfig,
    ecapa_backbone,
    init_ecapa_backbone,
)
from ....codec.models.ecapa_tdnn.ecapa_tdnn import (
    apply_batch_norm,
    init_batch_norm,
)

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 60


def compute_mel_spectrogram(audio: jnp.ndarray) -> jnp.ndarray:
    """SpeechBrain-compatible log-mel: (T,) -> (1, frames, 60)."""
    audio = jnp.asarray(audio, jnp.float32).reshape(-1)
    pad = N_FFT // 2
    x = jnp.pad(audio, (pad, pad))
    w = jnp.asarray(_window_np("hamming", N_FFT + 1, False)[:-1])
    frames = frame_signal(x, N_FFT, HOP_LENGTH) * w
    from ....dsp import rfft_power

    spec = rfft_power(frames)  # fused-jit rfft (TPU-safe when eager)
    fb = jnp.asarray(_mel_filters_np(SAMPLE_RATE, N_FFT, N_MELS, 0.0, None,
                                     None, "htk", False))
    mel = spec @ fb.T
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, db.max() - 80.0)
    return db[None]


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "ecapa_tdnn"
    n_mels: int = 60
    channels: int = 1024
    embedding_dim: int = 256
    kernel_sizes: List[int] = field(default_factory=lambda: [5, 3, 3, 3, 1])
    dilations: List[int] = field(default_factory=lambda: [1, 2, 3, 4, 1])
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    classifier_hidden_dim: int = 512
    num_classes: int = 107
    id2label: Optional[Dict[str, str]] = None
    model_path: str = ""


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.backbone_cfg = EcapaTdnnConfig(
            input_size=config.n_mels, channels=config.channels,
            embed_dim=config.embedding_dim, kernel_sizes=config.kernel_sizes,
            dilations=config.dilations,
            attention_channels=config.attention_channels,
            res2net_scale=config.res2net_scale,
            se_channels=config.se_channels, global_context=True)
        self.id2label = {
            int(k): v.split(":")[0].strip()
            for k, v in (config.id2label or {}).items()}

    def init_params(self, key):
        c = self.config
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "embedding_model": init_ecapa_backbone(k1, self.backbone_cfg),
            "classifier": {
                "norm": init_batch_norm(c.embedding_dim),
                "DNN": {"block_0": {
                    "linear": {"w": init_linear(k2, c.embedding_dim,
                                                c.classifier_hidden_dim)},
                    "norm": init_batch_norm(c.classifier_hidden_dim)}},
                "out": {"w": init_linear(k3, c.classifier_hidden_dim,
                                         c.num_classes)},
            },
        }

    def __call__(self, mel_features: jnp.ndarray) -> jnp.ndarray:
        """mel (B, T, n_mels) -> log-probs (B, num_classes)."""
        p = self.params
        x = mel_features - jnp.mean(mel_features, axis=1, keepdims=True)
        emb = ecapa_backbone(p["embedding_model"], self.backbone_cfg, x)
        c = p["classifier"]
        out = jax.nn.leaky_relu(emb, 0.01)
        out = apply_batch_norm(c["norm"], out)
        out = apply_linear(c["DNN"]["block_0"]["linear"]["w"], out)
        out = apply_batch_norm(c["DNN"]["block_0"]["norm"],
                               jax.nn.leaky_relu(out, 0.01))
        out = apply_linear(c["out"]["w"], out)
        return jnp.log(jax.nn.softmax(out, axis=-1) + 1e-10)

    def predict(self, audio, top_k: int = 5) -> List[Tuple[str, float]]:
        """Raw 16 kHz audio -> top-k (language, probability)."""
        mel = compute_mel_spectrogram(np.asarray(audio, np.float32))
        logp = np.asarray(self(mel))[0]
        probs = np.exp(logp)
        order = np.argsort(probs)[::-1][:top_k]
        return [(self.id2label.get(int(i), str(int(i))), float(probs[i]))
                for i in order]

    def generate(self, audio, top_k: int = 5, **kwargs):
        return self.predict(audio, top_k=top_k)
