"""Benchmark: Kokoro-82M-class TTS real-time factor on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): Kokoro-82M bf16 >= 50x real-time per v5e chip,
so vs_baseline = xRT / 50.

Random-initialized full-size params (real weights unavailable offline — same
FLOPs/memory traffic as the checkpoint).
"""

import json
import time

import numpy as np


def build_model():
    from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig

    vocab = {c: i + 1 for i, c in enumerate(
        "abcdefghijklmnopqrstuvwxyz ˈˌəɹʃʒðθæɑɔɛɜɪʊʌiuAIOWY.,!?;:'\"-")}
    # published Kokoro-82M config (docs/hexgrad Kokoro-82M config.json)
    cfg = ModelConfig(
        istftnet=dict(
            resblock_kernel_sizes=[3, 7, 11],
            upsample_rates=[10, 6],
            upsample_initial_channel=512,
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
            upsample_kernel_sizes=[20, 12],
            gen_istft_n_fft=20,
            gen_istft_hop_size=5,
        ),
        dim_in=64, hidden_dim=512, max_conv_dim=512, max_dur=50,
        n_layer=3, n_mels=80, n_token=178, style_dim=128,
        text_encoder_kernel_size=5,
        plbert=dict(
            num_hidden_layers=12, num_attention_heads=12, hidden_size=768,
            intermediate_size=2048, max_position_embeddings=512,
            embedding_size=128, dropout=0.1),
        vocab=vocab,
    )
    return Model(cfg).init_and_bind()


def main():
    model = build_model()
    rng = np.random.RandomState(0)
    ref_s = (rng.randn(1, 256) * 0.1).astype(np.float32)
    # ~190-phoneme utterance (a decently long sentence)
    alphabet = list(model.vocab.keys())
    phonemes = "".join(rng.choice(alphabet[:30]) for _ in range(190))

    # warmup (compiles frontend + acoustic bucket)
    audio, _ = model(phonemes, ref_s, deterministic_noise=True)
    n_samples = len(audio)

    runs = 5
    t0 = time.perf_counter()
    for _ in range(runs):
        audio, _ = model(phonemes, ref_s, deterministic_noise=True)
    wall = (time.perf_counter() - t0) / runs

    audio_seconds = n_samples / model.config.sample_rate
    xrt = audio_seconds / wall
    print(json.dumps({
        "metric": "kokoro_82m_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
