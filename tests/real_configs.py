"""REAL published-checkpoint configs for the flagship families.

Unlike tiny_configs.py (shrunken dims for fast shape tests), these are the
exact dims of the shipping checkpoints, used by the checkpoint-manifest
tests (key+shape mapping validated via jax.eval_shape — no weight
materialization) and by bench.py. Dims sourced from each model's published
config.json as consumed by the reference implementation (cited per family).
"""


def real_kokoro_config():
    """hexgrad/Kokoro-82M (reference kokoro.py:118-176 config consumption)."""
    from mlx_audio_tpu.tts.models.kokoro import ModelConfig

    vocab = {c: i + 1 for i, c in enumerate(
        "abcdefghijklmnopqrstuvwxyz ˈˌəɹʃʒðθæɑɔɛɜɪʊʌiuAIOWY.,!?;:'\"-")}
    return ModelConfig(
        istftnet=dict(
            resblock_kernel_sizes=[3, 7, 11], upsample_rates=[10, 6],
            upsample_initial_channel=512,
            resblock_dilation_sizes=[[1, 3, 5]] * 3,
            upsample_kernel_sizes=[20, 12], gen_istft_n_fft=20,
            gen_istft_hop_size=5),
        dim_in=64, hidden_dim=512, max_conv_dim=512, max_dur=50,
        n_layer=3, n_mels=80, n_token=178, style_dim=128,
        text_encoder_kernel_size=5,
        plbert=dict(num_hidden_layers=12, num_attention_heads=12,
                    hidden_size=768, intermediate_size=2048,
                    max_position_embeddings=512, embedding_size=128,
                    dropout=0.1),
        vocab=vocab)
