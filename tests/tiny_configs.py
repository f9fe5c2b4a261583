"""Shared tiny-config factories for model tests (no weights needed).

Mirrors the reference's dominant test pattern (SURVEY.md §4.1): build real
Model classes from handwritten miniature configs and assert shape/dtype
contracts.
"""

TINY_VOCAB = {
    c: i + 1
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz ˈˌəɹʃʒðθæɑɔɛɜɪʊʌiuAIOWY.,!?")
}


def tiny_kokoro_config():
    from mlx_audio_tpu.tts.models.kokoro import ModelConfig

    return ModelConfig(
        istftnet=dict(
            resblock_kernel_sizes=[3],
            upsample_rates=[4, 4],
            upsample_initial_channel=16,
            resblock_dilation_sizes=[[1, 3, 5]],
            upsample_kernel_sizes=[8, 8],
            gen_istft_n_fft=12,
            gen_istft_hop_size=3,
        ),
        dim_in=16,
        hidden_dim=32,
        max_dur=50,
        n_layer=2,
        n_mels=20,
        n_token=len(TINY_VOCAB) + 1,
        style_dim=16,
        text_encoder_kernel_size=5,
        plbert=dict(
            num_hidden_layers=2,
            num_attention_heads=2,
            hidden_size=24,
            intermediate_size=32,
            max_position_embeddings=128,
            embedding_size=12,
            dropout=0.0,
        ),
        vocab=TINY_VOCAB,
        decoder_bottleneck=24,
        decoder_res_dim=8,
        # exactness-sensitive tests (bucket invariance, sanitize roundtrip)
        # run the f32 path; bf16-vs-f32 agreement has its own test
        compute_dtype="float32",
        transfer_dtype="float32",
    )
