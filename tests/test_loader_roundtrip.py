"""On-disk loader roundtrip: a torch-layout checkpoint written exactly in the
published file layout must load through the real `load_model` pipeline and
generate finite audio (VERDICT r3 next #6 — real-checkpoint readiness).

The checkpoint is synthesized at tiny dims by the SAME parameterized
generators that emit the full-size manifests
(tools/gen_checkpoint_manifests.py), so the torch key/shape layout under
test is the published one, not something derived from our sanitize().

Published qwen3_tts layout (reference qwen3_tts.py:2850-2878):
  model.safetensors            talker.* + speaker_encoder.*
  config.json                  talker_config (+ NO tokenizer_config)
  speech_tokenizer/
    config.json                encoder_config/decoder_config
    model.safetensors          decoder.* (+ encoder.*)
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

TINY_TALKER = dict(
    vocab_size=300, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=8, num_code_groups=4, text_hidden_size=48,
    text_vocab_size=500, codec_eos_token_id=280, codec_think_id=284,
    codec_nothink_id=285, codec_think_bos_id=286, codec_think_eos_id=287,
    codec_pad_id=278, codec_bos_id=279,
    code_predictor_config=dict(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, num_code_groups=4),
)
TINY_DECODER = dict(
    latent_dim=32, codebook_dim=16, codebook_size=256, decoder_dim=64,
    hidden_size=24, intermediate_size=48, head_dim=8, num_attention_heads=3,
    num_hidden_layers=2, num_key_value_heads=3, num_quantizers=4,
    num_semantic_quantizers=1, sliding_window=16, upsample_rates=[4, 3],
    upsampling_ratios=[2, 2])
TINY_SPEAKER_ENC = dict(
    mel_dim=16, enc_dim=16, enc_channels=[8, 8, 8, 8, 24],
    enc_kernel_sizes=[5, 3, 3, 3, 1], enc_dilations=[1, 2, 3, 4, 1],
    enc_attention_channels=8, enc_res2net_scale=2, enc_se_channels=8)


def _materialize(manifest, seed):
    rng = np.random.RandomState(seed)
    return {k: (rng.standard_normal(s) * 0.02).astype(np.float32)
            for k, s in manifest.items()}


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    from gen_checkpoint_manifests import (qwen3_tts_main_manifest,
                                          qwen3_tts_speech_tokenizer_manifest)
    from mlx_audio_tpu.tts.models.qwen3_tts.config import ModelConfig

    cfg = ModelConfig(
        talker_config=dict(TINY_TALKER),
        speaker_encoder_config=dict(TINY_SPEAKER_ENC),
        tokenizer_config=dict(decoder_config=dict(TINY_DECODER)))
    root = tmp_path_factory.mktemp("qwen3_tts_ckpt")
    save_file(_materialize(qwen3_tts_main_manifest(cfg), 0),
              str(root / "model.safetensors"))
    # published main config carries NO tokenizer_config — the codec config
    # is read from the subfolder by post_load_hook (ref qwen3_tts.py:2850)
    (root / "config.json").write_text(json.dumps(dict(
        model_type="qwen3_tts", talker_config=TINY_TALKER,
        speaker_encoder_config=TINY_SPEAKER_ENC)))
    st = root / "speech_tokenizer"
    st.mkdir()
    save_file(_materialize(
        qwen3_tts_speech_tokenizer_manifest(cfg, include_encoder=False), 1),
        str(st / "model.safetensors"))
    (st / "config.json").write_text(json.dumps(dict(
        model_type="qwen3_tts_tokenizer",
        decoder_config=TINY_DECODER)))
    return root


@pytest.fixture(scope="module")
def loaded(checkpoint_dir):
    from mlx_audio_tpu.utils import load_model

    return load_model(str(checkpoint_dir))


class TestQwen3TTSLoaderRoundtrip:
    def test_decoder_config_comes_from_subfolder(self, loaded):
        """Main config.json has no tokenizer_config; post_load_hook must
        rebuild it from speech_tokenizer/config.json."""
        assert loaded.dcfg.decoder_dim == 64
        assert loaded.dcfg.upsample_rates == [4, 3]
        assert loaded.total_upsample == 4 * 3 * 2 * 2

    def test_all_params_bound_with_init_shapes(self, loaded):
        """Every leaf init_params would build must be bound, same shape —
        the strict=True contract for a real download."""
        import jax

        from mlx_audio_tpu.utils import flatten

        expected = {k: v.shape for k, v in flatten(jax.eval_shape(
            loaded.init_params, jax.random.PRNGKey(0))).items()}
        got = {k: tuple(v.shape)
               for k, v in flatten(loaded.params).items()}
        missing = sorted(set(expected) - set(got))
        mismatch = {k: (expected[k], got[k])
                    for k in set(expected) & set(got)
                    if tuple(expected[k]) != got[k]}
        assert not missing, missing[:10]
        assert not mismatch, dict(list(mismatch.items())[:5])

    def test_generate_produces_finite_audio(self, loaded):
        text_ids = np.arange(3, 11)[None]
        results = list(loaded.generate(
            text_ids=text_ids, temperature=0.0, max_tokens=8,
            split_pattern=None))
        assert results, "no GenerationResult yielded"
        audio = np.concatenate([np.asarray(r.audio).ravel()
                                for r in results])
        assert audio.size > 0 and np.isfinite(audio).all()
