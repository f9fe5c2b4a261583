"""Cohere ASR: tiny-config shape/behavior tests (no weights).

Covers the batched compiled greedy decode, energy/VAD chunking, frontend
normalization, prompt construction, and sanitize key/layout mapping
(reference /root/reference/mlx_audio/stt/models/cohere_asr/).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.stt.models.cohere_asr import Model, ModelConfig
from mlx_audio_tpu.stt.models.cohere_asr.cohere_asr import (
    join_chunk_texts,
    segment_with_silero,
    split_audio_chunks_energy,
)


def tiny_config(**over):
    cfg = dict(
        vocab_size=64,
        encoder=dict(feat_in=20, n_layers=2, d_model=32, n_heads=4,
                     ff_expansion_factor=2, subsampling_factor=8,
                     subsampling_conv_channels=8, conv_kernel_size=9),
        transf_decoder=dict(config_dict=dict(
            hidden_size=24, inner_size=48, num_attention_heads=4,
            num_layers=2, max_sequence_length=128)),
        head=dict(hidden_size=24, num_classes=64, log_softmax=True),
        preprocessor=dict(features=20, n_fft=128, window_size=0.008,
                          window_stride=0.004),
        max_audio_clip_s=2.0, overlap_chunk_second=0.5,
        min_energy_window_samples=160, batch_size=2)
    cfg.update(over)
    return ModelConfig.from_dict(cfg)


class FakeTokenizer:
    def __init__(self):
        specials = ["<|startofcontext|>", "<|startoftranscript|>",
                    "<|emo:undefined|>", "<|en|>", "<|ja|>", "<|pnc|>",
                    "<|nopnc|>", "<|noitn|>", "<|notimestamp|>",
                    "<|nodiarize|>", "<|endoftext|>"]
        self.token2id = {s: i for i, s in enumerate(specials)}
        self.eos_id = self.token2id["<|endoftext|>"]

    def decode(self, ids):
        return " ".join(f"t{i}" for i in ids)


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_config()).init_and_bind()
    m._tokenizer = FakeTokenizer()
    return m


class TestChunking:
    def test_short_audio_single_chunk(self):
        chunks = split_audio_chunks_energy(np.zeros(1000), 16000, 2.0, 0.5,
                                           160)
        assert chunks == [(0, 1000)]

    def test_long_audio_splits_at_quiet_window(self):
        sr = 16000
        x = np.ones(5 * sr, np.float32)
        # a silent valley inside the final-overlap search region of chunk 1
        x[int(1.6 * sr):int(1.8 * sr)] = 0.0
        chunks = split_audio_chunks_energy(x, sr, 2.0, 0.5, 160)
        assert len(chunks) >= 2
        s, e = chunks[0]
        assert int(1.5 * sr) <= e <= int(2.0 * sr)
        # contiguous cover
        assert chunks[0][0] == 0 and chunks[-1][1] == len(x)
        for (a, b), (c, d) in zip(chunks, chunks[1:]):
            assert b == c

    def test_join_chunk_texts(self):
        assert join_chunk_texts(["a", " b ", ""], "en") == "a b"
        assert join_chunk_texts(["a", "b"], "ja") == "ab"


class TestGenerate:
    def test_generate_short(self, model):
        sr = model.sample_rate
        out = model.generate(np.random.RandomState(0).randn(sr // 2)
                             .astype(np.float32), language="en",
                             max_tokens=8)
        assert isinstance(out.text, str)
        assert out.generation_tokens <= 8
        assert len(out.segments) == 1
        assert out.total_time > 0

    def test_generate_long_batches_chunks(self, model):
        sr = model.sample_rate
        x = np.random.RandomState(1).randn(5 * sr).astype(np.float32) * 0.1
        out = model.generate(x, language="en", max_tokens=6)
        assert len(out.segments) >= 3
        assert out.segments[-1]["end"] == pytest.approx(5.0, abs=0.01)

    def test_unsupported_language_raises(self, model):
        with pytest.raises(ValueError):
            model.generate(np.zeros(100, np.float32), language="xx")

    def test_stream_raises(self, model):
        with pytest.raises(NotImplementedError):
            model.generate(np.zeros(100, np.float32), stream=True)

    def test_batch_rows_match_single(self, model):
        """A segment decoded inside a batch == decoded alone (padding and
        per-row EOS masking must not leak across rows)."""
        sr = model.sample_rate
        rng = np.random.RandomState(2)
        a = rng.randn(sr // 2).astype(np.float32) * 0.1
        b = rng.randn(sr // 4).astype(np.float32) * 0.1
        texts, _, _ = model._transcribe_segments([a, b], "en", True, 2, 6)
        ta, _, _ = model._transcribe_segments([a], "en", True, 1, 6)
        tb, _, _ = model._transcribe_segments([b], "en", True, 1, 6)
        assert texts == [ta[0], tb[0]]

    def test_transcribe_multi_file_api(self, model):
        sr = model.sample_rate
        rng = np.random.RandomState(3)
        outs = model.transcribe(
            language="en",
            audio_arrays=[rng.randn(sr // 2).astype(np.float32),
                          rng.randn(sr // 3).astype(np.float32)],
            sample_rates=[sr, sr], max_tokens=6)
        assert len(outs) == 2 and all(isinstance(t, str) for t in outs)


class TestFrontend:
    def test_log_mel_shape_and_norm(self, model):
        sr = model.sample_rate
        mel, n = model._log_mel(np.random.RandomState(0).randn(sr // 4))
        assert mel.shape == (n, 20)
        # per-feature normalized over valid frames
        np.testing.assert_allclose(mel.mean(axis=0), 0.0, atol=1e-3)


class TestVadSegmentation:
    def test_segment_with_fake_vad(self):
        class FakeVad:
            def predict_proba(self, audio, sr):
                n = len(audio) // 512
                p = np.zeros(n, np.float32)
                p[: n // 3] = 0.9          # speech at the start
                p[2 * n // 3:] = 0.9       # and at the end
                return p

        sr = 16000
        x = np.zeros(10 * sr, np.float32)
        spans = segment_with_silero(x, FakeVad(), sr, merge_gap_s=0.5,
                                    max_chunk_s=30.0)
        assert len(spans) == 2
        assert spans[0][0] == 0
        assert spans[1][1] <= len(x)


class TestSanitize:
    def test_reference_keys_bind(self):
        """torch/NeMo-named weights map onto the param tree exactly."""
        cfg = tiny_config()
        model = Model(cfg).init_and_bind()

        def flatten(d, prefix=""):
            out = {}
            for k, v in d.items():
                p = f"{prefix}.{k}" if prefix else k
                if isinstance(v, dict):
                    out.update(flatten(v, p))
                else:
                    out[p] = v
            return out

        tree = flatten(model.params)
        inv_sub = {"layers.00_conv.": "conv.0.", "layers.01_dw.": "conv.2.",
                   "layers.02_pw.": "conv.3.", "layers.03_dw.": "conv.5.",
                   "layers.04_pw.": "conv.6."}
        ref = {}
        for k, v in tree.items():
            v = np.asarray(v)
            rk = k
            for new, old in inv_sub.items():
                rk = rk.replace("pre_encode." + new, "pre_encode." + old)
            rk = rk.replace("decoder.blocks.", "transf_decoder.decoder.layers.")
            rk = rk.replace("decoder.final_norm.",
                            "transf_decoder.decoder.final_layer_norm.")
            rk = rk.replace("decoder.embedding_layer_norm.",
                            "transf_decoder.embedding.layer_norm.")
            rk = rk.replace("decoder.embedding.",
                            "transf_decoder.embedding.token_embedding.")
            rk = rk.replace(".self_attn_norm.", ".layer_norm_1.")
            rk = rk.replace(".cross_attn_norm.", ".layer_norm_2.")
            rk = rk.replace(".ff_norm.", ".layer_norm_3.")
            rk = rk.replace(".self_attn.q_proj.",
                            ".first_sub_layer.query_net.")
            rk = rk.replace(".self_attn.k_proj.", ".first_sub_layer.key_net.")
            rk = rk.replace(".self_attn.v_proj.",
                            ".first_sub_layer.value_net.")
            rk = rk.replace(".self_attn.out_proj.",
                            ".first_sub_layer.out_projection.")
            rk = rk.replace(".cross_attn.q_proj.",
                            ".second_sub_layer.query_net.")
            rk = rk.replace(".cross_attn.k_proj.",
                            ".second_sub_layer.key_net.")
            rk = rk.replace(".cross_attn.v_proj.",
                            ".second_sub_layer.value_net.")
            rk = rk.replace(".cross_attn.out_proj.",
                            ".second_sub_layer.out_projection.")
            rk = rk.replace(".ff1.", ".third_sub_layer.dense_in.")
            rk = rk.replace(".ff2.", ".third_sub_layer.dense_out.")
            rk = rk.replace("decoder.output_proj.", "log_softmax.mlp.layer0.")
            rk = rk.replace("encoder_proj.", "encoder_decoder_proj.")
            if rk.endswith("weight") and v.ndim == 4:      # HWIO -> OIHW
                v = np.transpose(v, (3, 2, 0, 1))
            elif rk.endswith("weight") and v.ndim == 3 and (
                    ".conv" in rk or "pre_encode" in rk):  # KIO -> OIK
                v = np.transpose(v, (2, 1, 0))
            ref[rk] = v
        ref["encoder.layers.0.conv.batch_norm.num_batches_tracked"] = \
            np.zeros(())
        ref["preprocessor.featurizer.fb"] = np.zeros((20, 65))

        sanitized = model.sanitize(ref)
        assert set(sanitized) == set(tree)
        for k in tree:
            assert sanitized[k].shape == np.asarray(tree[k]).shape, k
