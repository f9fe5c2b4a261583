"""Granite Speech: encoder masking, projector windows, LM multipliers,
decode, sanitize, registry."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.granite_speech import Model, ModelConfig
from mlx_audio_tpu.stt.models.granite_speech.granite_speech import (
    encoder_forward,
    projector_forward,
)


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        encoder_config=dict(input_dim=20, num_layers=2, hidden_dim=32,
                            feedforward_mult=2, num_heads=4, dim_head=8,
                            output_dim=10, context_size=8, max_pos_emb=16,
                            conv_kernel_size=5, conv_expansion_factor=2),
        projector_config=dict(hidden_size=32, num_hidden_layers=1,
                              num_attention_heads=4, intermediate_size=64,
                              encoder_hidden_size=32),
        text_config=dict(model_type="granite", vocab_size=120,
                         hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, rope_theta=10000.0,
                         attention_multiplier=0.125,
                         embedding_multiplier=12.0,
                         residual_multiplier=0.22, logits_scaling=8.0),
        audio_token_index=110, downsample_rate=5, window_size=15))


class FakeTok:
    chat_template = None
    eos_token_id = 2

    def encode(self, text):
        return [3] + [ord(c) % 100 + 4 for c in text][:40]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    m._tokenizer = FakeTok()
    return m


class _Tok2(FakeTok):
    def encode(self, text):
        # count <|audio|> placeholders into audio_token_index ids
        n = text.count("<|audio|>")
        rest = text.replace("<|audio|>", "")
        return [110] * n + [ord(c) % 100 + 4 for c in rest][:20]


class TestEncoder:
    def test_shapes_and_mid_injection(self, model):
        import jax.numpy as jnp

        x = np.random.RandomState(0).randn(1, 16, 20).astype(np.float32)
        out = encoder_forward(model.params, model.config, jnp.asarray(x))
        assert out.shape == (1, 16, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_block_attention_is_local(self):
        """Single layer: perturbing the second context block leaks into the
        first only through the conv's ±(k//2) radius at the boundary."""
        import jax.numpy as jnp

        m2 = Model(tiny_cfg())
        m2.config.enc.num_layers = 1
        m2 = m2.init_and_bind()
        rng = np.random.RandomState(1)
        x = rng.randn(1, 16, 20).astype(np.float32)
        y = x.copy()
        y[0, 12:] += 10.0    # second context block (context=8)
        a = np.asarray(encoder_forward(m2.params, m2.config,
                                       jnp.asarray(x)))
        b = np.asarray(encoder_forward(m2.params, m2.config,
                                       jnp.asarray(y)))
        # attn confines the hit to block 1 (8..15); conv leaks to >= 6
        np.testing.assert_allclose(a[0, :6], b[0, :6], atol=1e-5)
        assert not np.allclose(a[0, 8:], b[0, 8:], atol=1e-3)

    def test_pad_masking_matches_unpadded(self, model):
        import jax.numpy as jnp

        rng = np.random.RandomState(2)
        x = rng.randn(1, 8, 20).astype(np.float32)
        ref = np.asarray(encoder_forward(model.params, model.config,
                                         jnp.asarray(x)))
        padded = np.zeros((1, 16, 20), np.float32)
        padded[:, :8] = x
        got = np.asarray(encoder_forward(model.params, model.config,
                                         jnp.asarray(padded),
                                         jnp.int32(8)))
        np.testing.assert_allclose(got[:, :8], ref, atol=1e-4)


class TestProjector:
    def test_window_count(self, model):
        import jax.numpy as jnp

        enc = np.random.RandomState(3).randn(1, 30, 32).astype(np.float32)
        out = projector_forward(model.params, model.config,
                                jnp.asarray(enc))
        # 30 frames / window 15 = 2 blocks * 3 queries
        assert out.shape == (1, 6, 32)

    def test_windows_independent(self, model):
        import jax.numpy as jnp

        rng = np.random.RandomState(4)
        enc = rng.randn(1, 30, 32).astype(np.float32)
        enc2 = enc.copy()
        enc2[0, 15:] += 5.0
        a = np.asarray(projector_forward(model.params, model.config,
                                         jnp.asarray(enc)))
        b = np.asarray(projector_forward(model.params, model.config,
                                         jnp.asarray(enc2)))
        np.testing.assert_allclose(a[0, :3], b[0, :3], atol=1e-5)
        assert not np.allclose(a[0, 3:], b[0, 3:])


class TestLMMultipliers:
    def test_granite_scales_change_logits(self):
        """Multipliers must reach the backbone: same weights, granite
        scales off vs on -> different logits."""
        import jax
        import jax.numpy as jnp

        from mlx_audio_tpu.tts.models.llama.llama import (
            ModelConfig as LlamaConfig,
            init_llama,
            llama_forward,
            logits_from_hidden,
        )

        base = dict(vocab_size=50, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2)
        c1 = LlamaConfig.from_dict(base)
        c2 = LlamaConfig.from_dict(dict(base, embedding_multiplier=12.0,
                                        residual_multiplier=0.22,
                                        attention_multiplier=0.125,
                                        logits_scaling=8.0))
        p = init_llama(jax.random.PRNGKey(0), c1)
        ids = jnp.asarray([[1, 2, 3]])
        h1, _ = llama_forward(p, c1, ids)
        h2, _ = llama_forward(p, c2, ids)
        l1 = np.asarray(logits_from_hidden(p, c1, h1))
        l2 = np.asarray(logits_from_hidden(p, c2, h2))
        assert not np.allclose(l1, l2)
        assert np.isfinite(l2).all()


class TestGenerate:
    def test_end_to_end(self, model):
        model._tokenizer = _Tok2()
        audio = np.random.RandomState(5).randn(4000).astype(np.float32) \
            * 0.1
        out = model.generate(audio, max_tokens=6)
        assert isinstance(out.text, str)
        assert out.prompt_tokens > 0
        assert out.generation_tokens <= 6
        model._tokenizer = FakeTok()

    def test_streaming_matches_offline(self, model):
        model._tokenizer = _Tok2()
        audio = np.random.RandomState(6).randn(4000).astype(np.float32) \
            * 0.1
        off = model.generate(audio, max_tokens=5)
        chunks = list(model.generate(audio, max_tokens=5, stream=True))
        assert chunks[-1].is_final
        stream_toks = [c.text for c in chunks[:-1]]
        assert len(stream_toks) == off.generation_tokens
        model._tokenizer = FakeTok()


class TestSanitize:
    def test_conv_transposes_and_bn_cleanup(self, model):
        out = model.sanitize({
            "encoder.layers.0.conv.up_conv.weight":
                np.zeros((128, 32, 1), np.float32),
            "encoder.layers.0.conv.depth_conv.conv.weight":
                np.zeros((64, 1, 5), np.float32),
            "encoder.layers.0.conv.batch_norm.num_batches_tracked":
                np.zeros((), np.int64),
            "encoder.layers.0.conv.batch_norm.running_mean":
                np.zeros((64,), np.float32)})
        assert out["encoder.layers.0.conv.up_conv.weight"].shape \
            == (1, 32, 128)
        assert out["encoder.layers.0.conv.depth_conv.conv.weight"].shape \
            == (5, 1, 64)
        assert "encoder.layers.0.conv.batch_norm.num_batches_tracked" \
            not in out
        assert "encoder.layers.0.conv.batch_norm.running_mean" in out


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="granite_speech",
                                    category="stt",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")
