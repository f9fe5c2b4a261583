"""Canary: decoder cache parity, prompt format, compiled greedy decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.ops.kvcache import KVCache
from mlx_audio_tpu.stt.models.canary import Model, ModelConfig
from mlx_audio_tpu.stt.models.canary.canary import (_fixed_positions,
                                                    cross_kv,
                                                    decoder_forward,
                                                    init_decoder)


def _cfg():
    return ModelConfig(
        vocab_size=64, enc_output_dim=16,
        encoder=dict(feat_in=16, n_layers=1, d_model=16, n_heads=2,
                     conv_kernel_size=5, subsampling_conv_channels=4,
                     xscaling=True),
        transf_decoder=dict(num_layers=1, hidden_size=16,
                            num_attention_heads=2, inner_size=32,
                            max_sequence_length=64),
        preprocessor=dict(features=16))


class _FakeTok:
    eos_id = 2

    def __init__(self):
        self.token2id = {s: i + 10 for i, s in enumerate(
            ["<|startofcontext|>", "<|startoftranscript|>",
             "<|emo:undefined|>", "<|en|>", "<|de|>", "<|pnc|>",
             "<|nopnc|>", "<|noitn|>", "<|notimestamp|>",
             "<|nodiarize|>", "<|endoftext|>"])}
        self.token2id["<|endoftext|>"] = 2

    def build_prompt_tokens(self, source_lang="en", target_lang="en",
                            use_pnc=True):
        t = self.token2id
        return [t["<|startofcontext|>"], t["<|startoftranscript|>"],
                t["<|emo:undefined|>"], t[f"<|{source_lang}|>"],
                t[f"<|{target_lang}|>"],
                t["<|pnc|>"] if use_pnc else t["<|nopnc|>"],
                t["<|noitn|>"], t["<|notimestamp|>"], t["<|nodiarize|>"]]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def model():
    m = Model(_cfg()).init_and_bind()
    m._tokenizer = _FakeTok()
    return m


class TestPositions:
    def test_interleaved_and_scaled(self):
        pe = _fixed_positions(8, 4)
        # position 0: sin(0)=0, cos(0)=1 interleaved, scaled by 1/sqrt(d)
        np.testing.assert_allclose(pe[0], [0, 0.5, 0, 0.5], atol=1e-6)


class TestDecoder:
    def test_prefill_then_step_matches_full(self, model):
        cfg = model.config.transf_decoder
        d = model.config.enc_output_dim
        p = model.params["decoder"]
        enc = jnp.asarray(np.random.RandomState(0)
                          .randn(1, 12, d).astype(np.float32) * 0.1)
        mask = jnp.ones((1, 12), bool)
        ckv = cross_kv(p, cfg, enc)
        pos = jnp.asarray(_fixed_positions(64, d))
        toks = np.random.RandomState(1).randint(0, 64, (1, 6))

        caches = [KVCache.init(1, 8, cfg.num_attention_heads,
                               d // cfg.num_attention_heads,
                               dtype=jnp.float32)]
        full, _ = decoder_forward(p, cfg, jnp.asarray(toks), mask,
                                  caches, ckv, jnp.int32(0), pos)

        caches = [KVCache.init(1, 8, cfg.num_attention_heads,
                               d // cfg.num_attention_heads,
                               dtype=jnp.float32)]
        pre, caches = decoder_forward(p, cfg, jnp.asarray(toks[:, :4]),
                                      mask, caches, ckv, jnp.int32(0),
                                      pos)
        np.testing.assert_allclose(np.asarray(pre),
                                   np.asarray(full)[:, :4], atol=2e-4)
        for i in range(4, 6):
            lg, caches = decoder_forward(p, cfg,
                                         jnp.asarray(toks[:, i:i + 1]),
                                         mask, caches, ckv,
                                         jnp.int32(i), pos)
            np.testing.assert_allclose(np.asarray(lg)[:, 0],
                                       np.asarray(full)[:, i], atol=2e-4)

    def test_encoder_mask_blocks_padding(self, model):
        cfg = model.config.transf_decoder
        d = model.config.enc_output_dim
        p = model.params["decoder"]
        rng = np.random.RandomState(2)
        enc = rng.randn(1, 10, d).astype(np.float32)
        mask = np.zeros((1, 10), bool)
        mask[0, :6] = True
        ckv = cross_kv(p, cfg, jnp.asarray(enc))
        pos = jnp.asarray(_fixed_positions(64, d))
        toks = jnp.asarray([[3, 4]])
        caches = [KVCache.init(1, 4, cfg.num_attention_heads,
                               d // cfg.num_attention_heads,
                               dtype=jnp.float32)]
        a, _ = decoder_forward(p, cfg, toks, jnp.asarray(mask), caches,
                               ckv, jnp.int32(0), pos)
        enc2 = enc.copy()
        enc2[0, 7:] += 100.0          # masked region
        ckv2 = cross_kv(p, cfg, jnp.asarray(enc2))
        caches = [KVCache.init(1, 4, cfg.num_attention_heads,
                               d // cfg.num_attention_heads,
                               dtype=jnp.float32)]
        b, _ = decoder_forward(p, cfg, toks, jnp.asarray(mask), caches,
                               ckv2, jnp.int32(0), pos)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


class TestGenerate:
    def test_end_to_end(self, model):
        audio = (0.1 * np.random.RandomState(3).randn(16000)) \
            .astype(np.float32)
        out = model.generate(audio, max_tokens=12)
        assert isinstance(out.text, str)
        assert out.prompt_tokens == 9
        assert out.generation_tokens <= 12
        assert out.language == "en"

    def test_language_kwarg_sets_prompt(self, model):
        audio = np.zeros(8000, np.float32)
        out = model.generate(audio, max_tokens=4, language="de")
        assert out.language == "de"

    def test_no_tokenizer_errors(self):
        m = Model(_cfg()).init_and_bind()
        with pytest.raises(RuntimeError, match="tokenizer"):
            m.generate(np.zeros(8000, np.float32))


class TestSanitize:
    def test_mlx_native_decoder_remap(self, model):
        out = model.sanitize({
            "transf_decoder.layers.0.first_sub_layer.linear_q.weight":
                jnp.ones((4, 4)),
            "transf_decoder.layers.0.second_sub_layer.linear_out.bias":
                jnp.ones((4,)),
            "transf_decoder.layers.0.third_sub_layer.dense_in.weight":
                jnp.ones((8, 4)),
            "head.classifier.weight": jnp.ones((64, 4)),
            "transf_decoder.embedding.token_embedding.weight":
                jnp.ones((64, 4)),
        })
        assert "decoder.blocks.0.self_attn.q_proj.weight" in out
        assert "decoder.blocks.0.cross_attn.out_proj.bias" in out
        assert "decoder.blocks.0.ff1.weight" in out
        assert "decoder.output_proj.weight" in out
        assert "decoder.embedding.weight" in out
