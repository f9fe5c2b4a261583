"""LFM2.5-Audio (tiny config): LFM2 backbone, depthformer head,
interleaved/sequential generation, detokenizer, processor, sanitize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.sts.models.lfm_audio import (
    AUDIO_EOS_TOKEN,
    DetokenizerConfig,
    LFM2AudioConfig,
    LFM2AudioDetokenizer,
    LFM2Config,
    LFMModality,
    Model,
)
from mlx_audio_tpu.sts.models.lfm_audio.lfm2 import (
    init_lfm2,
    lfm2_embed,
    lfm2_forward,
    lfm2_logits,
    make_lfm2_caches,
)
from mlx_audio_tpu.sts.models.lfm_audio.processor import (
    ChatState,
    LFM2AudioProcessor,
    PreprocessorConfig,
    _subsampled_frames,
)


def _cfg():
    return LFM2AudioConfig(
        codebooks=4, audio_vocab_size=33,
        interleaved_n_text=2, interleaved_n_audio=3,
        encoder=dict(feat_in=20, n_layers=2, d_model=32, n_heads=4,
                     subsampling_conv_channels=16),
        lfm=dict(vocab_size=256, hidden_size=64, num_hidden_layers=4,
                 num_attention_heads=4, num_key_value_heads=2,
                 block_ff_dim=96, block_multiple_of=16,
                 full_attn_idxs=[1, 3]),
        depthformer=dict(layers=2, dim=32, num_heads=4, num_kv_heads=2),
        adapter_hidden_dims=[48], max_decode_len=128)


@pytest.fixture(scope="module")
def model():
    return Model(_cfg()).init_and_bind()


class TestLFM2Backbone:
    def _lfm(self):
        c = LFM2Config(vocab_size=64, hidden_size=32, num_hidden_layers=4,
                       num_attention_heads=4, num_key_value_heads=2,
                       block_ff_dim=48, block_multiple_of=16,
                       full_attn_idxs=[1, 3])
        p = init_lfm2(jax.random.PRNGKey(0), c)
        return c, p

    def test_layer_types(self):
        c, _ = self._lfm()
        assert c.layer_types == ["conv", "full_attention", "conv",
                                 "full_attention"]

    def test_prefill_matches_steps(self):
        """Incremental decode == full forward on the same tokens."""
        c, p = self._lfm()
        toks = jnp.asarray([[3, 7, 11, 2, 9]], jnp.int32)
        emb = lfm2_embed(p, toks)
        caches = make_lfm2_caches(c, 1, 16)
        full, _ = lfm2_forward(p, c, emb, caches, jnp.int32(0), 5)

        caches = make_lfm2_caches(c, 1, 16)
        steps = []
        for t in range(5):
            h, caches = lfm2_forward(p, c, emb[:, t: t + 1], caches,
                                     jnp.int32(t))
            steps.append(h[:, 0])
        inc = jnp.stack(steps, axis=1)
        atol = 1e-4 if jax.default_backend() == "cpu" else 5e-2
        np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                                   atol=atol)

    def test_prefill_padding_invariance(self):
        """Right-padded prefill matches tight prefill up to `length`."""
        c, p = self._lfm()
        toks = jnp.asarray([[3, 7, 11]], jnp.int32)
        emb = lfm2_embed(p, toks)
        tight, _ = lfm2_forward(p, c, emb, make_lfm2_caches(c, 1, 16),
                                jnp.int32(0), 3)
        padded = jnp.concatenate(
            [emb, jnp.zeros((1, 5, emb.shape[-1]))], axis=1)
        wide, _ = lfm2_forward(p, c, padded, make_lfm2_caches(c, 1, 16),
                               jnp.int32(0), jnp.int32(3))
        np.testing.assert_allclose(np.asarray(tight),
                                   np.asarray(wide[:, :3]), atol=1e-4)

    def test_conv_cache_after_prefill(self):
        """Conv tap cache after a prefill == last K-1 gated inputs, so
        step-mode continuation is seamless (checked via next-step parity)."""
        c, p = self._lfm()
        toks = jnp.asarray([[3, 7, 11, 2, 9, 4]], jnp.int32)
        emb = lfm2_embed(p, toks)
        # full forward over 6
        full, _ = lfm2_forward(p, c, emb, make_lfm2_caches(c, 1, 16),
                               jnp.int32(0), 6)
        # prefill 5 then one step
        _, caches = lfm2_forward(p, c, emb[:, :5],
                                 make_lfm2_caches(c, 1, 16),
                                 jnp.int32(0), 5)
        h, _ = lfm2_forward(p, c, emb[:, 5:6], caches, jnp.int32(5))
        atol = 1e-4 if jax.default_backend() == "cpu" else 5e-2
        np.testing.assert_allclose(np.asarray(full[:, 5]),
                                   np.asarray(h[:, 0]), atol=atol)

    def test_tied_logits(self):
        c, p = self._lfm()
        h = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 32))
        logits = lfm2_logits(p, h)
        assert logits.shape == (1, 2, 64)


class TestGeneration:
    def test_interleaved_pattern(self, model):
        toks = np.array([[1, 5, 9, 12]], np.int32)
        outs = list(model.generate_interleaved(
            text_tokens=toks, max_new_tokens=12, temperature=0.8,
            audio_temperature=0.8, audio_top_k=3, seed=0))
        assert len(outs) > 0
        mods = [int(m) for _, m in outs]
        # starts with n_text=2 text tokens unless EOS hit
        assert mods[0] == int(LFMModality.TEXT)
        for tok, mod in outs:
            if mod == LFMModality.AUDIO_OUT:
                assert tok.shape == (4,)
                assert tok.dtype == np.int32 or tok.dtype == np.int64

    def test_sequential(self, model):
        toks = np.array([[1, 5, 9]], np.int32)
        outs = list(model.generate_sequential(
            text_tokens=toks, max_new_tokens=6, temperature=0.5, seed=1))
        assert 0 < len(outs) <= 6

    def test_audio_input_prefill(self, model):
        mel = np.random.RandomState(0).randn(1, 40, 20).astype(np.float32)
        n_enc = _subsampled_frames(40)
        mods = np.array([[1] * 3 + [2] * n_enc], np.int32)
        toks = np.array([[1, 5, 9]], np.int32)
        outs = list(model.generate_interleaved(
            text_tokens=toks, audio_features=mel, modalities=mods,
            max_new_tokens=4, seed=2))
        assert len(outs) > 0

    def test_greedy_deterministic(self, model):
        toks = np.array([[2, 8]], np.int32)
        a = [np.asarray(t) for t, _ in model.generate_interleaved(
            text_tokens=toks, max_new_tokens=6, temperature=0.0,
            audio_temperature=0.0, seed=0)]
        b = [np.asarray(t) for t, _ in model.generate_interleaved(
            text_tokens=toks, max_new_tokens=6, temperature=0.0,
            audio_temperature=0.0, seed=7)]
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestDetokenizer:
    def _detok(self):
        dc = DetokenizerConfig(
            hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2,
            layer_types=("conv", "sliding_attention", "conv",
                         "sliding_attention"),
            intermediate_size=48, output_size=2 * (64 // 2 + 1),
            num_codebooks=4, vocab_size=32, n_fft=64, hop_length=16,
            upsample_factor=2, sliding_window=8)
        return LFM2AudioDetokenizer(dc).init_and_bind()

    def test_waveform_length(self):
        dt = self._detok()
        codes = np.random.RandomState(1).randint(0, 32, (1, 4, 10))
        wav = dt(codes)
        # frames*up*hop (same-pad ISTFT trim, reference :501-506)
        assert wav.shape == (1, 10 * 2 * 16)
        assert np.isfinite(wav).all()

    def test_2d_codes(self):
        dt = self._detok()
        wav = dt(np.zeros((4, 6), np.int32))
        assert wav.shape == (1, 6 * 2 * 16)

    def test_sanitize_conv_and_window(self):
        dt = self._detok()
        w = {"istft.window": np.hanning(64).astype(np.float32),
             "lfm.layers.0.conv.conv.weight": np.zeros((32, 1, 3)),
             "lfm.embedding_norm.weight": np.ones(32),
             "lfm.embed_tokens.weight": np.zeros((16, 32)),
             "emb.emb.weight": np.zeros((128, 32))}
        out = dt.sanitize(w)
        assert out["layers.0.conv.weight"].shape == (3, 32)
        assert out["embedding_norm.weight"].shape == (32,)
        assert "emb.weight" in out
        assert not any(k.startswith("lfm.embed_tokens") for k in out)
        assert dt._window is not None


class TestSanitize:
    def test_depth_qkv_split_and_stacking(self, model):
        c = model.config
        d = c.depthformer_config
        qkv = np.arange((d.dim + 2 * d.num_kv_heads * d.head_dim) * d.dim,
                        dtype=np.float32).reshape(-1, d.dim)
        w = {
            "depthformer.layers.0.operator.qkv_proj.weight": qkv,
            "depthformer.layers.0.operator.out_proj.weight":
                np.zeros((d.dim, d.dim)),
            "depthformer.layers.0.operator.bounded_attention."
            "q_layernorm.weight": np.ones(d.head_dim),
            "depthformer.layers.0.operator_norm.weight": np.ones(d.dim),
            "depthformer.layers.0.feed_forward.w1.weight":
                np.zeros((d.ff_dim, d.dim)),
        }
        for i in range(c.codebooks):
            w[f"depth_embeddings.{i}.embedding.weight"] = \
                np.full((c.audio_vocab_size, d.dim), i, np.float32)
            w[f"depth_embeddings.{i}.to_logits.weight"] = \
                np.zeros((c.audio_vocab_size, d.dim), np.float32)
        out = model.sanitize(w)
        assert out["audio_head.blocks.0.attn.q_proj.weight"].shape == \
            (d.dim, d.dim)
        assert out["audio_head.blocks.0.attn.k_proj.weight"].shape == \
            (d.num_kv_heads * d.head_dim, d.dim)
        assert out["audio_head.blocks.0.attn.q_norm.weight"].shape == \
            (d.head_dim,)
        assert out["audio_head.blocks.0.ffn.w1.weight"].shape == \
            (d.ff_dim, d.dim)
        stacked = out["depth_embeddings.embedding"]
        assert stacked.shape == (c.codebooks, c.audio_vocab_size, d.dim)
        assert float(stacked[2, 0, 0]) == 2.0

    def test_lfm_and_conformer_keys(self, model):
        w = {
            "lfm.layers.0.conv.conv.weight": np.zeros((64, 1, 3)),
            "lfm.layers.1.feed_forward.linear1.weight": np.zeros((96, 64)),
            "conformer.pre_encode.conv.0.weight": np.zeros((16, 1, 3, 3)),
            "conformer.layers.0.self_attn.linear_q.weight":
                np.zeros((32, 32)),
            "conformer.layers.0.conv.depthwise_conv.weight":
                np.zeros((32, 1, 9)),
            "conformer.pos_enc.pe": np.zeros((1, 10, 32)),
            "audio_adapter.model.0.weight": np.zeros(32),
            "audio_adapter.model.1.weight": np.zeros((48, 32)),
            "audio_adapter.model.3.weight": np.zeros((64, 48)),
        }
        out = model.sanitize(w)
        assert out["lfm.layers.0.conv.weight"].shape == (3, 64)
        assert "lfm.layers.1.feed_forward.w1.weight" in out
        assert out["audio_encoder.pre_encode.layers.00_conv.weight"].shape \
            == (3, 3, 1, 16)
        assert out["audio_encoder.layers.0.conv.depthwise_conv.weight"
                   ].shape == (9, 1, 32)
        assert "audio_adapter.norm.weight" in out
        assert out["audio_adapter.fc1.weight"].shape == (48, 32)
        assert out["audio_adapter.fc2.weight"].shape == (64, 48)
        assert not any("pos_enc.pe" in k for k in out)


class _StubTokenizer:
    bos_token_id = 1

    def encode(self, text, add_special_tokens=False):
        return [10 + (ord(ch) % 50) for ch in text][:8]

    def decode(self, tokens):
        return " ".join(str(t) for t in tokens)


class TestProcessor:
    def test_preprocess_shapes(self):
        pre = PreprocessorConfig(sample_rate=8000, features=20, n_fft=128,
                                 window_size=0.016, window_stride=0.008)
        from mlx_audio_tpu.sts.models.lfm_audio.processor import \
            AudioPreprocessor

        ap = AudioPreprocessor(pre)
        feats = np.asarray(ap(np.random.RandomState(0).randn(1600)
                              .astype(np.float32)))
        assert feats.shape[-1] == 20
        assert np.isfinite(feats).all()

    def test_subsampled_frames(self):
        # 3 stride-2 convs, kernel 3, pad 1 (reference processor.py:481-488)
        assert _subsampled_frames(40) == 5
        assert _subsampled_frames(41) == 6

    def test_chat_state(self):
        cfg = _cfg()
        proc = LFM2AudioProcessor(cfg, tokenizer=_StubTokenizer())
        chat = ChatState(proc)
        chat.new_turn("user")
        chat.add_text("hi")
        chat.end_turn()
        chat.new_turn("assistant")
        toks = chat.get_text_tokens()
        mods = chat.get_modalities()
        assert toks.shape[1] == mods.shape[1]
        assert toks[0, 0] == 1  # BOS
        assert chat.get_audio_features() is None
        d = dict(chat.items())
        assert "text_tokens" in d and "modalities" in d

    def test_chat_state_audio_modalities(self):
        cfg = _cfg()
        cfg.preprocessor_config = PreprocessorConfig(
            sample_rate=8000, features=20, n_fft=128,
            window_size=0.016, window_stride=0.008)
        proc = LFM2AudioProcessor(cfg, tokenizer=_StubTokenizer())
        proc.audio_preprocessor = __import__(
            "mlx_audio_tpu.sts.models.lfm_audio.processor",
            fromlist=["AudioPreprocessor"]).AudioPreprocessor(
                cfg.preprocessor_config)
        chat = ChatState(proc, add_bos=False)
        chat.new_turn("user")
        audio = np.random.RandomState(0).randn(1600).astype(np.float32)
        chat.add_audio(audio, sample_rate=8000)
        n_audio = sum(1 for m in chat.modalities
                      if m == LFMModality.AUDIO_IN)
        assert n_audio == _subsampled_frames(chat.audio_features.shape[0])


class TestRegistry:
    def test_remapping(self):
        from mlx_audio_tpu.sts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["lfm_audio"] == "lfm_audio"

    def test_module_resolves(self):
        from mlx_audio_tpu.utils import get_model_class

        mod, arch = get_model_class("lfm_audio", "sts",
                                    {"lfm_audio": "lfm_audio"})
        assert hasattr(mod, "Model") and hasattr(mod, "ModelConfig")
