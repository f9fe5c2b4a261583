"""Wav2Vec2 family: HF-torch parity, bucket invariance, MMS CTC, LID."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.stt.models.wav2vec import (ModelConfig, feature_lengths,
                                              init_wav2vec2,
                                              sanitize_wav2vec2,
                                              wav2vec2_forward)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_config(**kw):
    from transformers import Wav2Vec2Config
    base = dict(vocab_size=17, hidden_size=24, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=48,
                conv_dim=(8, 8, 8), conv_stride=(5, 2, 2),
                conv_kernel=(10, 3, 3), num_feat_extract_layers=3,
                num_conv_pos_embeddings=16,
                num_conv_pos_embedding_groups=4,
                hidden_dropout=0.0, activation_dropout=0.0,
                attention_dropout=0.0, feat_proj_dropout=0.0,
                final_dropout=0.0, layerdrop=0.0, do_stable_layer_norm=False,
                apply_spec_augment=False)
    base.update(kw)
    return Wav2Vec2Config(**base)


def _our_config(hf):
    return ModelConfig(
        vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
        num_hidden_layers=hf.num_hidden_layers,
        num_attention_heads=hf.num_attention_heads,
        intermediate_size=hf.intermediate_size,
        feat_extract_norm=hf.feat_extract_norm,
        conv_dim=tuple(hf.conv_dim), conv_stride=tuple(hf.conv_stride),
        conv_kernel=tuple(hf.conv_kernel), conv_bias=hf.conv_bias,
        num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
        num_feat_extract_layers=hf.num_feat_extract_layers,
        do_stable_layer_norm=hf.do_stable_layer_norm,
        pad_token_id=hf.pad_token_id)


def _bind(weights, cfg):
    from mlx_audio_tpu.utils import unflatten
    flat = sanitize_wav2vec2(
        {k: v.detach().numpy() for k, v in weights.items()})
    return unflatten({k: jnp.asarray(v) for k, v in flat.items()})


class TestTorchParity:
    @pytest.mark.parametrize("stable", [False, True])
    def test_backbone_matches_hf(self, stable):
        from transformers import Wav2Vec2Model as HFModel
        hf_cfg = _hf_config(
            do_stable_layer_norm=stable,
            feat_extract_norm="layer" if stable else "group")
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()
        wave = torch.randn(1, 800) * 0.1
        with torch.no_grad():
            ref = hf(wave).last_hidden_state.numpy()

        cfg = _our_config(hf_cfg)
        params = _bind(hf.state_dict(), cfg)
        ours, n = wav2vec2_forward(params, cfg, jnp.asarray(wave.numpy()),
                                   jnp.asarray([800]))
        ours = np.asarray(ours)[:, : int(n[0])]
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_bucket_invariance(self):
        """Padded bucket == tight length on the valid prefix."""
        hf_cfg = _hf_config()
        torch.manual_seed(1)
        from transformers import Wav2Vec2Model as HFModel
        hf = HFModel(hf_cfg).eval()
        cfg = _our_config(hf_cfg)
        params = _bind(hf.state_dict(), cfg)

        rng = np.random.RandomState(0)
        wave = rng.randn(1, 700).astype(np.float32) * 0.1
        tight, n1 = wav2vec2_forward(params, cfg, jnp.asarray(wave),
                                     jnp.asarray([700]))
        padded = np.zeros((1, 1200), np.float32)
        padded[:, :700] = wave
        pad, n2 = wav2vec2_forward(params, cfg, jnp.asarray(padded),
                                   jnp.asarray([700]))
        assert int(n1[0]) == int(n2[0])
        f = int(n1[0])
        np.testing.assert_allclose(np.asarray(tight)[:, :f],
                                   np.asarray(pad)[:, :f], atol=2e-4)

    def test_feature_lengths_match_conv(self):
        cfg = ModelConfig(conv_dim=(4, 4), conv_stride=(5, 2),
                          conv_kernel=(10, 3), num_feat_extract_layers=2,
                          hidden_size=8, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=16,
                          num_conv_pos_embeddings=4,
                          num_conv_pos_embedding_groups=2)
        p = init_wav2vec2(jax.random.PRNGKey(0), cfg)
        for n in (123, 200, 517):
            wave = jnp.zeros((1, 600))
            _, frames = wav2vec2_forward(p, cfg, wave, jnp.asarray([n]))
            assert int(frames[0]) == int(feature_lengths(cfg, n))


class TestMMS:
    def test_ctc_matches_hf_for_ctc_head(self):
        from transformers import Wav2Vec2ForCTC
        hf_cfg = _hf_config()
        torch.manual_seed(2)
        hf = Wav2Vec2ForCTC(hf_cfg).eval()
        wave = torch.randn(1, 800)
        norm = (wave - wave.mean()) / (wave.std(unbiased=False) + 1e-7)
        with torch.no_grad():
            ref_ids = hf(norm).logits.argmax(-1)[0].numpy()

        from mlx_audio_tpu.stt.models.mms import Model
        m = Model(_our_config(hf_cfg))
        from mlx_audio_tpu.utils import unflatten
        flat = m.sanitize({k: v.detach().numpy()
                           for k, v in hf.state_dict().items()})
        m.bind(unflatten({k: jnp.asarray(v) for k, v in flat.items()}))
        got = m.transcribe_ids(wave.numpy()[0])

        from mlx_audio_tpu.stt.models.mms import ctc_collapse
        assert got == ctc_collapse(ref_ids, len(ref_ids), blank=0)

    def test_ctc_collapse(self):
        from mlx_audio_tpu.stt.models.mms import ctc_collapse
        ids = np.array([0, 3, 3, 0, 4, 4, 4, 2, 0, 0])
        assert ctc_collapse(ids, len(ids)) == [3, 4, 2]
        assert ctc_collapse(ids, 4) == [3]
        assert ctc_collapse(np.array([], np.int64), 0) == []

    def test_generate_with_vocab(self):
        from mlx_audio_tpu.stt.models.mms import Model
        cfg = ModelConfig(
            vocab_size=6, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            conv_dim=(8, 8), conv_stride=(5, 2), conv_kernel=(10, 3),
            num_feat_extract_layers=2, num_conv_pos_embeddings=8,
            num_conv_pos_embedding_groups=4)
        m = Model(cfg).init_and_bind()
        m._vocab = {1: "a", 2: "b", 3: "|", 4: "c", 5: "d"}
        out = m.generate(np.random.RandomState(0)
                         .randn(4000).astype(np.float32))
        assert isinstance(out.text, str)
        assert out.total_time > 0


class TestLID:
    def test_matches_hf_sequence_classifier(self):
        from transformers import Wav2Vec2ForSequenceClassification
        hf_cfg = _hf_config(num_labels=4, classifier_proj_size=12,
                            use_weighted_layer_sum=False)
        torch.manual_seed(3)
        hf = Wav2Vec2ForSequenceClassification(hf_cfg).eval()
        wave = torch.randn(1, 800)
        norm = (wave - wave.mean()) / torch.sqrt(
            wave.var(unbiased=False) + 1e-7)
        with torch.no_grad():
            ref = torch.softmax(hf(norm).logits, -1)[0].numpy()

        from mlx_audio_tpu.lid.models.wav2vec2 import Model, ModelConfig \
            as LidConfig
        base = _our_config(hf_cfg)
        cfg = LidConfig(**{f: getattr(base, f)
                           for f in base.__dataclass_fields__},
                        classifier_proj_size=12, num_labels=4,
                        id2label={str(i): f"lang{i}" for i in range(4)})
        m = Model(cfg)
        from mlx_audio_tpu.utils import unflatten
        flat = m.sanitize({k: v.detach().numpy()
                           for k, v in hf.state_dict().items()})
        m.bind(unflatten({k: jnp.asarray(v) for k, v in flat.items()}))
        got = m.predict(wave.numpy()[0], top_k=4)
        got_probs = {k: v for k, v in got}
        for i in range(4):
            assert abs(got_probs[f"lang{i}"] - ref[i]) < 2e-4

    def test_top_k_ordering(self):
        from mlx_audio_tpu.lid.models.wav2vec2 import Model, ModelConfig \
            as LidConfig
        cfg = LidConfig(
            hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=32, conv_dim=(8, 8), conv_stride=(5, 2),
            conv_kernel=(10, 3), num_feat_extract_layers=2,
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
            classifier_proj_size=8,
            id2label={"0": "en", "1": "fr", "2": "de"})
        m = Model(cfg).init_and_bind()
        preds = m.predict(np.random.RandomState(0)
                          .randn(4000).astype(np.float32), top_k=2)
        assert len(preds) == 2
        assert preds[0][1] >= preds[1][1]
        assert all(p[0] in ("en", "fr", "de") for p in preds)
