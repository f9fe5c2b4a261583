"""HiggsAudio v2 tokenizer: RVQ roundtrip, decode shapes, fusion encode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.codec.models.higgs_audio import Model, ModelConfig
from mlx_audio_tpu.codec.models.higgs_audio.higgs_audio import (
    rvq_decode, rvq_encode)


def _cfg(with_semantic=True):
    sem = dict(model_type="hubert", hidden_size=16, num_hidden_layers=1,
               num_attention_heads=2, intermediate_size=32,
               conv_dim=[16, 16], conv_kernel=[10, 8], conv_stride=[5, 4],
               num_feat_extract_layers=2, do_stable_layer_norm=False,
               feat_extract_norm="group") if with_semantic else None
    return ModelConfig.from_dict(dict(
        model_type="higgs_audio_v2_tokenizer", sample_rate=24000,
        codebook_size=16, codebook_dim=4, dac_num_codebooks=3,
        dac_encoder_ratios=[2, 3], dac_encoder_hidden=4,
        dac_decoder_hidden=16, latent_dim=24, fusion_dim=8,
        downsample_factor=20, semantic_model_config=sem))


def _tiny(**kw):
    return Model(_cfg(**kw)).init_and_bind()


class TestRVQ:
    def test_roundtrip_consistency(self):
        m = _tiny(with_semantic=False)
        rs = np.random.RandomState(0)
        z = jnp.asarray(rs.randn(1, 10, 24).astype(np.float32))
        codes = rvq_encode(m.params["quantizer"], z, 3)
        assert codes.shape == (1, 10, 3)
        dec = rvq_decode(m.params["quantizer"], codes, 3)
        assert dec.shape == (1, 10, 24)
        # re-encoding the decode gives the same codes (fixed point)
        codes2 = rvq_encode(m.params["quantizer"], dec, 3)
        assert codes2.shape == codes.shape


class TestDecode:
    def test_decode_shape(self):
        m = _tiny(with_semantic=False)
        rs = np.random.RandomState(1)
        tokens = rs.randint(0, 16, size=(9, 3)).astype(np.int32)
        wav = m.decode(tokens)
        assert wav.shape == (9 * 6,)           # hop 2*3
        assert np.isfinite(wav).all()

    def test_decode_deterministic_exact_shape(self):
        """Decode compiles per exact length (non-causal decoder: padding
        would leak); repeated calls are bit-identical."""
        m = _tiny(with_semantic=False)
        rs = np.random.RandomState(2)
        t1 = rs.randint(0, 16, size=(20, 3)).astype(np.int32)
        w1 = m.decode(t1)
        w2 = m.decode(t1)
        np.testing.assert_array_equal(w1, w2)
        assert w1.shape == (20 * m.config.acoustic_hop,)


class TestEncode:
    def test_encode_tokens(self):
        m = _tiny()
        rs = np.random.RandomState(3)
        wav = (rs.randn(24000) * 0.1).astype(np.float32)
        codes = m.encode(wav)
        assert codes.shape[1] == 3
        assert codes.shape[0] > 0
        assert codes.max() < 16

    def test_encode_without_semantic_raises(self):
        m = _tiny(with_semantic=False)
        with pytest.raises(RuntimeError, match="semantic"):
            m.encode(np.zeros(24000, np.float32))


class TestSanitize:
    def test_keep_drop_and_layouts(self):
        m = Model(_cfg(with_semantic=False))
        out = m.sanitize({
            "acoustic_encoder.conv1.weight": jnp.ones((4, 1, 7)),
            "acoustic_decoder.block.0.conv_t1.weight":
                jnp.ones((16, 8, 4)),
            "quantizer.quantizers.0.codebook.embed": jnp.ones((16, 4)),
            "quantizer.quantizers.0.codebook.embed_avg":
                jnp.ones((16, 4)),
            "acoustic_encoder.snake1.alpha": jnp.ones((1, 4, 1)),
            "decoder_semantic.conv.weight": jnp.ones((4, 4, 3)),
            "fc1.weight": jnp.ones((4, 4)),
            "fc2.weight": jnp.ones((8, 24)),
        })
        assert out["acoustic_encoder.conv1.weight"].shape == (7, 1, 4)
        assert out["acoustic_decoder.block.0.conv_t1.weight"].shape \
            == (4, 16, 8)
        assert "quantizer.quantizers.0.codebook.weight" in out
        assert not any("embed_avg" in k or "decoder_semantic" in k
                       or k.startswith("fc1.") for k in out)
        assert out["acoustic_encoder.snake1.alpha"].shape == (4,)
        assert "fc2.weight" in out

    def test_converted_passthrough(self):
        m = _tiny(with_semantic=False)
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
        for k in flat:
            assert again[k].shape == flat[k].shape, k


class TestHubertSemanticParity:
    """hubert_hidden_mean vs HF HubertModel all-hidden-state mean.

    The Higgs v2 tokenizer fuses the MEAN of every HuBERT encoder hidden
    state (reference codec/models/higgs_audio semantic fusion); this pins
    that reduction — not just the backbone — against torch.
    """

    def test_all_layer_mean_matches_hf(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from transformers import HubertConfig, HubertModel

        from mlx_audio_tpu.codec.models.higgs_audio.higgs_audio import (
            hubert_hidden_mean,
        )
        from mlx_audio_tpu.stt.models.wav2vec import (
            ModelConfig as W2VConfig, sanitize_wav2vec2,
        )
        from mlx_audio_tpu.utils import unflatten

        hf_cfg = HubertConfig(
            hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, conv_dim=(8, 8, 8), conv_stride=(5, 2, 2),
            conv_kernel=(10, 3, 3), num_feat_extract_layers=3,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            hidden_dropout=0.0, activation_dropout=0.0,
            attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
            do_stable_layer_norm=False, apply_spec_augment=False)
        torch.manual_seed(0)
        hf = HubertModel(hf_cfg).eval()

        cfg = W2VConfig(
            hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, feat_extract_norm=hf_cfg.feat_extract_norm,
            conv_dim=(8, 8, 8), conv_stride=(5, 2, 2),
            conv_kernel=(10, 3, 3), conv_bias=hf_cfg.conv_bias,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_feat_extract_layers=3, do_stable_layer_norm=False)
        flat = sanitize_wav2vec2(
            {k: v.detach().numpy() for k, v in hf.state_dict().items()})
        params = unflatten({k: jnp.asarray(v) for k, v in flat.items()})

        rs = np.random.RandomState(0)
        wave = (rs.randn(1, 800) * 0.1).astype(np.float32)
        with torch.no_grad():
            out = hf(torch.from_numpy(wave), output_hidden_states=True)
        ref = torch.stack(out.hidden_states).mean(0).numpy()

        got = np.asarray(hubert_hidden_mean(
            params, cfg, jnp.asarray(wave),
            jnp.asarray([wave.shape[1]])))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)
