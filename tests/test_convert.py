"""convert CLI tests: conversion, quantization, reload fidelity."""

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_configs import tiny_kokoro_config


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """A tiny pre-sanitized kokoro checkpoint dir (loader round-trips it)."""
    from safetensors.numpy import save_file

    from mlx_audio_tpu.tts.models.kokoro import Model
    from mlx_audio_tpu.utils import flatten

    d = tmp_path_factory.mktemp("kokoro-src")
    m = Model(tiny_kokoro_config()).init_and_bind()
    flat = {k: np.ascontiguousarray(np.asarray(v))
            for k, v in flatten(m.params).items()}
    save_file(flat, str(d / "model.safetensors"))
    cfg = dataclasses.asdict(tiny_kokoro_config())
    cfg["model_type"] = "kokoro"
    cfg["converted_by"] = "mlx_audio_tpu.convert"  # layouts already native
    (d / "config.json").write_text(json.dumps(cfg))
    return d


class TestConvert:
    def test_convert_and_reload(self, ckpt_dir, tmp_path):
        from mlx_audio_tpu.convert import convert
        from mlx_audio_tpu.tts.utils import load_model

        out = convert(str(ckpt_dir), mlx_path=str(tmp_path / "out"),
                      dtype="float32")
        assert (out / "model.safetensors").exists()
        cfg = json.loads((out / "config.json").read_text())
        assert cfg["converted_by"] == "mlx_audio_tpu.convert"
        m = load_model(out)
        audio, _ = m("hɛlO", np.zeros((1, 32), np.float32),
                     deterministic_noise=True)
        assert np.isfinite(audio).all()

    def test_quantized_convert_fidelity(self, ckpt_dir, tmp_path):
        from mlx_audio_tpu.convert import convert
        from mlx_audio_tpu.tts.utils import load_model
        from mlx_audio_tpu.utils import flatten

        out = convert(str(ckpt_dir), mlx_path=str(tmp_path / "q8"),
                      dtype="float32", quantize=True, q_bits=8,
                      q_group_size=16)
        mq = load_model(out)
        n_q = sum(1 for k in flatten(mq.params) if k.endswith("w_q"))
        assert n_q > 10  # linears got quantized
        # embeddings must never be quantized
        assert "weight" in mq.params["bert"]["embeddings"]["word_embeddings"]
        ref_s = np.random.RandomState(0).randn(1, 32).astype(np.float32)
        md = load_model(ckpt_dir)
        aq, _ = mq("hɛlO wɜɹld", ref_s, deterministic_noise=True)
        ad, _ = md("hɛlO wɜɹld", ref_s, deterministic_noise=True)
        rel = np.abs(aq - ad).max() / (np.abs(ad).max() + 1e-9)
        assert rel < 0.5  # int8 through exp-amplified vocoder

    def test_dequantize_roundtrip(self, ckpt_dir, tmp_path):
        """quantize -> --dequantize: dense weights come back, config's
        quantization block is dropped, output stays close to the quantized
        model (reference convert.py:730-733)."""
        from mlx_audio_tpu.convert import convert
        from mlx_audio_tpu.tts.utils import load_model
        from mlx_audio_tpu.utils import flatten

        q = convert(str(ckpt_dir), mlx_path=str(tmp_path / "q"),
                    dtype="float32", quantize=True, q_bits=8,
                    q_group_size=16)
        d = convert(str(q), mlx_path=str(tmp_path / "dq"), dtype="float32",
                    dequantize=True)
        cfg = json.loads((d / "config.json").read_text())
        assert "quantization" not in cfg
        md = load_model(d)
        flat = flatten(md.params)
        assert not any(k.endswith(("w_q", "w_fp4", "w_fp8")) for k in flat)
        mq = load_model(q)
        ref_s = np.random.RandomState(1).randn(1, 32).astype(np.float32)
        ad, _ = md("hɛlO", ref_s, deterministic_noise=True)
        aq, _ = mq("hɛlO", ref_s, deterministic_noise=True)
        rel = np.abs(aq - ad).max() / (np.abs(ad).max() + 1e-9)
        assert rel < 1e-2  # dequant == what the quantized matmul computes

    def test_quantize_dequantize_exclusive(self, ckpt_dir, tmp_path):
        from mlx_audio_tpu.convert import convert

        with pytest.raises(ValueError):
            convert(str(ckpt_dir), mlx_path=str(tmp_path / "x"),
                    quantize=True, dequantize=True)

    def test_domain_detection(self, ckpt_dir):
        from mlx_audio_tpu.convert import Domain, detect_model_domain

        cfg = json.loads((ckpt_dir / "config.json").read_text())
        assert detect_model_domain(cfg, ckpt_dir) == Domain.TTS
        assert detect_model_domain(
            {"model_type": "whisper"}, ckpt_dir) == Domain.STT
        with pytest.raises(ValueError):
            detect_model_domain({"model_type": "zzz"},
                                ckpt_dir / "unknowable")


class TestAudioPlayer:
    def test_headless_buffering(self):
        from mlx_audio_tpu.tts.audio_player import AudioPlayer

        p = AudioPlayer(sample_rate=24000, min_buffer_seconds=0.01)
        p.queue_audio(np.ones(1000, np.float32) * 0.1)
        p.queue_audio(np.ones(500, np.float32) * 0.2)
        out = p.drain()
        assert len(out) == 1500
        np.testing.assert_allclose(out[:1000], 0.1)
