"""Voxtral (offline STT): audio tower, tekken prompt, compiled decode."""

import json

import jax
import numpy as np
import pytest

from mlx_audio_tpu.stt.models.voxtral import Model, ModelConfig
from mlx_audio_tpu.stt.models.voxtral.voxtral import (
    TekkenEncoder,
    audio_tower_forward,
)


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        audio_config=dict(d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          num_mel_bins=32, max_source_positions=1500,
                          intermediate_size=128),
        text_config=dict(hidden_size=32, num_hidden_layers=2,
                         intermediate_size=64, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8,
                         vocab_size=1200, rope_theta=1e8),
        audio_token_id=24))


def make_tekken(tmp_path):
    import base64

    pieces = ([bytes([b]) for b in range(256)]
              + [b"lang", b":en", b"hello", b" world"])
    data = {
        "config": {"default_num_special_tokens": 40},
        "vocab": [{"token_bytes": base64.b64encode(p).decode()}
                  for p in pieces],
        "special_tokens": [
            {"rank": 1, "token_str": "<s>"},
            {"rank": 2, "token_str": "</s>"},
            {"rank": 3, "token_str": "[INST]"},
            {"rank": 4, "token_str": "[/INST]"},
            {"rank": 12, "token_str": "[BEGIN_AUDIO]"},
            {"rank": 24, "token_str": "[AUDIO]"},
            {"rank": 34, "token_str": "[TRANSCRIBE]"},
        ],
    }
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps(data))
    return str(p)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    m = Model(tiny_cfg()).init_and_bind()
    m._tekken = TekkenEncoder(make_tekken(tmp_path_factory.mktemp("tk")))
    return m


class TestTekken:
    def test_roundtrip(self, model):
        tk = model._tekken
        ids = tk.encode_text("lang:en hello")
        assert tk.decode(ids) == "lang:en hello"
        # greedy encoder prefers the longest piece
        assert len(ids) < len("lang:en hello")

    def test_specials(self, model):
        tk = model._tekken
        assert tk.special_id("[BEGIN_AUDIO]") == 12
        assert 2 in tk.eos_ids


class TestTower:
    def test_tower_downsamples_2x(self, model):
        a = model.config.audio_config
        mel = np.random.RandomState(0).randn(1, 100, 32).astype(np.float32)
        out = audio_tower_forward(model.params["audio_tower"], a,
                                  np.asarray(mel))
        assert out.shape == (1, 50, 32)

    def test_audio_embeds_token_count(self, model):
        # one 30-s chunk -> 1500 enc frames -> 1500*d / intermediate tokens
        a = model.config.audio_config
        audio = np.random.RandomState(1).randn(16000).astype(np.float32)
        emb = model.get_audio_embeds(audio)
        assert emb.shape == (1500 * a.d_model // a.intermediate_size,
                             model.config.text.hidden_size)


class TestGenerate:
    def test_generate_end_to_end(self, model):
        audio = np.random.RandomState(2).randn(8000).astype(np.float32) * 0.1
        out = model.generate(audio, language="en", max_tokens=6)
        assert isinstance(out.text, str)
        assert out.generation_tokens <= 6
        assert out.prompt_tokens > 300   # audio tokens dominate

    def test_prompt_layout(self, model):
        ids = model._build_prompt_ids(5, "en")
        tk = model._tekken
        assert ids[0] == tk.special_id("<s>")
        assert ids[1] == tk.special_id("[INST]")
        assert ids[2] == tk.special_id("[BEGIN_AUDIO]")
        assert ids[3:8] == [tk.special_id("[AUDIO]")] * 5
        assert ids[-1] == tk.special_id("[/INST]")
        assert ids[-2] == tk.special_id("[TRANSCRIBE]")


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="voxtral", category="stt",
                                    model_remapping=MODEL_REMAPPING)
        assert module.__name__.endswith("voxtral")


class TestSampling:
    def test_sampled_decode_runs(self, model):
        audio = np.random.RandomState(7).randn(16000).astype(np.float32)
        out = model.generate(audio, max_tokens=8, temperature=0.7,
                             top_k=10, top_p=0.9, seed=2)
        assert isinstance(out.text, str)
