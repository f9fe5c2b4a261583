"""Qwen2-Audio: tower pooling, prompt splice, compiled decode."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.qwen2_audio import Model, ModelConfig


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        audio_config=dict(d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          num_mel_bins=32, max_source_positions=1500),
        text_config=dict(hidden_size=32, num_hidden_layers=2,
                         intermediate_size=64, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8,
                         vocab_size=600, rope_theta=10000.0),
        audio_token_id=590, audio_bos_token_id=591,
        audio_eos_token_id=592))


class FakeTok:
    eos_token_id = 599

    def apply_chat_template(self, chat, tokenize=False,
                            add_generation_prompt=True):
        return "<u>" + chat[0]["content"] + "<a>"

    def encode(self, text):
        out = []
        i = 0
        specials = {"<|AUDIO|>": 590, "<|audio_bos|>": 591,
                    "<|audio_eos|>": 592, "<u>": 593, "<a>": 594}
        while i < len(text):
            for s, tid in specials.items():
                if text.startswith(s, i):
                    out.append(tid)
                    i += len(s)
                    break
            else:
                out.append(ord(text[i]) % 580)
                i += 1
        return out

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids)

    def convert_tokens_to_ids(self, s):
        return None


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    m._tokenizer = FakeTok()
    return m


class TestTower:
    def test_avg_pool_halves_tokens(self, model):
        audio = np.random.RandomState(0).randn(16000).astype(np.float32)
        emb, n = model.get_audio_embeds(audio)
        # 3000 mel frames -> 1500 conv frames -> 750 pooled tokens
        assert n == 750
        assert emb.shape == (750, 32)
        assert np.isfinite(np.asarray(emb)).all()


class TestGenerate:
    def test_generate_end_to_end(self, model):
        audio = np.random.RandomState(1).randn(8000).astype(np.float32) * 0.1
        out = model.generate(audio, max_tokens=6)
        assert isinstance(out.text, str)
        assert out.generation_tokens <= 6
        assert out.prompt_tokens > 750

    def test_prompt_contains_audio_block(self, model):
        ids = model._build_prompt_ids(5, None)
        assert ids.count(590) == 5
        assert 591 in ids and 592 in ids


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="qwen2_audio",
                                    category="stt",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")


class TestSampling:
    def test_sampled_decode_runs(self, model):
        """temperature/top_k/top_p/repetition_penalty reach the compiled
        decode (reference passes them to mlx_lm stream_generate)."""
        audio = np.random.RandomState(7).randn(16000).astype(np.float32)
        out = model.generate(audio, max_tokens=8, temperature=0.8,
                             top_k=20, top_p=0.9,
                             repetition_penalty=1.2, seed=1)
        assert isinstance(out.text, str)
        out2 = model.generate(audio, max_tokens=8, temperature=0.0)
        assert isinstance(out2.text, str)
