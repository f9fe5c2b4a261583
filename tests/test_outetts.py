"""OuteTTS: prompt format, token extraction, compiled decode loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.outetts import (Model, ModelConfig,
                                              PromptProcessor)
from mlx_audio_tpu.tts.models.outetts.prompt import normalize_text


class FakeTok:
    """Single-token encodings for specials; bytes for everything else.

    ids: 0..255 raw chars, 1000..2024 c1, 3000..4024 c2, 5000+ specials.
    """

    eos_token_id = 5001

    def __init__(self):
        self.specials = {}
        from mlx_audio_tpu.tts.models.outetts.prompt import SpecialTokens
        st = SpecialTokens()
        nxt = 5000
        for name, s in st.to_dict().items():
            if "{}" in s or "{:.2f}" in s:
                continue
            self.specials[s] = nxt
            nxt += 1
        for i in range(1025):
            self.specials[st.c1.format(i)] = 1000 + i
            self.specials[st.c2.format(i)] = 3000 + i

    def encode(self, text, add_special_tokens=False):
        out = []
        i = 0
        while i < len(text):
            matched = None
            if text[i] == "<":
                j = text.find(">", i)
                if j != -1 and text[i:j + 1] in self.specials:
                    matched = text[i:j + 1]
            if matched:
                out.append(self.specials[matched])
                i += len(matched)
            else:
                out.append(ord(text[i]) % 256)
                i += 1
        return out


class FakeDAC:
    def from_codes(self, codes):
        return codes

    def decode(self, z):
        t = z.shape[-1]
        return jnp.zeros((1, t * 512, 1))


def _tiny_model():
    cfg = ModelConfig(hidden_size=32, num_hidden_layers=2,
                      intermediate_size=64, num_attention_heads=4,
                      num_key_value_heads=2, vocab_size=6000,
                      rope_theta=10000.0)
    m = Model(cfg).init_and_bind()
    m._tokenizer = FakeTok()
    m._codec = FakeDAC()
    return m


class TestPrompt:
    def test_normalize(self):
        assert normalize_text("a\n\tb…  “x”") == 'a b... "x"'

    def test_completion_prompt_plain(self):
        p = PromptProcessor(FakeTok())
        s = p.get_completion_prompt("hello")
        assert s.startswith("<|im_start|>\n<|text_start|>hello")
        assert s.endswith("<|audio_start|>\n")

    def test_completion_prompt_with_speaker(self):
        p = PromptProcessor(FakeTok())
        speaker = {"text": "hi there",
                   "words": [{"word": "hi", "duration": 0.21,
                              "features": {"energy": 3},
                              "c1": [1, 2], "c2": [3, 4]},
                             {"word": "there", "duration": 0.4,
                              "features": {}, "c1": [5], "c2": [6]}]}
        s = p.get_completion_prompt("ok", speaker)
        assert "<|word_start|>hi<|features|><|t_0.21|><|energy_3|>" in s
        assert "<|c1_1|><|c2_3|><|c1_2|><|c2_4|>" in s
        # speaker text merged with separator, prompt ends open for gen
        assert "hi there. ok" in s
        assert s.endswith("<|word_start|>")

    def test_extract_audio_tokens(self):
        p = PromptProcessor(FakeTok())
        toks = [42, 1000 + 7, 3000 + 9, 99, 1000 + 8, 3000 + 10, 1000 + 11]
        cb = p.extract_audio_from_tokens(toks)
        assert cb == [[7, 8], [9, 10]]  # trailing unpaired c1 dropped

    def test_cjk_separator(self):
        p = PromptProcessor(FakeTok())
        merged, sep = p.merge_speaker_text("続き", "こんにちは")
        assert sep == "。"
        assert merged == "こんにちは。続き"


class TestChunkText:
    def test_splits_long_text(self):
        m = _tiny_model()
        text = ". ".join(["word " * 12] * 5)
        chunks = m.chunk_text(text, max_words=30)
        assert len(chunks) >= 2
        assert all(len(c.split()) <= 36 for c in chunks)

    def test_short_text_single_chunk(self):
        m = _tiny_model()
        assert m.chunk_text("hello world") == ["hello world"]


class TestGenerate:
    def test_generate_produces_audio(self):
        m = _tiny_model()
        results = list(m.generate("hi", max_tokens=24, seed=0))
        # random weights may or may not emit c1/c2 pairs; both are legal,
        # but the call must complete and any audio must be well-formed
        for r in results:
            assert r.samples > 0
            assert r.sample_rate == 24000

    def test_decode_respects_max_tokens(self):
        m = _tiny_model()
        proc = m._processor()
        ids = np.asarray(m._tokenizer.encode(
            proc.get_completion_prompt("test")), np.int32)
        outs = list(m._decode_tokens(ids, 16, 1.0, 1.0, 0, 0.0, 1.0, 0))
        assert len(outs[-1]) <= 16

    def test_stop_token_ends_generation(self):
        m = _tiny_model()
        # force logits to always pick audio_end by biasing embed? instead:
        # verify that a stream containing the stop id truncates history
        proc = m._processor()
        stop = m._tokenizer.specials["<|audio_end|>"]
        # decode loop must finish well before max when stop id sampled;
        # with temperature ~0 the argmax token is fixed — just check the
        # generator terminates
        ids = np.asarray(m._tokenizer.encode(
            proc.get_completion_prompt("x")), np.int32)
        outs = list(m._decode_tokens(ids, 8, 0.0, 1.0, 0, 0.0, 1.0, 1))
        assert len(outs) >= 1


class TestSanitize:
    def test_prefix_handling(self):
        m = Model(ModelConfig(hidden_size=8, num_hidden_layers=1,
                              intermediate_size=16, num_attention_heads=2,
                              num_key_value_heads=2, vocab_size=32))
        out = m.sanitize({
            "model.model.layers.0.self_attn.q_proj.weight": jnp.ones((2, 2)),
            "model.lm_head.weight": jnp.ones((2, 2)),
            "embed_tokens.weight": jnp.ones((2, 2)),
        })
        assert "model.layers.0.self_attn.q_proj.weight" in out
        assert "lm_head.weight" in out
        assert "model.embed_tokens.weight" in out
