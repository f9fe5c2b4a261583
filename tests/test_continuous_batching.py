"""Continuous-batching session tests (tiny qwen3 config, broker requests)."""

import numpy as np
import pytest

from mlx_audio_tpu.server_inference import InferenceRequest
from mlx_audio_tpu.tts.continuous import TTSBatchOptions


@pytest.fixture(scope="module")
def model():
    from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig

    cfg = ModelConfig(
        talker_config=dict(
            vocab_size=300, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, num_code_groups=4, text_hidden_size=48,
            text_vocab_size=500, codec_eos_token_id=280, codec_think_id=284,
            codec_nothink_id=285, codec_think_bos_id=286,
            codec_think_eos_id=287, codec_pad_id=278, codec_bos_id=279,
            code_predictor_config=dict(
                vocab_size=256, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=8, num_code_groups=4)),
        tokenizer_config=dict(decoder_config=dict(
            latent_dim=32, codebook_dim=16, codebook_size=256, decoder_dim=64,
            hidden_size=24, intermediate_size=48, head_dim=8,
            num_attention_heads=3, num_hidden_layers=2, num_key_value_heads=3,
            num_quantizers=4, num_semantic_quantizers=1, sliding_window=16,
            upsample_rates=[4, 3], upsampling_ratios=[2, 2])),
    )
    return Model(cfg).init_and_bind()


def _req(lo, hi):
    return InferenceRequest(
        endpoint_kind="tts", model_name="m", payload=None,
        normalized_kwargs={"text_ids": np.arange(lo, hi)[None]})


def _drain(req):
    kinds, payloads = [], []
    while not req.result_queue.empty():
        c = req.result_queue.get()
        kinds.append(c.kind)
        payloads.append(c.payload)
    return kinds, payloads


class TestContinuousSession:
    def test_two_requests_with_midstream_admission(self, model):
        sess = model.create_tts_batch_session(
            TTSBatchOptions(max_batch_size=2, max_tokens=16,
                            streaming_interval=0.4))
        # streaming_interval 0.4 s @ 12.5 Hz -> 5 frames per compiled step
        assert sess.frames_per_step == 5
        r1 = _req(10, 25)
        sess.submit(r1)
        assert not sess.idle
        assert sess.available_slots == 1
        for _ in range(2):       # 1 (step0) + 2x5 frames = 11 < max_tokens
            sess.step()
        r2 = _req(30, 42)
        sess.submit(r2)
        assert sess.available_slots == 0
        for _ in range(40):
            sess.step()
            if sess.idle:
                break
        assert sess.idle
        for r in (r1, r2):
            kinds, payloads = _drain(r)
            assert kinds[-1] == "done"
            assert "data" in kinds
            audio = np.concatenate(
                [p["audio"] for p in payloads if p and "audio" in p])
            assert len(audio) % model.total_upsample == 0
            assert np.isfinite(audio).all()

    def test_cold_burst_admits_in_one_step(self, model):
        """With no live streams to protect, a burst of submissions is
        admitted in ONE batched prefill on the first step (serial
        admission measured >2 s TTFA for the last stream at b=8), and
        every request completes."""
        sess = model.create_tts_batch_session(
            TTSBatchOptions(max_batch_size=4, max_tokens=8,
                            streaming_interval=0.4, admits_per_step=1))
        reqs = [_req(10 + i, 22 + i) for i in range(4)]
        for r in reqs:
            sess.submit(r)
        assert sess.available_slots == 0
        assert len(sess._admit_queue) == 4
        sess.step()
        assert len(sess._admit_queue) == 0   # cold burst: all admitted
        assert sum(bool(c) for c in sess.codes) == 4
        for _ in range(40):
            sess.step()
            if sess.idle:
                break
        assert sess.idle
        for r in reqs:
            kinds, payloads = _drain(r)
            assert kinds[-1] == "done"
            audio = np.concatenate(
                [p["audio"] for p in payloads if p and "audio" in p])
            assert len(audio) % model.total_upsample == 0

    def test_staggered_admission_with_live_streams(self, model):
        """Once a stream is live, later submissions are throttled to
        admits_per_step per step so running rows keep streaming between
        prompt prefills — and every request still completes."""
        sess = model.create_tts_batch_session(
            TTSBatchOptions(max_batch_size=4, max_tokens=12,
                            streaming_interval=0.4, admits_per_step=1))
        first = _req(9, 21)
        sess.submit(first)
        sess.step()                      # admits + starts streaming row 0
        assert sum(bool(c) for c in sess.codes) == 1
        late = [_req(10 + i, 22 + i) for i in range(3)]
        for r in late:
            sess.submit(r)
        assert len(sess._admit_queue) == 3
        sess.step()
        assert len(sess._admit_queue) == 2   # exactly one admitted
        sess.step()
        assert len(sess._admit_queue) == 1
        for _ in range(40):
            sess.step()
            if sess.idle:
                break
        assert sess.idle
        for r in [first, *late]:
            kinds, payloads = _drain(r)
            assert kinds[-1] == "done"
            audio = np.concatenate(
                [p["audio"] for p in payloads if p and "audio" in p])
            assert len(audio) % model.total_upsample == 0

    def test_cancel_while_queued(self, model):
        """Cancelling a request that is still waiting for admission must
        free the slot without ever prefilling it."""
        sess = model.create_tts_batch_session(
            TTSBatchOptions(max_batch_size=2, max_tokens=8,
                            admits_per_step=1))
        r1, r2 = _req(5, 15), _req(6, 16)
        sess.submit(r1)
        sess.submit(r2)
        sess.cancel(r2.request_id)
        for _ in range(20):
            sess.step()
            if sess.idle:
                break
        assert sess.idle
        kinds, _ = _drain(r1)
        assert kinds[-1] == "done"

    def test_cancel_frees_slot(self, model):
        sess = model.create_tts_batch_session(
            TTSBatchOptions(max_batch_size=2, max_tokens=16))
        r = _req(5, 15)
        sess.submit(r)
        sess.cancel(r.request_id)
        assert sess.idle

    def test_fail_emits_errors(self, model):
        sess = model.create_tts_batch_session(
            TTSBatchOptions(max_batch_size=2, max_tokens=16))
        r = _req(5, 15)
        sess.submit(r)
        sess.fail(RuntimeError("stopping"))
        kinds, _ = _drain(r)
        assert "error" in kinds and kinds[-1] == "done"
        assert sess.idle


class TestSessionParity:
    def test_greedy_session_matches_single_stream(self, model):
        """temperature=0: the batched session's audio must exactly match the
        single-stream compiled stepper (pins the KV-splice column layout,
        row-local RoPE, trailing-embed advance and pad-embed handling)."""
        text_ids = np.arange(10, 26)[None]
        single = np.concatenate([
            np.asarray(r.audio)
            for r in model.generate(text_ids=text_ids, temperature=0.0,
                                    repetition_penalty=1.0, max_tokens=12,
                                    stream=True, streaming_interval=0.4)])

        sess = model.create_tts_batch_session(
            TTSBatchOptions(max_batch_size=2, max_tokens=12,
                            temperature=0.0, repetition_penalty=1.0,
                            streaming_interval=0.4))
        req = _req(10, 26)
        sess.submit(req)
        for _ in range(30):
            sess.step()
            if sess.idle:
                break
        assert sess.idle
        kinds, payloads = _drain(req)
        assert kinds[-1] == "done"
        batched = np.concatenate(
            [p["audio"] for p in payloads if p and "audio" in p])
        n = min(len(single), len(batched))
        assert n > 0
        np.testing.assert_allclose(batched[:n], single[:n],
                                   rtol=2e-2, atol=2e-3)
