"""CLI flag-surface parity with the reference CLIs.

Reference flag inventories: tts/generate.py:452-642, stt/generate.py:22-110,
sts/generate.py:39-82, convert.py:700-745.  Dash-style reference names and
this repo's underscore forms must both parse.
"""


class TestTTSFlags:
    def test_model_specific_knobs(self):
        from mlx_audio_tpu.tts.generate import parse_args

        a = parse_args([
            "--model", "m", "--text", "t", "--cfg_scale", "2.0",
            "--steps", "8", "--instruct", "warm voice",
            "--exaggeration", "0.4", "--gender", "female", "--pitch", "1.2",
            "--sigma", "0.5", "--use_zero_spk_emb", "--min_p", "0.05",
            "--stg_scale", "1.0", "--stg_block", "2",
            "--rescale_scale", "0.3", "--ddpm_steps", "30",
            "--gen_duration", "5.0", "--duration_multiplier", "1.1",
            "--prompt", "p", "--stream", "--save",
        ])
        assert a.cfg_scale == 2.0 and a.steps == 8
        assert a.instruct == "warm voice" and a.exaggeration == 0.4
        assert a.gender == "female" and a.pitch == 1.2
        assert a.sigma == 0.5 and a.use_zero_spk_emb
        assert a.min_p == 0.05 and a.stg_scale == 1.0 and a.stg_block == 2
        assert a.rescale_scale == 0.3 and a.ddpm_steps == 30
        assert a.gen_duration == 5.0 and a.duration_multiplier == 1.1
        assert a.prompt == "p" and a.stream and a.save

    def test_unknown_knob_is_filtered_not_fatal(self, tmp_path):
        """generate_audio drops knobs the model's generate() rejects."""
        import numpy as np

        from mlx_audio_tpu.tts.generate import generate_audio

        class FakeResult:
            audio = np.zeros(16, np.float32)
            sample_rate = 24000
            segment_idx = 0
            samples = 16
            audio_duration = "0.0s"
            prompt = {"tokens": 1, "tokens-per-sec": 1.0}
            audio_samples = {"samples": 16, "samples-per-sec": 1.0}
            real_time_factor = 0.0
            processing_time_seconds = 0.0
            peak_memory_usage = 0.0

        seen = {}

        class FakeModel:
            sample_rate = 24000

            def generate(self, text, voice=None, speed=1.0, lang_code="a",
                         temperature=0.7):
                seen.update(temperature=temperature)
                yield FakeResult()

        generate_audio("hi", model=FakeModel(), verbose=False,
                       output_path=str(tmp_path), cfg_scale=3.0,
                       gender="male", temperature=0.5)
        assert seen == {"temperature": 0.5}


class TestSTTFlags:
    def test_dash_and_underscore_aliases(self):
        from mlx_audio_tpu.stt.generate import parse_args

        a = parse_args(["--model", "m", "--audio", "x.wav",
                        "--output-path", "o", "--max-tokens", "64",
                        "--chunk-duration", "20", "--frame-threshold", "25",
                        "--prefill-step-size", "1024",
                        "--max-parallel-segments", "4",
                        "--gen-kwargs", '{"beam_size": 5}',
                        "--context", "names", "--prompt", "p",
                        "--text", "align me", "--stream"])
        assert a.output_path == "o" and a.max_tokens == 64
        assert a.chunk_duration == 20.0 and a.frame_threshold == 25
        assert a.prefill_step_size == 1024 and a.batch_size == 4
        assert a.gen_kwargs == {"beam_size": 5}
        assert a.context == "names" and a.prompt == "p"
        assert a.text == "align me" and a.stream

        b = parse_args(["--model", "m", "--audio", "x.wav",
                        "--output_path", "o", "--max_tokens", "64",
                        "--chunk_duration", "20"])
        assert b.output_path == "o" and b.max_tokens == 64
        assert b.chunk_duration == 20.0

    def test_generate_transcription_filters_kwargs(self, tmp_path):
        from mlx_audio_tpu.stt.generate import generate_transcription
        from mlx_audio_tpu.stt.models.base import STTOutput

        seen = {}

        class FakeModel:
            def generate(self, audio, language=None, beam_size=1):
                seen.update(language=language, beam_size=beam_size)
                return STTOutput(text="ok")

        out = generate_transcription(
            "m", "f.wav", model=FakeModel(), verbose=False,
            language="en", chunk_duration=30.0, frame_threshold=25,
            gen_kwargs={"beam_size": 5})
        assert out.text == "ok"
        assert seen == {"language": "en", "beam_size": 5}

    def test_streaming_accumulation(self):
        from mlx_audio_tpu.stt.generate import generate_transcription
        from mlx_audio_tpu.stt.models.base import STTOutput

        class FakeModel:
            def generate(self, audio, stream=False):
                assert stream
                yield STTOutput(text="hello ", segments=[{"id": 0}])
                yield STTOutput(text="world", segments=[{"id": 1}])

        out = generate_transcription("m", "f.wav", model=FakeModel(),
                                     verbose=False, stream=True)
        assert out.text == "hello world"
        assert [s["id"] for s in out.segments] == [0, 1]


class TestSTSFlags:
    def test_flags(self):
        import argparse

        from mlx_audio_tpu.sts import generate as sts_gen

        parser_args = ["--model", "m", "--audio", "a.wav",
                       "--output-path", "o.wav", "--version", "3",
                       "--subfolder", "v3", "--stream"]
        # main() parses then calls generate_sts; patch it to capture
        captured = {}

        def fake_generate(model, audio, output_path, **kw):
            captured.update(model=model, output_path=output_path, **kw)

        orig = sts_gen.generate_sts
        sts_gen.generate_sts = fake_generate
        try:
            sts_gen.main(parser_args)
        finally:
            sts_gen.generate_sts = orig
        assert captured["output_path"] == "o.wav"
        assert captured["version"] == 3 and captured["subfolder"] == "v3"
        assert captured["stream"] is True


class TestConvertFlags:
    def test_model_domain_alias_and_new_flags(self):
        import mlx_audio_tpu.convert as cv

        captured = {}
        orig = cv.convert
        cv.convert = lambda **kw: captured.update(kw)
        try:
            cv.main(["--model", "src", "--output", "dst",
                     "--model-domain", "tts", "--dequantize",
                     "--revision", "abc123"])
        finally:
            cv.convert = orig
        assert captured["domain"] == "tts"
        assert captured["dequantize"] is True
        assert captured["revision"] == "abc123"
