"""Qwen3 token-TTS (VyvoTTS): Qwen3 LM emitting SNAC-interleaved codes.

Parity: /root/reference/mlx_audio/tts/models/qwen3/qwen3.py
(special-token prompt frame :19-30, SNAC 7-token interleave
decode_audio_from_codes :43-62 / encode :65-87, zeroprompt voice cloning
:167-199, segment-split generate with streaming :296-407).

TPU design: the LM decode is the shared compiled DEC_CHUNK stepper with
in-graph repetition penalty (context 20); SNAC decode happens on host per
segment. The SNAC codec binds as `model.snac` (offline env — no hub pull).
"""

from __future__ import annotations

import time
from typing import Generator, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, apply_rms_norm
from ....ops.rope import rope_freqs
from ....stt.models.qwen3_lm import (
    make_decode_fns,
    prompt_bucket,
    run_decode,
)
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..moss_tts.config import Qwen3LMConfig
from ..moss_tts.moss_tts import init_qwen3_lm
from ..qwen3_tts.talker import qwen3_layer_forward

Array = jax.Array

TOKENIZER_LENGTH = 151669
START_OF_TEXT = 151643
END_OF_TEXT = 151645
START_OF_SPEECH = TOKENIZER_LENGTH + 1
END_OF_SPEECH = TOKENIZER_LENGTH + 2
START_OF_HUMAN = TOKENIZER_LENGTH + 3
END_OF_HUMAN = TOKENIZER_LENGTH + 4
START_OF_AI = TOKENIZER_LENGTH + 5
END_OF_AI = TOKENIZER_LENGTH + 6
PAD_TOKEN = TOKENIZER_LENGTH + 7
AUDIO_TOKENS_START = TOKENIZER_LENGTH + 10


class ModelConfig(Qwen3LMConfig):
    pass


def interleave_snac_codes(l1, l2, l3) -> List[int]:
    """SNAC layers -> flat 7-token groups with per-slot offsets
    (ref encode_audio_to_codes :65-87)."""
    out = []
    for i in range(len(l1)):
        out.extend([
            l1[i],
            l2[2 * i] + 4096,
            l3[4 * i] + 2 * 4096,
            l3[4 * i + 1] + 3 * 4096,
            l2[2 * i + 1] + 4 * 4096,
            l3[4 * i + 2] + 5 * 4096,
            l3[4 * i + 3] + 6 * 4096,
        ])
    return out


def deinterleave_snac_codes(code_list) -> tuple:
    """Flat 7-token groups -> (layer1, layer2, layer3) id lists
    (ref decode_audio_from_codes :43-62)."""
    l1, l2, l3 = [], [], []
    for i in range((len(code_list) + 1) // 7):
        g = code_list[7 * i:7 * i + 7]
        l1.append(g[0])
        l2.append(g[1] - 4096)
        l3.append(g[2] - 2 * 4096)
        l3.append(g[3] - 3 * 4096)
        l2.append(g[4] - 4 * 4096)
        l3.append(g[5] - 5 * 4096)
        l3.append(g[6] - 6 * 4096)
    return l1, l2, l3


def parse_output(ids: List[int]) -> List[int]:
    """Crop after the last START_OF_SPEECH, drop END_OF_SPEECH, trim to a
    multiple of 7, rebase to SNAC ids (ref parse_output :117-160)."""
    starts = [i for i, t in enumerate(ids) if t == START_OF_SPEECH]
    if starts:
        ids = ids[starts[-1] + 1:]
    ids = [t for t in ids if t != END_OF_SPEECH]
    ids = ids[:(len(ids) // 7) * 7]
    return [t - AUDIO_TOKENS_START for t in ids]


class Model(FunctionalModel):
    """VyvoTTS (Qwen3 + SNAC)."""

    SAMPLE_RATE = 24000

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None
        self.snac = None       # bound SNAC codec (24 kHz)

    @property
    def sample_rate(self) -> int:
        return self.SAMPLE_RATE

    def init_params(self, key):
        cfg = self.config
        k1, k2 = jax.random.split(key)
        p = {"model": init_qwen3_lm(k1, cfg)}
        if not cfg.tie_word_embeddings:
            from ....nn import init_linear

            p["lm_head"] = init_linear(k2, cfg.hidden_size, cfg.vocab_size,
                                       bias=False)
        return p

    def sanitize(self, weights):
        out = {}
        for k, v in weights.items():
            if k.endswith("rotary_emb.inv_freq"):
                continue
            if k == "lm_head.weight" and self.config.tie_word_embeddings:
                continue
            out[k] = jnp.asarray(v)
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model.tokenizer = None
        return model

    # ------------------------------------------------------------ decode

    def _forward(self, p, embeds, caches, offset, pad_mask):
        cfg = self.config
        x = embeds
        t = x.shape[1]
        positions = offset + jnp.arange(t)[None, :]
        inv_freq = rope_freqs(cfg.head_dim, cfg.rope_theta)
        new_caches = []
        for i in range(cfg.num_hidden_layers):
            x, nc = qwen3_layer_forward(
                p["model"]["layers"][str(i)], x, positions, inv_freq,
                cfg.num_attention_heads, cfg.num_key_value_heads,
                cfg.head_dim, cfg.rms_norm_eps, caches[i], offset, pad_mask,
                causal=True)
            new_caches.append(nc)
        return apply_rms_norm(p["model"]["norm"], x,
                              cfg.rms_norm_eps), new_caches

    def _logits(self, p, hidden):
        if "lm_head" in p:
            return apply_linear(p["lm_head"], hidden)
        return hidden @ p["model"]["embed_tokens"]["weight"].T

    # ------------------------------------------------------------ prompt

    def prepare_zeroprompt(self, ref_audio: np.ndarray, ref_text: str
                           ) -> List[int]:
        if self.snac is None:
            raise RuntimeError("voice cloning needs the SNAC codec bound "
                               "(model.snac = ...)")
        codes = self.snac.encode(
            jnp.asarray(ref_audio, jnp.float32)[None, None])
        l1 = np.asarray(codes[0]).reshape(-1).tolist()
        l2 = np.asarray(codes[1]).reshape(-1).tolist()
        l3 = np.asarray(codes[2]).reshape(-1).tolist()
        audio_ids = [t + AUDIO_TOKENS_START
                     for t in interleave_snac_codes(l1, l2, l3)]
        text_ids = list(self.tokenizer.encode(ref_text))
        return ([START_OF_HUMAN] + text_ids + [END_OF_TEXT, END_OF_HUMAN,
                                               START_OF_AI, START_OF_SPEECH]
                + audio_ids + [END_OF_SPEECH, END_OF_AI])

    def prepare_input_ids(self, prompt: str, voice: Optional[str] = None,
                          zeroprompt: Optional[List[int]] = None
                          ) -> List[int]:
        if voice is not None and zeroprompt is None:
            prompt = f"{voice}: {prompt}"
        ids = ([START_OF_HUMAN] + list(self.tokenizer.encode(prompt))
               + [END_OF_TEXT, END_OF_HUMAN])
        return (zeroprompt or []) + ids

    # ---------------------------------------------------------- generate

    def _decode_snac(self, code_list: List[int]) -> np.ndarray:
        if not code_list:
            return np.zeros((0,), np.float32)
        if self.snac is None:
            # codec-less fallback keeps tests/bench runnable
            return np.zeros((len(code_list) // 7 * 2048,), np.float32)
        l1, l2, l3 = deinterleave_snac_codes(code_list)
        audio = self.snac.decode([jnp.asarray([l1]), jnp.asarray([l2]),
                                  jnp.asarray([l3])])
        return np.asarray(audio).reshape(-1)

    def generate(self, text: str, voice: Optional[str] = None,
                 temperature: float = 0.6, top_p: float = 0.8,
                 split_pattern: str = "\n", max_tokens: int = 1200,
                 ref_audio=None, ref_text: Optional[str] = None,
                 stream: bool = False, streaming_interval: float = 2.0,
                 seed: int = 0, verbose: bool = False, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not initialized")
        if isinstance(ref_audio, str):
            from ....utils import load_audio

            ref_audio = np.asarray(load_audio(ref_audio,
                                              sample_rate=self.sample_rate))
        zeroprompt = None
        if ref_audio is not None and ref_text is not None:
            zeroprompt = self.prepare_zeroprompt(ref_audio, ref_text)

        prompts = [p for p in text.replace("\\n", "\n").replace("\\t", "\t")
                   .split(split_pattern) if p.strip()]
        rep = float(kwargs.get("repetition_penalty", 1.3))
        rep_ctx = int(kwargs.get("repetition_context_size", 20))
        top_k = int(kwargs.get("top_k", 0))

        for seg_idx, seg in enumerate(prompts):
            t0 = time.perf_counter()
            ids = self.prepare_input_ids(seg, voice, zeroprompt)
            n = len(ids)
            pb = prompt_bucket(n)
            padded = np.zeros((1, pb), np.int32)
            padded[0, :n] = ids
            embeds = np.asarray(apply_embedding(
                self.params["model"]["embed_tokens"], jnp.asarray(padded)))
            key_ = ("lm", pb, temperature, top_p, top_k, rep, rep_ctx)
            fns = self._jit_cache.get(key_)
            if fns is None:
                fns = make_decode_fns(
                    text_config=self.config,
                    lm_params=lambda p: p["model"],
                    logits_fn=self._logits, forward_fn=self._forward,
                    bucket=pb, max_new=max(max_tokens, 512),
                    temperature=temperature, top_p=top_p, top_k=top_k,
                    eos_ids=(END_OF_SPEECH,), repetition_penalty=rep,
                    repetition_context_size=rep_ctx)
                self._jit_cache[key_] = fns
            emitted = {"samples": 0, "tokens": 0}
            stream_out: List[GenerationResult] = []
            all_tokens: List[int] = []

            def on_token(tok, _seg=seg_idx):
                all_tokens.append(tok)
                if not stream:
                    return
                interval_toks = max(int(streaming_interval * 137.5), 7)
                if len(all_tokens) % interval_toks:
                    return
                codes = parse_output(ids + all_tokens)
                audio = self._decode_snac(codes)
                if len(audio) > emitted["samples"]:
                    stream_out.append(self._result(
                        audio[emitted["samples"]:], _seg,
                        len(all_tokens) - emitted["tokens"], t0,
                        streaming=True))
                    emitted["samples"] = len(audio)
                    emitted["tokens"] = len(all_tokens)

            tokens = run_decode(self, fns, embeds, n,
                                max_tokens=max_tokens, seed=seed + seg_idx,
                                on_token=on_token)
            yield from stream_out
            codes = parse_output(ids + tokens)
            audio = self._decode_snac(codes)
            if len(audio) > emitted["samples"]:
                yield self._result(audio[emitted["samples"]:], seg_idx,
                                   len(tokens) - emitted["tokens"], t0,
                                   final=True)

    def _result(self, audio, seg, n_tokens, t0, streaming=False,
                final=False) -> GenerationResult:
        dt = max(time.perf_counter() - t0, 1e-6)
        dur = len(audio) / self.sample_rate
        return GenerationResult(
            audio=np.asarray(audio), samples=len(audio),
            sample_rate=self.sample_rate, segment_idx=seg,
            token_count=n_tokens, audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3),
            prompt={"tokens": n_tokens,
                    "tokens-per-sec": round(n_tokens / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb(),
            is_streaming_chunk=streaming, is_final_chunk=final)


__all__ = ["Model", "ModelConfig", "parse_output", "interleave_snac_codes",
           "deinterleave_snac_codes", "START_OF_SPEECH", "END_OF_SPEECH",
           "AUDIO_TOKENS_START"]
