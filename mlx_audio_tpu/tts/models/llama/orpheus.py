"""Orpheus-style llama token-TTS over SNAC (model_type "llama").

Parity: reference tts/models/llama/llama.py — the Orpheus-3B / Svara-TTS
family: prompt framing [SOH] text [EOT EOH] (:226-312) with "voice: text"
prefixes (:261-262), zeroprompt voice cloning from reference audio via SNAC
encode (:189-224), sampling temperature 0.6 / top_p 0.8 with repetition
penalty 1.3 over a 20-token context (:385-395), stop at EOS_SPEECH 128258,
SNAC codes parsed after the last SOS 128257 with offset 128266 in 7-token
frames (parse_output :146-187), and streaming decode every
streaming_interval*137.5 tokens with 8-latent-frame SNAC context
(decode_audio_stream :77-95, snac decode_stream).

TPU design: the decode loop runs as compiled chunk steppers — bucketed
prefill, then `lax.scan` blocks of CHUNK tokens with in-graph sampling,
the rolling 20-token repetition-penalty window and stop detection; the
host only inspects a per-chunk stop flag. SNAC decodes only the new
complete frames per streaming interval (plus fixed context), instead of
re-decoding the accumulated sequence.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....ops.sampling import apply_repetition_penalty, make_sampler
from ..base import GenerationResult, format_duration
from .llama import ModelConfig as LlamaConfig
from .llama import init_caches, init_llama, llama_forward, logits_from_hidden

Array = jax.Array

# Orpheus special token ids (reference llama.py:146-215)
SOH = 128259          # start of human turn
EOT = 128009          # end of text
EOH = 128260          # end of human turn
SOA = 128261          # start of audio
SOS = 128257          # start of speech codes
EOS_SPEECH = 128258   # end of speech codes
EOA = 128262          # end of audio
CODE_OFFSET = 128266  # first SNAC code token id

CHUNK = 32
PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096)
REP_WINDOW = 20  # reference repetition_context_size (llama.py:393)
TOKENS_PER_SECOND = 137.5  # reference streaming heuristic (llama.py:396)


def flat_codes_to_layers(codes: np.ndarray) -> List[np.ndarray]:
    """De-interleave flat 7-per-frame Orpheus codes into the 3 SNAC layers
    (reference codes_to_layers llama.py:57-75). codes: (7*F,) with the
    per-slot 4096*k offsets still applied."""
    frames = codes.reshape(-1, 7).astype(np.int64)
    l1 = frames[:, 0]
    l2 = np.stack([frames[:, 1] - 4096, frames[:, 4] - 4 * 4096],
                  axis=1).reshape(-1)
    l3 = np.stack([frames[:, 2] - 2 * 4096, frames[:, 3] - 3 * 4096,
                   frames[:, 5] - 5 * 4096, frames[:, 6] - 6 * 4096],
                  axis=1).reshape(-1)
    return [l1[None], l2[None], l3[None]]


def layers_to_flat_codes(layers: List[np.ndarray]) -> np.ndarray:
    """Interleave SNAC layers (F, 2F, 4F) back into flat 7-per-frame codes
    with per-slot offsets (reference encode_audio_to_codes llama.py:108-129)."""
    l1 = np.asarray(layers[0]).reshape(-1)
    l2 = np.asarray(layers[1]).reshape(-1)
    l3 = np.asarray(layers[2]).reshape(-1)
    n = len(l1)
    out = np.empty((n, 7), np.int64)
    out[:, 0] = l1
    out[:, 1] = l2[0::2] + 4096
    out[:, 2] = l3[0::4] + 2 * 4096
    out[:, 3] = l3[1::4] + 3 * 4096
    out[:, 4] = l2[1::2] + 4 * 4096
    out[:, 5] = l3[2::4] + 5 * 4096
    out[:, 6] = l3[3::4] + 6 * 4096
    return out.reshape(-1)


@dataclass
class ModelConfig(LlamaConfig):
    model_type: str = "llama"
    tokenizer_name: str = ""
    sample_rate: int = 24000


class Model(FunctionalModel):
    """Orpheus llama TTS: text -> llama AR decode -> SNAC audio."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self._codec = None  # bound SNAC (post_load_hook)
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_llama(key, self.config)

    # ------------------------------------------------------------ prompts

    def _encode_text(self, text: str) -> List[int]:
        if self._tokenizer is None:
            raise RuntimeError(
                "orpheus/llama TTS needs its HF tokenizer (place tokenizer "
                "files in the model directory)")
        return list(self._tokenizer.encode(text))

    def encode_audio_to_codes(self, audio: np.ndarray) -> np.ndarray:
        """ref audio -> flat offset codes (reference llama.py:108-129)."""
        if self._codec is None:
            raise RuntimeError("no SNAC codec bound (model._codec)")
        layers = self._codec.encode(np.asarray(audio, np.float32)[None, None])
        return layers_to_flat_codes([np.asarray(x) for x in layers])

    def prepare_zeroprompt(self, ref_audio: np.ndarray,
                           ref_text: str) -> List[int]:
        """[SOH] ref_text [EOT EOH] [SOA SOS] codes [EOS EOA] (reference
        prepare_zeroprompt llama.py:189-224). Note: the upstream model card
        reports audio cloning as unreliable on Orpheus itself."""
        codes = (self.encode_audio_to_codes(ref_audio) + CODE_OFFSET).tolist()
        return ([SOH] + self._encode_text(ref_text) + [EOT, EOH]
                + [SOA, SOS] + codes + [EOS_SPEECH, EOA])

    def prepare_input_ids(self, prompt: str, voice: Optional[str] = None,
                          zeroprompt: Optional[List[int]] = None) -> np.ndarray:
        """[zeroprompt] [SOH] ["voice: "]text [EOT EOH] (reference
        prepare_input_ids llama.py:226-312)."""
        if voice is not None and zeroprompt is None:
            prompt = f"{voice}: {prompt}"
        ids = [SOH] + self._encode_text(prompt) + [EOT, EOH]
        if zeroprompt is not None:
            ids = list(zeroprompt) + ids
        return np.asarray(ids, np.int32)

    @staticmethod
    def parse_codes(token_ids: List[int]) -> np.ndarray:
        """Tokens -> flat offset codes: crop after the last SOS, drop
        EOS_SPEECH, trim to whole 7-token frames, subtract CODE_OFFSET
        (reference parse_output llama.py:146-187)."""
        arr = np.asarray(token_ids, np.int64)
        sos = np.flatnonzero(arr == SOS)
        if len(sos):
            arr = arr[sos[-1] + 1:]
        arr = arr[arr != EOS_SPEECH]
        arr = arr[: (len(arr) // 7) * 7]
        return arr - CODE_OFFSET

    # ---------------------------------------------------- compiled decode

    def _stepper(self, bucket: int, temperature: float, top_p: float,
                 top_k: int, rep_pen: float, stop_ids: tuple):
        key_ = ("step", bucket, temperature, top_p, top_k, rep_pen, stop_ids)
        fn = self._jit_cache.get(key_)
        if fn is None:
            cfg = self.config
            sampler = make_sampler(temperature=temperature, top_p=top_p,
                                   top_k=top_k)
            stops = jnp.asarray(stop_ids, jnp.int32)

            def prefill(p, prompt, length, cap):
                caches = init_caches(cfg, 1, cap, dtype=jnp.float32)
                pad_mask = jnp.where(
                    jnp.arange(caches[0].k.shape[1])[None, :] < length[:, None],
                    0.0, jnp.finfo(jnp.float32).min)
                hidden, caches = llama_forward(
                    p, cfg, prompt, caches=caches, offset=jnp.int32(0),
                    mask=pad_mask)
                last = jnp.take_along_axis(
                    hidden, (length - 1)[:, None, None]
                    .astype(jnp.int32).repeat(hidden.shape[-1], 2), axis=1)
                logits = logits_from_hidden(p, cfg, last)[:, 0]
                history = jnp.full((1, REP_WINDOW), -1, jnp.int32)
                return logits, caches, history

            def chunk(p, logits, caches, history, t0, rng, done0):
                def _step(p, token, caches, offset):
                    hidden, caches = llama_forward(
                        p, cfg, token, caches=caches, offset=offset)
                    return logits_from_hidden(p, cfg, hidden)[:, -1], caches

                def body(carry, i):
                    lg, caches, hist, key, done = carry
                    key, sub = jax.random.split(key)
                    lg = apply_repetition_penalty(lg, hist, rep_pen)
                    nxt = sampler(sub, lg).astype(jnp.int32)
                    is_stop = jnp.any(nxt[0] == stops)
                    done2 = jnp.logical_or(done, is_stop)
                    hist = jnp.roll(hist, -1, axis=1).at[:, -1].set(
                        jnp.where(done2, -1, nxt[0]))
                    lg2, caches = _step(p, nxt[:, None], caches, t0 + i)
                    tok_out = jnp.where(done2, -1, nxt[0])
                    return (lg2, caches, hist, key, done2), tok_out

                (lg, caches, history, rng, done), toks = jax.lax.scan(
                    body, (logits, caches, history, rng, done0),
                    jnp.arange(CHUNK))
                return lg, caches, history, rng, done, toks

            fn = (jax.jit(prefill, static_argnames=("cap",)), jax.jit(chunk))
            self._jit_cache[key_] = fn
        return fn

    def _decode_tokens(self, prompt_ids: np.ndarray, max_tokens: int,
                       temperature: float, top_p: float, top_k: int,
                       rep_pen: float, seed: int):
        """Yields the accumulating generated-token list chunk by chunk."""
        stop_ids = [EOS_SPEECH]
        eos = getattr(self._tokenizer, "eos_token_id", None)
        if eos is not None:
            stop_ids.append(int(eos))
        stop_ids = tuple(sorted(set(stop_ids)))

        n = len(prompt_ids)
        bucket = next((b for b in PROMPT_BUCKETS if n <= b),
                      ((n + 511) // 512) * 512)
        prompt = np.zeros((1, bucket), np.int32)
        prompt[0, :n] = prompt_ids
        prefill, chunk = self._stepper(bucket, temperature, top_p, top_k,
                                       rep_pen, stop_ids)
        cap = bucket + ((max_tokens + CHUNK - 1) // CHUNK) * CHUNK
        rng = jax.random.PRNGKey(seed)
        logits, caches, history = prefill(self.params, jnp.asarray(prompt),
                                          jnp.asarray([n]), cap)
        generated: List[int] = []
        done = jnp.bool_(False)
        t = jnp.int32(n)
        while len(generated) < max_tokens:
            steps = min(CHUNK, max_tokens - len(generated))
            logits, caches, history, rng, done, toks = chunk(
                self.params, logits, caches, history, t, rng, done)
            t = t + CHUNK
            arr = np.asarray(toks)[:steps]
            arr = arr[arr >= 0]
            generated.extend(int(x) for x in arr)
            yield list(generated)
            if bool(done):
                break

    # ------------------------------------------------------------ generate

    def generate(self, text: str, voice: Optional[str] = None,
                 temperature: float = 0.6, top_p: float = 0.8,
                 split_pattern: str = "\n", max_tokens: int = 1200,
                 verbose: bool = False, ref_audio=None,
                 ref_text: Optional[str] = None, stream: bool = False,
                 streaming_interval: float = 2.0, seed: int = 0, **kwargs):
        if ref_audio is not None and not isinstance(ref_audio, np.ndarray):
            from ....utils import load_audio
            ref_audio = load_audio(ref_audio, sample_rate=self.sample_rate)

        prompt_text = text.replace("\\n", "\n").replace("\\t", "\t")
        prompts = [p for p in re.split(re.escape(split_pattern), prompt_text)
                   if p.strip()] or [prompt_text]

        zeroprompt = None
        if ref_audio is not None and ref_text is not None:
            zeroprompt = self.prepare_zeroprompt(np.asarray(ref_audio),
                                                 ref_text)

        top_k = int(kwargs.get("top_k", 0) or 0)
        rep_pen = float(kwargs.get("repetition_penalty", 1.3))
        interval_tokens = max(7, int(streaming_interval * TOKENS_PER_SECOND))

        for seg_idx, segment in enumerate(prompts):
            input_ids = self.prepare_input_ids(segment, voice, zeroprompt)
            t0 = time.perf_counter()
            yielded_tokens = 0
            consumed_codes = 0
            snac_context = None
            final_tokens: List[int] = []
            prompt_list = input_ids.tolist()
            for generated in self._decode_tokens(
                    input_ids, max_tokens, temperature, top_p, top_k,
                    rep_pen, seed + seg_idx):
                final_tokens = generated
                if stream and (len(generated) - yielded_tokens
                               >= interval_tokens):
                    codes = self.parse_codes(prompt_list + generated)
                    new = codes[consumed_codes:]
                    if len(new) >= 7:
                        audio, snac_context = self._decode_audio_stream(
                            new, snac_context)
                        if audio is not None and len(audio) > 0:
                            yield self._result(
                                audio, t0,
                                len(generated) - yielded_tokens, seg_idx)
                            yielded_tokens = len(generated)
                            consumed_codes += (len(new) // 7) * 7
                            t0 = time.perf_counter()
            codes = self.parse_codes(prompt_list + final_tokens)
            if stream:
                new = codes[consumed_codes:]
                if len(new) >= 7:
                    audio, _ = self._decode_audio_stream(new, snac_context)
                    if audio is not None and len(audio) > 0:
                        yield self._result(
                            audio, t0, len(final_tokens) - yielded_tokens,
                            seg_idx)
            elif len(codes) >= 7:
                if self._codec is None:
                    raise RuntimeError("no SNAC codec bound (model._codec)")
                layers = flat_codes_to_layers(self._clip_codes(codes))
                audio = np.asarray(self._codec.decode(
                    [jnp.asarray(x) for x in layers])).reshape(-1)
                yield self._result(audio, t0, len(final_tokens), seg_idx)

    def stream_generate(self, text: str, voice: Optional[str] = None,
                        **kwargs):
        """Streaming alias (reference llama.py:521-567)."""
        kwargs["stream"] = True
        yield from self.generate(text, voice=voice, **kwargs)

    def _clip_codes(self, codes: np.ndarray) -> np.ndarray:
        # random/degenerate samples can land outside the codebook; clamp
        # instead of relying on gather-clamp semantics inside the codec
        size = getattr(self._codec.config, "codebook_size", 4096) \
            if self._codec is not None else 4096
        frames = codes.reshape(-1, 7)
        slots = np.arange(7) * 4096
        return np.clip(frames - slots, 0, size - 1).reshape(-1) + \
            np.repeat(slots[None], len(frames), 0).reshape(-1)

    def _decode_audio_stream(self, new_codes: np.ndarray, context
                             ) -> Tuple[Optional[np.ndarray], object]:
        if self._codec is None:
            raise RuntimeError("no SNAC codec bound (model._codec)")
        new_codes = new_codes[: (len(new_codes) // 7) * 7]
        layers = flat_codes_to_layers(self._clip_codes(new_codes))
        audio, context = self._codec.decode_stream(
            [jnp.asarray(x) for x in layers], context, context_frames=8)
        return np.asarray(audio).reshape(-1), context

    def _result(self, audio: np.ndarray, t0: float, token_count: int,
                seg_idx: int) -> GenerationResult:
        dt = time.perf_counter() - t0
        dur = len(audio) / self.sample_rate
        return GenerationResult(
            audio=jnp.asarray(audio), samples=len(audio),
            sample_rate=self.sample_rate, segment_idx=seg_idx,
            token_count=token_count, audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 2) if dt else 0.0,
            prompt={"tokens": token_count,
                    "tokens-per-sec": round(token_count / dt, 2)
                    if dt else 0.0},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)
                           if dt else 0.0},
            processing_time_seconds=dt, peak_memory_usage=0.0)

    # ------------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            if k.endswith("rotary_emb.inv_freq"):
                continue
            if k.startswith("model.model.") or k.startswith("model.lm_head"):
                k = k[len("model."):]
            elif not k.startswith("model.") and not k.startswith("lm_head"):
                k = "model." + k
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        model_path = Path(model_path)
        try:
            from transformers import AutoTokenizer
            model._tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model._tokenizer = None
        for sub in ("snac", "codec"):
            if (model_path / sub).exists():
                try:
                    from ....utils import base_load_model
                    model._codec = base_load_model(
                        str(model_path / sub), category="codec",
                        model_remapping={"snac": "snac"})
                    break
                except Exception:
                    model._codec = None
        return model


__all__ = ["Model", "ModelConfig", "flat_codes_to_layers",
           "layers_to_flat_codes"]
