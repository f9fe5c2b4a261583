"""Sesame CSM-1B: llama backbone + depth decoder over Mimi codes.

Parity: /root/reference/mlx_audio/tts/models/sesame/sesame.py (SesameModel
:301, generate_frame :361, token frame layout [32 audio + 1 text] w/ masks
:406-426, Segment voice-clone context :428, generate :730).

TPU redesign: generate_frame (backbone step + 31 unrolled depth-decoder
sub-steps + sampling) compiles into a lax.scan chunk exactly like the
qwen3_tts talker loop; the depth decoder's per-frame cache is a small
fixed-shape buffer reset by construction each step. Audio decodes through
the Mimi family (codec/models/mimi), streaming or offline.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, init_embedding, init_linear
from ....ops.kvcache import KVCache
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..llama import ModelConfig as LlamaConfig
from ..llama.llama import init_llama, llama_forward

Array = jax.Array

MAX_CACHE_LEN = 2048
CHUNK_FRAMES = 16  # ~1.28 s of audio per compiled chunk at 12.5 Hz


@dataclass
class Segment:
    speaker: int
    text: str
    audio: Optional[np.ndarray] = None  # (T,) at 24 kHz


_FLAVORS = {
    "llama-1B": dict(hidden_size=2048, num_hidden_layers=16,
                     intermediate_size=8192, num_attention_heads=32,
                     num_key_value_heads=8, head_dim=64,
                     rope_theta=500000.0),
    "llama-100M": dict(hidden_size=1024, num_hidden_layers=4,
                       intermediate_size=8192, num_attention_heads=8,
                       num_key_value_heads=2, head_dim=128,
                       rope_theta=500000.0),
}


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "sesame"
    backbone_flavor: str = "llama-1B"
    decoder_flavor: str = "llama-100M"
    text_vocab_size: int = 128256
    audio_vocab_size: int = 2051
    audio_num_codebooks: int = 32
    audio_eos_token_id: int = 0
    codebook_eos_token_id: int = 0
    sample_rate: int = 24000
    backbone_config: Optional[dict] = None
    depth_decoder_config: Optional[dict] = None
    codec_config: Optional[dict] = None
    model_path: str = ""
    # generation-policy flags (reference sesame.py:459-466)
    voice_match: bool = True
    use_default_voice_prompt: bool = True
    speaker_prefix_space: bool = False

    @classmethod
    def from_dict(cls, config: dict):
        """Accept both this package's schema and the HF transformers
        `CsmConfig` flat schema (the canonical sesame/csm-1b hub repo:
        backbone dims at top level, nested depth_decoder_config and
        codec_config, vocab_size = audio codebook vocab)."""
        if isinstance(config, dict) and (
                config.get("model_type") == "csm"
                or "num_codebooks" in config):
            bb_keys = ("hidden_size", "num_hidden_layers",
                       "num_attention_heads", "num_key_value_heads",
                       "head_dim", "intermediate_size", "rope_theta",
                       "rms_norm_eps", "max_position_embeddings",
                       "rope_scaling")
            return cls(
                text_vocab_size=config.get("text_vocab_size", 128256),
                audio_vocab_size=config.get("vocab_size", 2051),
                audio_num_codebooks=config.get("num_codebooks", 32),
                codebook_eos_token_id=config.get("codebook_eos_token_id", 0),
                audio_eos_token_id=config.get("codebook_eos_token_id", 0),
                backbone_config={k: config[k] for k in bb_keys
                                 if config.get(k) is not None},
                depth_decoder_config=config.get("depth_decoder_config"),
                codec_config=config.get("codec_config"),
                model_path=config.get("model_path", ""),
                voice_match=config.get("voice_match", True),
                use_default_voice_prompt=config.get(
                    "use_default_voice_prompt", True),
                speaker_prefix_space=config.get("speaker_prefix_space",
                                                False))
        return super().from_dict(config)

    def llama_configs(self):
        bb = dict(_FLAVORS[self.backbone_flavor])
        dec = dict(_FLAVORS[self.decoder_flavor])
        if self.backbone_config:
            bb.update({k: v for k, v in self.backbone_config.items()
                       if k in LlamaConfig.__dataclass_fields__})
        if self.depth_decoder_config:
            dec.update({k: v for k, v in self.depth_decoder_config.items()
                        if k in LlamaConfig.__dataclass_fields__})
        bb["vocab_size"] = 1  # embeddings are external
        dec["vocab_size"] = 1
        return LlamaConfig(**bb), LlamaConfig(**dec)


class Model(FunctionalModel):
    """CSM voice-cloning TTS."""

    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.bb_cfg, self.dec_cfg = config.llama_configs()
        self.tokenizer = None
        self._mimi = None

    @property
    def sample_rate(self):
        return self.config.sample_rate

    # -- params --------------------------------------------------------------

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 8))
        bb = init_llama(next(ks), self.bb_cfg, lm_head=False)["model"]
        dec = init_llama(next(ks), self.dec_cfg, lm_head=False)["model"]
        bb.pop("embed_tokens")
        dec.pop("embed_tokens")
        return {
            "backbone": bb,
            "decoder": dec,
            "text_embeddings": init_embedding(next(ks), c.text_vocab_size,
                                              self.bb_cfg.hidden_size),
            "audio_embeddings": init_embedding(
                next(ks), c.audio_vocab_size * c.audio_num_codebooks,
                self.bb_cfg.hidden_size),
            "projection": init_linear(next(ks), self.bb_cfg.hidden_size,
                                      self.dec_cfg.hidden_size, bias=False),
            "codebook0_head": init_linear(next(ks), self.bb_cfg.hidden_size,
                                          c.audio_vocab_size, bias=False),
            "audio_head": jax.random.normal(
                next(ks), (c.audio_num_codebooks - 1,
                           self.dec_cfg.hidden_size, c.audio_vocab_size),
            ) * 0.02,
        }

    def _remap_hf(self, weights):
        """HF transformers `CsmForConditionalGeneration` keys -> this tree.
        The embedded Mimi codec (codec_model.*) is stashed for
        post_load_hook to build the audio tokenizer from."""
        out = {}
        codec = {}
        for k, w in weights.items():
            if k.startswith("codec_model."):
                codec[k[len("codec_model."):]] = w
            elif k == "backbone_model.embed_tokens.embed_audio_tokens.weight":
                out["audio_embeddings.weight"] = w
            elif k == "embed_text_tokens.weight":
                out["text_embeddings.weight"] = w
            elif k == "lm_head.weight":
                out["codebook0_head.weight"] = w
            elif k == "depth_decoder.model.inputs_embeds_projector.weight":
                out["projection.weight"] = w
            elif k == "depth_decoder.codebooks_head.weight":
                out["audio_head"] = w
            elif k == "depth_decoder.model.embed_tokens.weight":
                # untied fine-tunes get their own in-loop table; tied
                # checkpoints produce a copy of audio_embeddings here
                out["decoder_audio_embeddings.weight"] = w
            elif k.startswith("depth_decoder.model."):
                out["decoder." + k[len("depth_decoder.model."):]] = w
            elif k.startswith("backbone_model."):
                out["backbone." + k[len("backbone_model."):]] = w
            else:
                out[k] = w
        self._hf_codec_weights = codec or None
        return out

    def sanitize(self, weights):
        """Map CSM checkpoint keys -> this tree. Real sesame/csm-1b weights
        come in two layouts: the original torchtune naming (attn/output_proj,
        mlp.w1/w2/w3, sa_norm/mlp_norm with `scale`; reference
        sesame.py:577-602 remaps the same) and the HF transformers CSM
        naming (backbone_model/depth_decoder/codec_model). Already-converted
        trees pass through."""
        if any(k.startswith(("backbone_model.", "depth_decoder."))
               for k in weights):
            weights = self._remap_hf(weights)
        out = {}
        for k, w in weights.items():
            if "rotary_emb" in k or k.endswith(".kv_cache.k_cache") \
                    or k.endswith(".kv_cache.v_cache"):
                continue
            if k.startswith("model."):
                k = k[len("model."):]
            if ".attn." in k:
                k = k.replace(".attn.", ".self_attn.")
                k = k.replace(".output_proj.", ".o_proj.")
            if ".mlp." in k:
                k = (k.replace(".mlp.w1.", ".mlp.gate_proj.")
                      .replace(".mlp.w2.", ".mlp.down_proj.")
                      .replace(".mlp.w3.", ".mlp.up_proj."))
            if ".sa_norm." in k:
                k = k.replace(".sa_norm.", ".input_layernorm.")
                k = k.replace(".scale", ".weight")
            elif ".mlp_norm." in k:
                k = k.replace(".mlp_norm.", ".post_attention_layernorm.")
                k = k.replace(".scale", ".weight")
            elif k in ("backbone.norm.scale", "decoder.norm.scale"):
                k = k.replace(".scale", ".weight")
            out[k] = w
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model.tokenizer = None
        codec = getattr(model, "_hf_codec_weights", None)
        if codec is not None and model._mimi is None:
            # HF csm checkpoints embed the Mimi codec — build it in-place
            from ....codec.models.mimi import Mimi
            from ....utils import unflatten

            mimi = Mimi(model.config.codec_config or {})
            mimi.bind(unflatten(mimi.sanitize(codec)))
            model._mimi = mimi
            model._hf_codec_weights = None
        return model

    # -- embeddings ----------------------------------------------------------

    def _embed_frame_tokens(self, params, tokens, tokens_mask):
        """tokens (B, T, 33) int; mask (B, T, 33) -> summed embeds (B, T, D).

        Layout: [:, :, :32] audio codes per codebook, [:, :, 32] text token
        (reference _embed_tokens :409-426)."""
        c = self.config
        text = apply_embedding(params["text_embeddings"], tokens[:, :, -1])
        offsets = (jnp.arange(c.audio_num_codebooks)
                   * c.audio_vocab_size)[None, None, :]
        audio = apply_embedding(params["audio_embeddings"],
                                tokens[:, :, :-1] + offsets)
        embeds = jnp.concatenate([audio, text[:, :, None, :]], axis=2)
        return jnp.sum(embeds * tokens_mask[..., None], axis=2)

    # -- compiled frame machinery --------------------------------------------

    def _decode_frame(self, params, last_h, c0, sampler_key, temperature,
                      top_k):
        """Depth-decode codebooks 1..N-1 given backbone hidden + codebook0."""
        from ....ops.sampling import top_k_top_p_filter

        c = self.config
        b = last_h.shape[0]

        def sample(k, lg):
            lg = lg.astype(jnp.float32)
            greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(lg / jnp.maximum(temperature, 1e-6),
                                    top_k=top_k)
            drawn = jax.random.categorical(k, lg, axis=-1).astype(jnp.int32)
            return jnp.where(temperature <= 0.0, greedy, drawn)

        caches = [KVCache.init(b, c.audio_num_codebooks + 2,
                               self.dec_cfg.num_key_value_heads,
                               self.dec_cfg.resolved_head_dim, last_h.dtype)
                  for _ in range(self.dec_cfg.num_hidden_layers)]
        # untied HF fine-tunes carry a separate depth-decoder table; the
        # tied default falls back to the shared backbone audio table
        dec_table = params.get("decoder_audio_embeddings",
                               params["audio_embeddings"])
        c0_embed = apply_embedding(dec_table, c0[:, None])
        curr_h = jnp.concatenate([last_h[:, None], c0_embed], axis=1)
        samples = [c0]
        offset = 0
        key = sampler_key
        for i in range(1, c.audio_num_codebooks):
            proj = apply_linear(params["projection"], curr_h)
            dec_h, caches = llama_forward(
                {"model": params["decoder"]}, self.dec_cfg, proj,
                caches=caches, offset=jnp.int32(offset))
            offset += curr_h.shape[1]
            logits = jnp.einsum("bd,dv->bv", dec_h[:, -1],
                                params["audio_head"][i - 1])
            key, sub = jax.random.split(key)
            ci = sample(sub, logits)
            samples.append(ci)
            curr_h = apply_embedding(
                dec_table, (ci + i * c.audio_vocab_size)[:, None])
        return jnp.stack(samples, axis=-1), key  # (B, 32)

    def _make_chunk_stepper(self, chunk: int, temperature: float, top_k: int):
        c = self.config
        from ....ops.sampling import top_k_top_p_filter

        def sample(k, lg):
            lg = lg.astype(jnp.float32)
            greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg2 = top_k_top_p_filter(lg / jnp.maximum(temperature, 1e-6),
                                     top_k=top_k)
            drawn = jax.random.categorical(k, lg2, axis=-1).astype(jnp.int32)
            return jnp.where(temperature <= 0.0, greedy, drawn)

        def chunk_step(params, carry):
            def step(cr, _):
                (caches, embed, pos, finished, key) = cr
                h, caches = llama_forward(
                    {"model": params["backbone"]}, self.bb_cfg, embed,
                    caches=caches, offset=pos)
                last_h = h[:, -1]
                logits0 = apply_linear(params["codebook0_head"], last_h)
                key, k0 = jax.random.split(key)
                c0 = sample(k0, logits0)
                frame, key = self._decode_frame(params, last_h, c0, key,
                                                temperature, top_k)
                now_fin = finished | (c0 == c.codebook_eos_token_id)
                # next input: the generated audio frame (text slot = 0/masked)
                b = frame.shape[0]
                toks = jnp.concatenate(
                    [frame, jnp.zeros((b, 1), jnp.int32)], axis=-1)[:, None]
                mask = jnp.concatenate(
                    [jnp.ones((b, 1, c.audio_num_codebooks), bool),
                     jnp.zeros((b, 1, 1), bool)], axis=-1)
                embed_next = self._embed_frame_tokens(params, toks, mask)
                return (caches, embed_next, pos + 1, now_fin, key), \
                    (frame, now_fin)

            carry2, (frames, fins) = jax.lax.scan(step, carry, None,
                                                  length=chunk)
            return carry2, frames, fins

        return jax.jit(chunk_step)

    # -- prompt assembly -----------------------------------------------------

    def _tokenize_text_segment(self, text: str, speaker: int):
        if self.tokenizer is None:
            raise ValueError("No tokenizer; pass text_ids instead.")
        if self.config.speaker_prefix_space:
            ids = self.tokenizer.encode(f"[{speaker}] {text.lstrip()}")
        else:
            ids = self.tokenizer.encode(f"[{speaker}]{text}")
        return np.asarray(ids)

    def build_prompt(self, text_ids: np.ndarray,
                     context_frames: Optional[np.ndarray] = None):
        """-> (tokens (1, T, 33) int32, mask (1, T, 33) bool).

        Text tokens occupy the text slot; optional voice-clone context frames
        (T_ctx, 32) occupy the audio slots (reference :502-575)."""
        c = self.config
        rows, masks = [], []
        if context_frames is not None:
            for fr in np.asarray(context_frames):
                row = np.zeros(c.audio_num_codebooks + 1, np.int32)
                row[:c.audio_num_codebooks] = fr
                m = np.zeros(c.audio_num_codebooks + 1, bool)
                m[:c.audio_num_codebooks] = True
                rows.append(row)
                masks.append(m)
        for tid in np.asarray(text_ids).reshape(-1):
            row = np.zeros(c.audio_num_codebooks + 1, np.int32)
            row[-1] = tid
            m = np.zeros(c.audio_num_codebooks + 1, bool)
            m[-1] = True
            rows.append(row)
            masks.append(m)
        return (np.asarray(rows, np.int32)[None],
                np.asarray(masks, bool)[None])

    # -- generation ----------------------------------------------------------

    def _audio_rows(self, frames: np.ndarray, add_eos: bool = True):
        """Code frames (T, 32) -> prompt rows/mask (T[+1], 33) in the audio
        slots; optional all-zero EOS frame (reference _tokenize_audio
        :527-561)."""
        c = self.config
        frames = np.asarray(frames, np.int32)
        if add_eos:
            frames = np.concatenate(
                [frames, np.zeros((1, frames.shape[1]), np.int32)], axis=0)
        rows = np.zeros((frames.shape[0], c.audio_num_codebooks + 1),
                        np.int32)
        rows[:, :c.audio_num_codebooks] = frames
        mask = np.zeros_like(rows, bool)
        mask[:, :c.audio_num_codebooks] = True
        return rows, mask

    def _text_rows(self, text: str, speaker: int):
        c = self.config
        ids = np.asarray(self._tokenize_text_segment(text, speaker),
                         np.int32).reshape(-1)
        rows = np.zeros((len(ids), c.audio_num_codebooks + 1), np.int32)
        rows[:, -1] = ids
        mask = np.zeros_like(rows, bool)
        mask[:, -1] = True
        return rows, mask

    def _segment_rows(self, segment: Segment, add_eos: bool = True):
        """[segment text rows, segment audio rows(+eos)] (reference
        _tokenize_segment :563-579)."""
        tr, tm = self._text_rows(segment.text, segment.speaker)
        if segment.audio is None:
            return tr, tm
        if self._mimi is None:
            raise RuntimeError(
                "voice-clone context requires the Mimi codec "
                "(load a checkpoint that embeds it)")
        frames = np.asarray(self._mimi.encode(segment.audio)[0].T)
        ar, am = self._audio_rows(frames, add_eos=add_eos)
        return (np.concatenate([tr, ar], axis=0),
                np.concatenate([tm, am], axis=0))

    def default_speaker_prompt(self, voice: str) -> List[Segment]:
        """Offline voice presets: prompts/{voice}.wav (+.txt transcript)
        inside the model directory (the reference pulls the same files from
        the sesame/csm-1b hub repo, :614-651)."""
        from pathlib import Path

        base = Path(self.config.model_path or ".") / "prompts"
        wav = base / f"{voice}.wav"
        txt = base / f"{voice}.txt"
        if not wav.exists():
            raise ValueError(
                f"voice preset '{voice}' not found: place {wav} (and "
                f"{txt.name}) in the model directory, or pass "
                "ref_audio/ref_text")
        if not txt.exists():
            raise ValueError(
                f"voice preset '{voice}' is missing its transcript {txt}")
        from ....utils import load_audio

        audio = load_audio(str(wav), sample_rate=self.sample_rate)
        return [Segment(speaker=0, text=txt.read_text().strip(),
                        audio=np.asarray(audio))]

    def _frame_stream(self, tokens: np.ndarray, mask: np.ndarray,
                      temperature: float, top_k: int, max_frames: int,
                      seed: int):
        """Run the compiled decode; yields np code-frame batches (k, 32)."""
        plen = tokens.shape[1]
        pb = 1 << max(4, (plen - 1).bit_length())
        tokens = np.pad(tokens, ((0, 0), (0, pb - plen), (0, 0)))
        mask = np.pad(mask, ((0, 0), (0, pb - plen), (0, 0)))

        pkey = ("prefill", pb, temperature, top_k)
        prefill = self._jit_cache.get(pkey)
        if prefill is None:
            prefill = self._prefill_fn(temperature, top_k)
            self._jit_cache[pkey] = prefill
        carry, first_frame, first_fin = prefill(
            self.params, jnp.asarray(tokens), jnp.asarray(mask),
            jnp.int32(plen), jax.random.PRNGKey(seed))

        skey = ("chunk", CHUNK_FRAMES, temperature, top_k)
        stepper = self._jit_cache.get(skey)
        if stepper is None:
            stepper = self._make_chunk_stepper(CHUNK_FRAMES, temperature,
                                               top_k)
            self._jit_cache[skey] = stepper
        done = bool(np.asarray(first_fin).any())
        n = 0
        if not done:
            yield np.asarray(first_frame)
            n = 1
        while not done and n < max_frames:
            carry, frames, fins = stepper(self.params, carry)
            fr = np.asarray(frames)[:, 0]
            fi = np.asarray(fins)[:, 0]
            k = int(np.argmax(fi)) if fi.any() else len(fr)
            k = min(k, max_frames - n)
            if k > 0:
                yield fr[:k]
            n += k
            done = bool(fi.any())

    def generate(
        self,
        text=None,
        voice: Optional[str] = None,
        *,
        text_ids: Optional[np.ndarray] = None,
        speaker: int = 0,
        context: Optional[List[Segment]] = None,
        context_frames: Optional[np.ndarray] = None,
        split_pattern: Optional[str] = r"\n+",
        temperature: float = 0.9,
        top_k: int = 50,
        max_audio_length_ms: float = 90_000,
        ref_audio=None,
        ref_text: Optional[str] = None,
        stream: bool = False,
        streaming_interval: float = 0.5,
        voice_match: Optional[bool] = None,
        seed: int = 0,
        mimi=None,
        **kwargs,
    ):
        """Reference generate :730-865: ref_audio/ref_text become the
        context segment; `voice` loads a local prompts/{voice} preset;
        voice_match merges context+prompt text over the context audio
        (no EOS frame) for seamless cloning; split_pattern yields one
        result stream per text segment; stream=True yields audio chunks
        every streaming_interval seconds through the causal Mimi streaming
        decoder (bit-exact with the offline decode).

        `mimi`: a bound codec/models/mimi Mimi for audio decode; when
        absent, raw code frames are returned in the result's prompt dict.
        """
        if voice_match is None:
            voice_match = self.config.voice_match
        mimi = mimi or self._mimi
        max_frames = int(max_audio_length_ms / 80)
        interval_frames = max(1, int(streaming_interval * 12.5))

        # ---- legacy direct-ids path (also used by tests/benches) ----
        if text_ids is not None:
            if context and context_frames is None and self._mimi is not None:
                enc = [np.asarray(self._mimi.encode(s.audio)[0].T)
                       for s in context if s.audio is not None]
                if enc:
                    context_frames = np.concatenate(enc, axis=0)
            tokens, mask = self.build_prompt(text_ids, context_frames)
            yield from self._run_segment(tokens, mask, 0, temperature,
                                         top_k, max_frames, seed, stream,
                                         interval_frames, mimi)
            return

        # ---- reference flow ----
        if ref_audio is not None and not isinstance(ref_audio, np.ndarray):
            from ....utils import load_audio
            ref_audio = np.asarray(load_audio(
                ref_audio, sample_rate=self.sample_rate))
        context = list(context or [])
        if not context and ref_audio is not None and ref_text is not None:
            context = [Segment(speaker=speaker, text=ref_text,
                               audio=ref_audio)]
        elif (not context and ref_audio is None
              and self.config.use_default_voice_prompt and voice is not None):
            context = self.default_speaker_prompt(voice)

        if isinstance(text, str):
            import re
            prompts = ([p for p in re.split(split_pattern, text.strip())
                        if p.strip()] if split_pattern else [text])
        else:
            prompts = list(text)

        for seg_idx, prompt in enumerate(prompts):
            current = list(context)
            if voice_match and current:
                merged = (current[0].text + " " + prompt).strip()
                current = [Segment(speaker=speaker, text=merged,
                                   audio=current[0].audio)]
            rows, masks = [], []
            for s in current:
                r, m = self._segment_rows(s, add_eos=not voice_match)
                rows.append(r)
                masks.append(m)
            if not voice_match or not current:
                r, m = self._text_rows(prompt, speaker)
                rows.append(r)
                masks.append(m)
            tokens = np.concatenate(rows, axis=0)[None]
            mask = np.concatenate(masks, axis=0)[None]
            if tokens.shape[1] >= MAX_CACHE_LEN - max_frames:
                raise ValueError(
                    "Inputs too long, must be below "
                    f"{MAX_CACHE_LEN - max_frames} frames")
            yield from self._run_segment(tokens, mask, seg_idx, temperature,
                                         top_k, max_frames, seed + seg_idx,
                                         stream, interval_frames, mimi)

    def _run_segment(self, tokens, mask, seg_idx, temperature, top_k,
                     max_frames, seed, stream, interval_frames, mimi):
        t0 = time.time()
        plen = tokens.shape[1]
        pending: List[np.ndarray] = []
        all_codes: List[np.ndarray] = []
        mimi_state = None
        n_pending = 0

        def result(audio, codes_n, final):
            nonlocal t0
            seg_time = time.time() - t0
            dur = len(audio) / self.sample_rate
            r = GenerationResult(
                audio=audio, samples=len(audio),
                sample_rate=self.sample_rate, segment_idx=seg_idx,
                token_count=codes_n,
                audio_duration=format_duration(dur),
                real_time_factor=round(seg_time / dur, 3) if dur else 0.0,
                prompt={"tokens": int(plen), "tokens-per-sec":
                        round(plen / seg_time, 2) if seg_time else 0,
                        "codes": np.concatenate(all_codes, axis=0)
                        if all_codes else np.zeros(
                            (0, self.config.audio_num_codebooks), np.int32)},
                audio_samples={"samples": len(audio), "samples-per-sec":
                               round(len(audio) / seg_time, 2)
                               if seg_time else 0},
                processing_time_seconds=seg_time,
                peak_memory_usage=peak_memory_gb(),
                is_streaming_chunk=stream and not final,
                is_final_chunk=final,
            )
            t0 = time.time()
            return r

        for batch in self._frame_stream(tokens, mask, temperature, top_k,
                                        max_frames, seed):
            all_codes.append(batch)
            pending.append(batch)
            n_pending += len(batch)
            if stream and mimi is not None and n_pending >= interval_frames:
                frames = np.concatenate(pending, axis=0)
                if mimi_state is None:
                    # state capacity counts post-upsample transformer frames
                    mimi_state = mimi.init_decode_stream_state(
                        1, (max_frames + 8) * mimi.downsample_stride)
                mimi_state, audio = mimi.decode_step(
                    mimi_state, jnp.asarray(frames.T[None]))
                yield result(np.asarray(audio)[0, 0], n_pending, final=False)
                pending, n_pending = [], 0

        if stream and mimi is not None:
            if pending:
                frames = np.concatenate(pending, axis=0)
                if mimi_state is None:
                    mimi_state = mimi.init_decode_stream_state(
                        1, (max_frames + 8) * mimi.downsample_stride)
                mimi_state, audio = mimi.decode_step(
                    mimi_state, jnp.asarray(frames.T[None]))
                yield result(np.asarray(audio)[0, 0], n_pending, final=True)
            return

        codes = (np.concatenate(all_codes, axis=0) if all_codes
                 else np.zeros((0, self.config.audio_num_codebooks),
                               np.int32))
        if mimi is not None and len(codes):
            audio = np.asarray(mimi.decode(jnp.asarray(codes.T[None])))[0, 0]
        else:
            audio = np.zeros((len(codes) * 1920,), np.float32)
        yield result(audio, len(codes), final=True)

    def _prefill_fn(self, temperature: float, top_k: int):
        """Jitted prefill closed over static sampling config (the previous
        revision hardcoded top_k=50 regardless of the caller's value)."""
        c = self.config
        from ....ops.sampling import top_k_top_p_filter

        def prefill(params, tokens, mask, plen, key):
            b = tokens.shape[0]
            caches = [KVCache.init(b, MAX_CACHE_LEN,
                                   self.bb_cfg.num_key_value_heads,
                                   self.bb_cfg.resolved_head_dim,
                                   jnp.float32)
                      for _ in range(self.bb_cfg.num_hidden_layers)]
            embeds = self._embed_frame_tokens(params, tokens, mask)
            pad_mask = jnp.broadcast_to(
                jnp.where(jnp.arange(MAX_CACHE_LEN) < plen,
                          0.0, -jnp.inf)[None],
                (b, MAX_CACHE_LEN))
            h, caches = llama_forward(
                {"model": params["backbone"]}, self.bb_cfg, embeds,
                caches=caches, offset=0, mask=pad_mask)
            last_h = h[jnp.arange(b), plen - 1]
            logits0 = apply_linear(params["codebook0_head"], last_h)
            greedy = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(
                logits0.astype(jnp.float32) / max(temperature, 1e-6),
                top_k=top_k)
            key, k0 = jax.random.split(key)
            drawn = jax.random.categorical(k0, lg, axis=-1).astype(jnp.int32)
            c0 = greedy if temperature <= 0.0 else drawn
            frame, key = self._decode_frame(params, last_h, c0, key,
                                            temperature, top_k)
            toks = jnp.concatenate([frame, jnp.zeros((b, 1), jnp.int32)],
                                   axis=-1)[:, None]
            m = jnp.concatenate(
                [jnp.ones((b, 1, c.audio_num_codebooks), bool),
                 jnp.zeros((b, 1, 1), bool)], axis=-1)
            embed_next = self._embed_frame_tokens(params, toks, m)
            finished = frame[:, 0] == c.codebook_eos_token_id
            return (caches, embed_next, plen, finished, key), frame, finished

        return jax.jit(prefill)
