"""DeepFilterNet2/3 speech enhancement runtime.

Parity: reference sts/models/deepfilternet/model.py — Vorbis-window STFT
with libDF wnorm (:303-420), 10*log10 ERB features + exponential band
mean/unit norms with the libDF alpha rounding (:362-399, :425-458),
DF-coefficient spectral reconstruction, delay compensation
(fft - hop, :399-420) and streaming.py's hop-wise state machine
(analysis/synthesis OLA memories, EMA states, conv history buffers, GRU
hiddens :58-120).

TPU design: the offline path is one jitted program per frame bucket —
the EMA feature norms run as lax.scan *inside* the graph (the reference
loops them on the host per frame). The streamer carries an explicit state
pytree (EMA + GRU hiddens + exactly-sized conv/DF history frames) through
a jitted fixed-chunk step whose causal convs consume real history frames
with VALID time padding, so streamed output is bit-identical to offline.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import istft as dsp_istft, stft as dsp_stft
from ....model import FunctionalModel
from .config import DeepFilterNetConfig, config_for_version
from . import network as N

Array = jax.Array

FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def vorbis_window(size: int) -> np.ndarray:
    n = np.arange(size, dtype=np.float32)
    inner = np.sin(0.5 * np.pi * (n + 0.5) / (size // 2))
    return np.sin(0.5 * np.pi * inner * inner).astype(np.float32)


def norm_alpha(hop: int, sr: int) -> float:
    """libDF get_norm_alpha rounding (reference model.py:357-366)."""
    a_raw = math.exp(-hop / sr)
    precision = 3
    a = 1.0
    while a >= 1.0:
        a = round(a_raw, precision)
        precision += 1
    return a


def _ema_mean_norm(x: Array, state: Array, alpha: float
                   ) -> Tuple[Array, Array]:
    """(T, E) band dB features -> unit-ish norm; scan over time."""
    def step(s, xi):
        s2 = xi * (1 - alpha) + s * alpha
        return s2, (xi - s2) / 40.0
    s, out = jax.lax.scan(step, state, x)
    return out, s


def _ema_unit_norm(x_ri: Array, state: Array, alpha: float
                   ) -> Tuple[Array, Array]:
    """(T, D, 2) complex features / sqrt(EMA magnitude)."""
    mag = jnp.sqrt(jnp.sum(x_ri * x_ri, axis=-1) + 0.0)
    def step(s, inp):
        m, ri = inp
        s2 = m * (1 - alpha) + s * alpha
        return s2, ri / jnp.sqrt(s2)[:, None]
    s, out = jax.lax.scan(step, state, (mag, x_ri))
    return out, s


class Model(FunctionalModel):
    def __init__(self, config: DeepFilterNetConfig = None, **kwargs):
        if config is None:
            config = config_for_version(kwargs) if kwargs else \
                DeepFilterNetConfig()
        elif isinstance(config, dict):
            config = config_for_version(config)
        super().__init__(config)
        p = config
        self.wnorm = 1.0 / (p.fft_size * p.fft_size / (2.0 * p.hop_size))
        self.window = vorbis_window(p.fft_size)
        self.alpha = norm_alpha(p.hop_size, p.sample_rate)
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return N.init_dfnet(key, self.config)

    # ------------------------------------------------------- features

    def _features(self, spec_ri: Array, erb_state: Array,
                  df_state: Array):
        p = self.config
        mag_sq = jnp.sum(spec_ri * spec_ri, axis=-1)          # (T, F)
        erb = mag_sq @ self.params["erb_fb"]
        erb_db = 10.0 * jnp.log10(erb + 1e-10)
        feat_erb, erb_state = _ema_mean_norm(erb_db, erb_state,
                                             self.alpha)
        df_ri = spec_ri[:, : p.nb_df, :]
        feat_df, df_state = _ema_unit_norm(df_ri, df_state, self.alpha)
        return feat_erb, feat_df, erb_state, df_state

    def _init_ema(self):
        p = self.config
        return (jnp.asarray(np.linspace(-60.0, -90.0, p.nb_erb,
                                        dtype=np.float32)),
                jnp.asarray(np.linspace(0.001, 0.0001, p.nb_df,
                                        dtype=np.float32)))

    # -------------------------------------------------------- offline

    def _offline_fn(self, t_bucket: int):
        fn = self._jit_cache.get(("off", t_bucket))
        if fn is None:
            p = self.config

            def run(params, spec_ri, n_frames):
                erb_s, df_s = self._init_ema()
                feat_erb, feat_df, _, _ = self._features(spec_ri[0],
                                                         erb_s, df_s)
                spec_e, mask, lsnr, _ = N.dfnet_forward(
                    params, p, spec_ri, feat_erb[None], feat_df[None])
                return spec_e
            fn = jax.jit(run)
            self._jit_cache[("off", t_bucket)] = fn
        return fn

    def enhance_array(self, audio: np.ndarray) -> np.ndarray:
        p = self.config
        x = np.asarray(audio, np.float32).reshape(-1)
        orig = len(x)
        # libDF: one-hop implicit left context + fft_size right pad
        x = np.pad(x, (p.hop_size, p.fft_size))
        spec = np.asarray(dsp_stft(
            jnp.asarray(x), n_fft=p.fft_size, hop_length=p.hop_size,
            win_length=p.fft_size, window=jnp.asarray(self.window),
            center=False)) * self.wnorm                        # (T, F)
        t = spec.shape[0]
        tb = next((b for b in FRAME_BUCKETS if t <= b),
                  ((t + 255) // 256) * 256)
        spec_pad = np.zeros((1, tb, spec.shape[1], 2), np.float32)
        spec_pad[0, :t, :, 0] = spec.real
        spec_pad[0, :t, :, 1] = spec.imag
        spec_e = np.asarray(self._offline_fn(tb)(
            self.params, jnp.asarray(spec_pad), t))[0, :t]

        enh = (spec_e[..., 0] + 1j * spec_e[..., 1]) / self.wnorm
        audio_out = np.asarray(dsp_istft(
            jnp.asarray(enh), hop_length=p.hop_size,
            win_length=p.fft_size, window=self.window, center=False,
            length=orig + p.hop_size + p.fft_size, normalized=True))
        d = p.fft_size - p.hop_size
        return np.clip(audio_out[d: orig + d], -1.0, 1.0)

    # alias matching the reference generate-style entry points
    def enhance_file(self, input_path, output_path):
        from ....audio_io import read, write
        audio, sr = read(str(input_path))
        if audio.ndim > 1:
            audio = audio[:, 0]
        if sr != self.config.sample_rate:
            from ....utils import resample_audio
            audio = np.asarray(resample_audio(audio, sr,
                                              self.config.sample_rate))
        out = self.enhance_array(audio)
        write(str(output_path), out, self.config.sample_rate)
        return Path(output_path)

    def generate(self, audio, **kwargs) -> np.ndarray:
        if isinstance(audio, (str, Path)):
            from ....utils import load_audio
            audio = np.asarray(load_audio(str(audio),
                                          self.config.sample_rate))
        return self.enhance_array(np.asarray(audio))

    __call__ = generate

    # ------------------------------------------------------- streaming

    def create_streamer(self, chunk_frames: int = 8):
        if self.config.enc_concat:
            raise NotImplementedError(
                "streaming is implemented for the DeepFilterNet3 path")
        return DeepFilterNetStreamer(self, chunk_frames)

    def _stream_fn(self, chunk_frames: int):
        key_ = ("stream", chunk_frames)
        fn = self._jit_cache.get(key_)
        if fn is None:
            p = self.config
            kt_in = p.conv_kernel_inp[0]            # 3
            h_erb = kt_in - 1                       # feat_erb history
            h_df0 = kt_in - 1 + (p.df_pathway_kernel_size_t - 1)
            h_spec = p.df_order - 1

            def run(params, spec_chunk, state):
                t = spec_chunk.shape[0]
                feat_erb, feat_df, erb_s, df_s = self._features(
                    spec_chunk, state["erb_ema"], state["df_ema"])

                erb_in = jnp.concatenate([state["feat_erb"], feat_erb], 0)
                df_in = jnp.concatenate([state["feat_df"], feat_df], 0)
                spec_in = jnp.concatenate([state["spec"], spec_chunk], 0)

                spec_e, gru_states = self._stream_net(
                    params, erb_in[None], df_in[None], spec_in[None],
                    t, state)
                new_state = {
                    "erb_ema": erb_s, "df_ema": df_s,
                    "feat_erb": erb_in[-h_erb:],
                    "feat_df": df_in[-h_df0:],
                    "spec": spec_in[-h_spec:],
                    **gru_states,
                }
                return spec_e[0], new_state

            fn = jax.jit(run)
            self._jit_cache[key_] = fn
        return fn

    def _stream_net(self, params, erb_in, df_in, spec_in, t, state):
        """Chunk forward with real history frames and VALID time padding
        in the history-consuming convs; everything else has time kernel 1
        so offline == streamed exactly."""
        import functools
        p = self.config
        enc = params["enc"]

        def conv_valid_t(block, x, fstride=1, relu=True):
            w = block["1"]["weight"]
            kf = w.shape[1]
            g = x.shape[-1] // w.shape[2]
            y = jax.lax.conv_general_dilated(
                x, block["1"]["weight"], window_strides=(1, fstride),
                padding=[(0, 0), (kf // 2, kf // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g)
            if "3" in block:
                y = jax.lax.conv_general_dilated(
                    y, block["2"]["weight"], window_strides=(1, 1),
                    padding=[(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = N.apply_batch_norm(block["3"], y)
            else:
                y = N.apply_batch_norm(block["2"], y)
            return jax.nn.relu(y) if relu else y

        # encoder: erb path (history covers erb_conv0's kt=3)
        e0_full = conv_valid_t(enc["erb_conv0"], erb_in[..., None])
        e0 = e0_full[:, -t:]
        e1 = N.apply_conv_block(enc["erb_conv1"], e0, fstride=2)  # kt==1
        e2 = N.apply_conv_block(enc["erb_conv2"], e1, fstride=2)
        e3 = N.apply_conv_block(enc["erb_conv3"], e2)

        c0_full = conv_valid_t(enc["df_conv0"], df_in)    # T + 4 frames
        c0 = c0_full[:, -t:]
        c1 = N.apply_conv_block(enc["df_conv1"], c0, fstride=2)

        b = e3.shape[0]
        cemb = jax.nn.relu(N.apply_grouped_linear(
            enc["df_fc_emb"]["0"], c1.reshape(b, t, -1)))
        emb = e3.reshape(b, t, -1)
        emb = jnp.concatenate([emb, cemb], -1) if p.enc_concat \
            else emb + cemb
        emb, enc_gru = N.apply_squeezed_gru(enc["emb_gru"], emb,
                                            state.get("enc_gru"))

        m, erb_gru = N.erb_decoder_forward(
            params["erb_dec"], p, emb, e3, e2, e1, e0,
            state.get("erb_gru"))
        mask_full = m @ params["mask"]["erb_inv_fb"]
        spec_chunk = spec_in[:, -t:]
        spec_m = spec_chunk * mask_full[..., None]

        # df decoder with df_convp over the real c0 history window
        dd = params["df_dec"]
        c, df_gru = N.apply_squeezed_gru(dd["df_gru"], emb,
                                         state.get("df_gru"))
        if "df_skip" in dd:
            c = c + N.apply_grouped_linear(dd["df_skip"], emb)
        cp = dd["df_convp"]
        kt = cp["1"]["weight"].shape[0]
        c0_win = c0_full[:, -(t + kt - 1):]
        y = jax.lax.conv_general_dilated(
            c0_win, cp["1"]["weight"], window_strides=(1, 1),
            padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c0_win.shape[-1]
            // cp["1"]["weight"].shape[2])
        y = jax.lax.conv_general_dilated(
            y, cp["2"]["weight"], window_strides=(1, 1),
            padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c0p = jax.nn.relu(N.apply_batch_norm(cp["3"], y))
        c_out = jnp.tanh(N.apply_grouped_linear(dd["df_out"]["0"], c))
        coefs = c_out.reshape(b, t, p.nb_df, p.df_order * 2) + c0p

        # deep filter with real spec history (valid windows)
        lowh = spec_in[:, :, : p.nb_df, :]
        co = coefs.reshape(b, t, p.nb_df, p.df_order, 2)
        out_r = jnp.zeros((b, t, p.nb_df))
        out_i = jnp.zeros((b, t, p.nb_df))
        for k in range(p.df_order):
            win = lowh[:, k: k + t]
            sr, si = win[..., 0], win[..., 1]
            cr, ci = co[..., k, 0], co[..., k, 1]
            out_r = out_r + sr * cr - si * ci
            out_i = out_i + sr * ci + si * cr
        low_f = jnp.stack([out_r, out_i], -1)
        spec_e = jnp.concatenate(
            [low_f, spec_m[:, :, p.nb_df:, :]], axis=2)
        return spec_e, {"enc_gru": enc_gru, "erb_gru": erb_gru,
                        "df_gru": df_gru}

    # -------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """torch DeepFilterNet checkpoint -> our tree. Conv2d
        (O, I/g, kT, kF) -> HWIO; ConvTranspose2d (I, O/g, kT, kF) ->
        pre-flipped HWIO; GRU weight_ih_l0 etc -> per-layer dicts."""
        import re
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            m = re.match(r"(.*)\.(weight|bias)_(ih|hh)_l(\d+)$", k)
            if m:
                base, kind, which, layer = m.groups()
                out[f"{base}.gru_layers.{layer}.{kind}_{which}"] = v
                continue
            if k.endswith(".weight") and v.ndim == 4:
                if ".convt2." in k or ".convt1." in k:
                    # depthwise ConvTranspose2d (I, O/g=1, kT, kF):
                    # flip spatial dims, to HWIO (kT, kF, 1, C)
                    v = jnp.flip(v, axis=(2, 3))
                    v = jnp.transpose(v, (2, 3, 1, 0))
                else:
                    v = jnp.transpose(v, (2, 3, 1, 0))
                out[k] = v
                continue
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        return model


class DeepFilterNetStreamer:
    """Hop-accumulating streamer over the jitted fixed-chunk step."""

    def __init__(self, model: Model, chunk_frames: int = 8):
        self.model = model
        self.p = model.config
        self.chunk_frames = chunk_frames
        self.reset()

    def reset(self):
        p = self.p
        kt_in = p.conv_kernel_inp[0]
        erb_s, df_s = self.model._init_ema()
        f = p.fft_size // 2 + 1
        self._state = {
            "erb_ema": erb_s, "df_ema": df_s,
            "feat_erb": jnp.zeros((kt_in - 1, p.nb_erb)),
            "feat_df": jnp.zeros(
                (kt_in - 1 + p.df_pathway_kernel_size_t - 1, p.nb_df, 2)),
            "spec": jnp.zeros((p.df_order - 1, f, 2)),
            "enc_gru": None, "erb_gru": None, "df_gru": None,
        }
        # GRU states must be concrete for jit; materialize zeros
        self._state["enc_gru"] = [jnp.zeros((1, p.emb_hidden_dim))]
        self._state["erb_gru"] = [jnp.zeros((1, p.emb_hidden_dim))
                                  for _ in range(max(1,
                                                     p.emb_num_layers - 1))]
        self._state["df_gru"] = [jnp.zeros((1, p.df_hidden_dim))
                                 for _ in range(p.df_num_layers)]
        self._pending = np.zeros(0, np.float32)
        self._analysis_mem = np.zeros(p.fft_size - p.hop_size, np.float32)
        self._synth_mem = np.zeros(p.fft_size - p.hop_size, np.float32)
        self._prev_env = np.zeros(0, np.float32)
        self._frames_out = 0
        self._delay_dropped = 0

    def process_chunk(self, chunk: np.ndarray,
                      is_last: bool = False) -> np.ndarray:
        p = self.p
        x = np.asarray(chunk, np.float32).reshape(-1)
        self._pending = np.concatenate([self._pending, x])
        if is_last:
            pad = np.zeros(3 * p.hop_size + (p.fft_size - p.hop_size),
                           np.float32)
            self._pending = np.concatenate([self._pending, pad])

        outs = []
        window = self.model.window
        cf = self.chunk_frames
        while len(self._pending) >= p.hop_size * cf:
            hops = self._pending[: p.hop_size * cf]
            self._pending = self._pending[p.hop_size * cf:]
            # analysis frames with rolling memory
            buf = np.concatenate([self._analysis_mem, hops])
            frames = np.stack([buf[i * p.hop_size:
                                   i * p.hop_size + p.fft_size]
                               for i in range(cf)])
            self._analysis_mem = buf[-(p.fft_size - p.hop_size):]
            spec = np.fft.rfft(frames * window, axis=-1) * self.model.wnorm
            spec_ri = np.stack([spec.real, spec.imag], -1) \
                .astype(np.float32)
            spec_e, self._state = self.model._stream_fn(cf)(
                self.model.params, jnp.asarray(spec_ri), self._state)
            enh = np.asarray(spec_e)
            enh_c = (enh[..., 0] + 1j * enh[..., 1]) / self.model.wnorm
            # synthesis overlap-add with libDF window^2 normalization
            frames_td = np.fft.irfft(enh_c, n=p.fft_size, axis=-1) * window
            env = np.zeros((cf - 1) * p.hop_size + p.fft_size)
            wsq = window * window
            acc = np.zeros_like(env)
            for i in range(cf):
                acc[i * p.hop_size: i * p.hop_size + p.fft_size] += \
                    frames_td[i]
                env[i * p.hop_size: i * p.hop_size + p.fft_size] += wsq
            # merge with synthesis memory (previous tail)
            acc[: p.fft_size - p.hop_size] += self._synth_mem
            # emit cf hops; keep the tail
            full_env = env.copy()
            if self._prev_env.size:
                full_env[: p.fft_size - p.hop_size] += self._prev_env
            out = acc[: cf * p.hop_size] / np.maximum(
                full_env[: cf * p.hop_size], 1e-10)
            self._synth_mem = acc[cf * p.hop_size:]
            self._prev_env = env[cf * p.hop_size:]
            outs.append(out.astype(np.float32))

        if not outs:
            return np.zeros(0, np.float32)
        y = np.concatenate(outs)
        # drop the algorithmic delay once
        d = p.fft_size - p.hop_size
        if self._delay_dropped < d:
            take = min(d - self._delay_dropped, len(y))
            y = y[take:]
            self._delay_dropped += take
        return np.clip(y, -1.0, 1.0)

    def flush(self) -> np.ndarray:
        return self.process_chunk(np.zeros(0, np.float32), is_last=True)


DeepFilterNetModel = Model

__all__ = ["Model", "DeepFilterNetModel", "DeepFilterNetStreamer",
           "vorbis_window", "norm_alpha"]
