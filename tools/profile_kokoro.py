"""Attribute the Kokoro-82M single-synth wall (VERDICT r3 weak #1).

Kokoro is non-AR: one frontend jit (ALBERT + duration LSTMs), one host sync
(total frame count -> frame bucket), one acoustic jit (alignment matmul +
F0/N LSTMs + ISTFTNet), one audio fetch. The bench has sat at ~101x RT and
2.78% MFU for three rounds with no breakdown of where the other 97% goes —
this script times each stage with block_until_ready fences, plus the pure
on-device time of each jit via a serialized N-iteration loop, so host/tunnel
cost and device compute separate cleanly.

Run (real TPU): python tools/profile_kokoro.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import bench_kokoro  # noqa: F401 (same config builder)
    import bench as B

    # replicate bench_kokoro's model/config/text exactly
    from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig
    from mlx_audio_tpu.tts.models.kokoro.kokoro import (FRAME_BUCKETS,
                                                        TOKEN_BUCKETS,
                                                        _bucket)
    from mlx_audio_tpu.tts.g2p import g2p

    vocab = {c: i + 1 for i, c in enumerate(
        "abcdefghijklmnopqrstuvwxyz ˈˌəɹʃʒðθæɑɔɛɜɪʊʌiuAIOWY.,!?;:'\"-")}
    cfg = ModelConfig(
        istftnet=dict(
            resblock_kernel_sizes=[3, 7, 11], upsample_rates=[10, 6],
            upsample_initial_channel=512,
            resblock_dilation_sizes=[[1, 3, 5]] * 3,
            upsample_kernel_sizes=[20, 12], gen_istft_n_fft=20,
            gen_istft_hop_size=5),
        dim_in=64, hidden_dim=512, max_conv_dim=512, max_dur=50,
        n_layer=3, n_mels=80, n_token=178, style_dim=128,
        text_encoder_kernel_size=5,
        plbert=dict(num_hidden_layers=12, num_attention_heads=12,
                    hidden_size=768, intermediate_size=2048,
                    max_position_embeddings=512, embedding_size=128,
                    dropout=0.1),
        vocab=vocab)
    model = Model(cfg).init_and_bind()
    rng = np.random.RandomState(0)
    ref_s = jnp.asarray((rng.randn(1, 256) * 0.1).astype(np.float32))
    text = ("The quick brown fox jumps over the lazy dog while seventy "
            "six trombones led the big parade down by the river bank. "
            "Machine learning systems now synthesize natural speech in "
            "real time on a single accelerator chip, streaming audio to "
            "listeners across the planet with latency below the blink of "
            "an eye.")

    # ---- stage prep ----
    t0 = time.perf_counter()
    phonemes = g2p(text)
    phonemes = "".join(c for c in phonemes if c in model.vocab)
    g2p_s = time.perf_counter() - t0
    ids_list = [0, *model.phonemes_to_ids(phonemes), 0]
    n_ids = len(ids_list)
    lb = _bucket(n_ids, TOKEN_BUCKETS)
    ids = np.zeros((1, lb), np.int32); ids[0, :n_ids] = ids_list
    valid = np.zeros((1, lb), bool); valid[0, :n_ids] = True
    ids_d, valid_d = jnp.asarray(ids), jnp.asarray(valid)
    frontend, acoustic = model._get_jits()
    speed = jnp.float32(1.0)

    # warm compile for both stages
    d, t_en, pred_dur, _tot = frontend(model.params, ids_d, valid_d, ref_s,
                                       speed)
    total_frames = int(jnp.sum(pred_dur))
    fb = _bucket(total_frames, FRAME_BUCKETS)
    audio, total = acoustic(model.params, d, t_en, pred_dur, ref_s,
                            num_frames=fb, key=None)
    jax.block_until_ready(audio)
    samples = total_frames * model.samples_per_frame
    print(f"tokens {n_ids} (bucket {lb})  frames {total_frames} "
          f"(bucket {fb})  samples {samples} "
          f"({samples / 24000:.1f}s audio)")
    print(f"g2p host time: {g2p_s * 1e3:.1f} ms")

    def best(f, n=5):
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            walls.append(time.perf_counter() - t0)
        return min(walls)

    # ---- end-to-end staged walls (includes tunnel round trips) ----
    wall_frontend = best(lambda: jax.block_until_ready(
        frontend(model.params, ids_d, valid_d, ref_s, speed)))
    wall_sync = best(lambda: int(jnp.sum(pred_dur)))
    wall_acoustic = best(lambda: jax.block_until_ready(
        acoustic(model.params, d, t_en, pred_dur, ref_s, num_frames=fb,
                 key=None)))
    wall_fetch = best(lambda: np.asarray(audio[0][:samples]))
    wall_fetch_full = best(lambda: np.asarray(audio))

    # ---- pure device time via serialized loops (amortizes the tunnel) ----
    N = 16

    @jax.jit
    def frontend_loop(p, ids, valid, ref, speed):
        def body(i, carry):
            return model._run_frontend(p, ids + 0 * i, valid, ref, speed)
        return jax.lax.fori_loop(0, N, body, model._run_frontend(
            p, ids, valid, ref, speed))

    out = frontend_loop(model.params, ids_d, valid_d, ref_s, speed)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(frontend_loop(model.params, ids_d, valid_d, ref_s,
                                        speed))
    dev_frontend = (time.perf_counter() - t0) / N

    from functools import partial

    @partial(jax.jit, static_argnames=("nf",))
    def acoustic_loop(p, d, t_en, pd, ref, nf):
        def body(i, audio_total):
            return model._run_acoustic(p, d + 0.0 * i, t_en, pd, ref, nf,
                                       None)
        return jax.lax.fori_loop(0, N, body, model._run_acoustic(
            p, d, t_en, pd, ref, nf, None))

    out = acoustic_loop(model.params, d, t_en, pred_dur, ref_s, nf=fb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(acoustic_loop(model.params, d, t_en, pred_dur,
                                        ref_s, nf=fb))
    dev_acoustic = (time.perf_counter() - t0) / N

    total_staged = (g2p_s + wall_frontend + wall_sync + wall_acoustic
                    + wall_fetch)
    print(f"\nstaged walls (each includes >=1 tunnel round-trip ~28 ms):")
    print(f"  frontend:  {wall_frontend * 1e3:7.1f} ms   "
          f"(pure device {dev_frontend * 1e3:7.1f} ms)")
    print(f"  dur sync:  {wall_sync * 1e3:7.1f} ms")
    print(f"  acoustic:  {wall_acoustic * 1e3:7.1f} ms   "
          f"(pure device {dev_acoustic * 1e3:7.1f} ms)")
    print(f"  fetch:     {wall_fetch * 1e3:7.1f} ms "
          f"({samples * 4 / 1e6:.1f} MB sliced; full padded buffer "
          f"{wall_fetch_full * 1e3:.1f} ms)")
    print(f"  g2p:       {g2p_s * 1e3:7.1f} ms")
    print(f"  sum:       {total_staged * 1e3:7.1f} ms "
          f"(bench best-of-7 wall was ~1010 ms)")

    # ---- acoustic sub-stage attribution (device) ----
    from mlx_audio_tpu.tts.models.kokoro.modules import (build_alignment,
                                                         f0n_train)
    from mlx_audio_tpu.tts.models.kokoro.istftnet import decoder_forward

    s_half = ref_s[:, cfg.style_dim:]
    style = ref_s[:, :cfg.style_dim]

    @partial(jax.jit, static_argnames=("nf",))
    def align_only(p, d, t_en, pd, nf):
        def body(i, carry):
            aln = build_alignment(pd + 0 * i, nf)
            en = jnp.einsum("blf,blc->bfc", aln, d)
            asr = jnp.einsum("blf,blc->bfc", aln, t_en)
            return en, asr
        return jax.lax.fori_loop(0, N, body, body(0, None))

    @partial(jax.jit, static_argnames=("nf",))
    def f0n_only(p, en, fv, nf):
        def body(i, carry):
            return f0n_train(p["predictor"], en + 0.0 * i, s_half, fv)
        return jax.lax.fori_loop(0, N, body, body(0, None))

    @partial(jax.jit, static_argnames=("nf",))
    def dec_only(p, asr, f0, n, fv, nf):
        def body(i, carry):
            return decoder_forward(p["decoder"], model.istft_cfg,
                                   asr + 0.0 * i, f0, n, style, fv, key=None)
        return jax.lax.fori_loop(0, N, body, body(0, None))

    total = jnp.sum(pred_dur, axis=-1)
    fv = jnp.arange(fb)[None, :] < total[:, None]
    en, asr = align_only(model.params, d, t_en, pred_dur, nf=fb)
    jax.block_until_ready((en, asr))
    t0 = time.perf_counter()
    jax.block_until_ready(align_only(model.params, d, t_en, pred_dur, nf=fb))
    t_align = (time.perf_counter() - t0) / N

    f0, nn = f0n_only(model.params, en, fv, nf=fb)
    jax.block_until_ready((f0, nn))
    t0 = time.perf_counter()
    jax.block_until_ready(f0n_only(model.params, en, fv, nf=fb))
    t_f0n = (time.perf_counter() - t0) / N

    au = dec_only(model.params, asr, f0, nn, fv, nf=fb)
    jax.block_until_ready(au)
    t0 = time.perf_counter()
    jax.block_until_ready(dec_only(model.params, asr, f0, nn, fv, nf=fb))
    t_dec = (time.perf_counter() - t0) / N

    print(f"\nacoustic device sub-stages (xN={N} loops):")
    print(f"  alignment einsums: {t_align * 1e3:7.1f} ms")
    print(f"  F0/N (LSTM) :      {t_f0n * 1e3:7.1f} ms")
    print(f"  ISTFTNet decode:   {t_dec * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
