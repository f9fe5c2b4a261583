"""Benchmarks on one TPU chip, matching BASELINE.md targets.

Prints ONE JSON line (primary metric: Kokoro-82M xRT, vs_baseline = xRT/50).
Secondary metrics (Qwen3-TTS-1.7B-class streaming xRT + time-to-first-audio)
go to stderr and BENCH_DETAILS.json.

Random-initialized params at real checkpoint sizes (weights are unavailable
offline; FLOPs/memory traffic match the real models).

Survivability contract (round-4 lesson: one overrunning lane zeroed the
whole record): every lane runs under a hard per-lane time box, the headline
JSON line prints the moment the kokoro lane completes (the driver parses
the LAST line, so it is re-printed at the end), and BENCH_DETAILS.json is
flushed to disk after EVERY lane — a driver timeout at any point keeps all
results captured so far.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# total wall budget for the whole bench run; lanes that would start with
# too little headroom are skipped-with-reason instead of risking the record
TOTAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1380))


def bench_kokoro():
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig

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
    ref_s = (rng.randn(1, 256) * 0.1).astype(np.float32)
    # text in, G2P included in the measured wall (the reference's RTF also
    # pays its misaki/espeak frontend)
    from mlx_audio_tpu.tts.g2p import g2p

    text = ("The quick brown fox jumps over the lazy dog while seventy "
            "six trombones led the big parade down by the river bank. "
            "Machine learning systems now synthesize natural speech in "
            "real time on a single accelerator chip, streaming audio to "
            "listeners across the planet with latency below the blink of "
            "an eye.")

    def synthesize():
        phonemes = g2p(text)
        phonemes = "".join(c for c in phonemes if c in model.vocab)
        return model(phonemes, ref_s, deterministic_noise=True)

    audio, _ = synthesize()  # warmup
    n_samples = len(audio)
    # best-of-N: the tunnel to the chip adds ±15-20% per-run jitter (whole
    # sessions can run 30%+ slow); the minimum wall is the chip's actual
    # steady-state latency
    walls = []
    for _ in range(7):
        t0 = time.perf_counter()
        audio, _ = synthesize()
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    xrt = (n_samples / model.config.sample_rate) / wall
    out = {"xrt": round(xrt, 2), "wall_s": round(wall, 4),
           "wall_mean_s": round(sum(walls) / len(walls), 4),
           "audio_s": round(n_samples / 24000, 2)}
    # FLOPs-MFU: kokoro's ISTFTNet path is conv/compute-bound, so judge it
    # against the MXU peak using XLA's own per-program cost model
    # (round-2 verdict missing #2; SURVEY §6)
    try:
        import jax
        import jax.numpy as jnp

        from mlx_audio_tpu.ops.roofline import CHIP_SPECS, detect_chip
        from mlx_audio_tpu.tts.models.kokoro.kokoro import (FRAME_BUCKETS,
                                                            TOKEN_BUCKETS,
                                                            _bucket)

        phon = g2p(text)
        phon = "".join(c for c in phon if c in model.vocab)
        ids_list = [0, *model.phonemes_to_ids(phon), 0]
        lb = _bucket(len(ids_list), TOKEN_BUCKETS)
        ids = np.zeros((1, lb), np.int32); ids[0, :len(ids_list)] = ids_list
        valid = np.zeros((1, lb), bool); valid[0, :len(ids_list)] = True
        frontend, acoustic = model._get_jits()
        fargs = (model.params, jnp.asarray(ids), jnp.asarray(valid),
                 jnp.asarray(ref_s), jnp.float32(1.0))
        d, t_en, pred_dur, _total = frontend(*fargs)
        fb = _bucket(int(jnp.sum(pred_dur)), FRAME_BUCKETS)
        flops = 0.0
        for fn, args, kw in (
                (frontend, fargs, {}),
                (acoustic, (model.params, d, t_en, pred_dur,
                            jnp.asarray(ref_s)),
                 {"num_frames": fb, "key": None})):
            ca = fn.lower(*args, **kw).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops += float(ca.get("flops", 0.0))
        # XLA's cost model can't see inside pallas_call: on TPU the
        # generator's snake-conv legs run through the fused kernel, so add
        # their FLOPs analytically (they dominate kokoro's compute)
        from mlx_audio_tpu.ops.snake_conv_pallas import use_fused_snake_conv
        from mlx_audio_tpu.tts.models.kokoro.istftnet import (
            fused_generator_conv_flops)

        if use_fused_snake_conv(jnp.zeros((1, 1, 128), jnp.bfloat16)):
            flops += fused_generator_conv_flops(model.config.istftnet, fb)
        chip = detect_chip()
        peak = CHIP_SPECS[chip]["bf16_tflops"] * 1e12
        out["flops_per_synth"] = flops
        out["mfu_pct"] = round(100.0 * flops / wall / peak, 2)
        out["chip"] = chip
    except Exception as e:
        out["mfu_error"] = str(e)[:200]
    # stash the warm model/inputs for the separate batched lane so its b=8
    # compile cannot eat the headline lane's time box
    _KOKORO_CTX.update(model=model, ids=ids, valid=valid, ref_s=ref_s)
    return out


_KOKORO_CTX = {}


def bench_kokoro_batched():
    """b=8 aggregate throughput in its own lane (the b=8 acoustic/frontend
    compile is the single most expensive XLA build in the kokoro family;
    boxed separately so a cold cache can never zero the headline lane)."""
    if not _KOKORO_CTX:
        raise RuntimeError("kokoro lane did not complete; no warm model")
    return _kokoro_batched(_KOKORO_CTX["model"], _KOKORO_CTX["ids"],
                           _KOKORO_CTX["valid"], _KOKORO_CTX["ref_s"],
                           batch=8)


def _kokoro_batched(model, ids, valid, ref_s, batch=8):
    """Aggregate-throughput lane: B identical-length synths in ONE frontend
    + ONE acoustic dispatch. An 82M conv model at b=1 leaves the MXU mostly
    idle (2.8% MFU measured r3); batching is free MFU. The per-request wall
    a server user sees at 8 concurrent kokoro requests is this wall."""
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.kokoro.kokoro import FRAME_BUCKETS, _bucket

    ids_b = jnp.asarray(np.tile(ids, (batch, 1)))
    valid_b = jnp.asarray(np.tile(valid, (batch, 1)))
    ref_b = jnp.asarray(np.tile(np.asarray(ref_s), (batch, 1)))
    frontend, acoustic = model._get_jits()
    speed = jnp.float32(1.0)

    # the b=8 acoustic at an 8192-frame bucket materializes a ~20 GB
    # TILED overlap-add intermediate — f32[B*T, 8, 9] padded 9->128 lanes
    # by the (8,128) tiling, 14x the logical bytes (measured AOT error);
    # 4096 is the largest per-stream bucket that fits 8-wide. Longer
    # synths stream in chunks in production, so the aggregate is honest.
    B8_FRAME_CAP = 4096

    def run():
        d, t_en, pred_dur, tot = frontend(model.params, ids_b, valid_b,
                                          ref_b, speed)
        fb = min(_bucket(int(np.asarray(tot)) // batch, FRAME_BUCKETS),
                 B8_FRAME_CAP)
        audio, total = acoustic(model.params, d, t_en, pred_dur, ref_b,
                                num_frames=fb, key=None)
        return np.asarray(audio), np.minimum(np.asarray(total), fb)

    audio, total = run()                                   # warm both jits
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        audio, total = run()
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    audio_s = float(total.sum()) * model.samples_per_frame / 24000
    return {"batch": batch, "xrt_aggregate": round(audio_s / wall, 1),
            "wall_s": round(wall, 4),
            "audio_s_total": round(audio_s, 1)}


def _qwen3_model(prewarm: bool = False):
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig

    # Qwen3-TTS-1.7B-class: 28-layer/2048-hidden talker + 5-layer code
    # predictor + 12.5 Hz codec decoder (published architecture dims)
    cfg = ModelConfig(
        talker_config=dict(
            vocab_size=3072, hidden_size=1024, intermediate_size=3072,
            num_hidden_layers=28, num_attention_heads=16,
            num_key_value_heads=8, head_dim=128, num_code_groups=16,
            text_hidden_size=2048, text_vocab_size=151936,
            code_predictor_config=dict(
                vocab_size=2048, hidden_size=1024, intermediate_size=3072,
                num_hidden_layers=5, num_attention_heads=16,
                num_key_value_heads=8, head_dim=128, num_code_groups=16)),
    )
    model = Model(cfg)
    if prewarm:
        # load decode-path executables concurrently with the param init
        # below — a production restart overlaps them with the checkpoint
        # read the same way (generate() joins the warm thread)
        model.prewarm_async(max_tokens=60)
    model.init_and_bind()
    model.astype(jnp.bfloat16)
    return model


def _qwen3_roofline(model, frame_s: float, batch: int = 1,
                    cache_len: int = 256) -> dict:
    """Bandwidth roofline for one qwen3_tts decode frame.

    Per frame the chip streams: talker weights once, code-predictor weights
    once per sub-step scan (the G-1 group scan re-reads them G-1 times), and
    the talker KV cache (full fixed buffer — ops/kvcache.py contract).
    """
    from mlx_audio_tpu.ops.roofline import (CHIP_SPECS, detect_chip,
                                            param_footprint_bytes,
                                            kv_read_bytes)

    t = model.tcfg
    cp = model.params["talker"]["code_predictor"]
    talker_only = {k: v for k, v in model.params["talker"].items()
                   if k != "code_predictor"}
    # text_embedding is prompt-only: decode embeds come from codec_embedding
    talker_only["model"] = {k: v for k, v in talker_only["model"].items()
                            if k != "text_embedding"}
    cp_bytes = param_footprint_bytes(cp)
    talker_bytes = param_footprint_bytes(talker_only)
    kv = kv_read_bytes(cache_len=cache_len, n_layers=t.num_hidden_layers,
                       n_kv_heads=t.num_key_value_heads, head_dim=t.head_dim,
                       itemsize=2, batch=batch)
    bytes_per_frame = talker_bytes + cp_bytes * (t.num_code_groups - 1) + kv
    chip = detect_chip()
    bw = CHIP_SPECS[chip]["hbm_gbs"] * 1e9
    sol_frame_s = bytes_per_frame / bw
    fps = 12.5
    return {"chip": chip, "talker_bytes": talker_bytes, "cp_bytes": cp_bytes,
            "kv_bytes_per_step": kv, "bytes_per_frame": bytes_per_frame,
            "sol_frame_ms": round(sol_frame_s * 1e3, 3),
            "measured_frame_ms": round(frame_s * 1e3, 3),
            "sol_xrt": round(batch / fps / sol_frame_s, 2),
            "pct_of_roofline": round(100 * sol_frame_s / max(frame_s, 1e-12),
                                     1),
            "achieved_gbs": round(bytes_per_frame / max(frame_s, 1e-12) / 1e9,
                                  1)}


def bench_qwen3(bits=None):
    model = _qwen3_model()
    if bits:
        from mlx_audio_tpu.ops.quant import (
            maybe_quantize_tree, tree_to_i8_layout)

        model.params = maybe_quantize_tree(
            model.params, group_size=64, bits=bits,
            predicate=lambda p, w: model.model_quant_predicate(p, w),
            consume=True)
        if bits == 8:
            # per-channel W8A8 decode (the mxu_int8 load option): halves
            # the talker + code-predictor weight stream, which is ~all of
            # the frame time (the frame measured 95% of the bf16 roofline)
            model.params = tree_to_i8_layout(model.params, consume=True)
    text_ids = np.arange(100, 150)[None]

    # warmup: compiles prefill + the fused AR+codec stream stepper
    t0 = time.perf_counter()
    results = list(model.generate(text_ids=text_ids, temperature=0.9,
                                  max_tokens=60, stream=True,
                                  streaming_interval=2.0, seed=0))
    compile_wall = time.perf_counter() - t0

    # timed streaming runs (best-of-3: tunnel jitter). streaming_interval
    # follows the reference default (2.0 s); TTFA is independent of it —
    # the first chunk is always FIRST_CHUNK=8 frames (0.64 s of audio).
    best = None
    for seed in (1, 2, 3):
        t0 = time.perf_counter()
        run_ttfa = None
        samples = 0
        tokens = 0
        for r in model.generate(text_ids=text_ids, temperature=0.9,
                                max_tokens=100, stream=True,
                                streaming_interval=2.0, seed=seed):
            if run_ttfa is None and r.samples > 0:
                run_ttfa = time.perf_counter() - t0
            samples += r.samples
            tokens = max(tokens, r.token_count)
        run_wall = time.perf_counter() - t0
        run_xrt = (samples / 24000) / run_wall if run_wall > 0 else 0.0
        if best is None or run_xrt > best[0]:
            best = (run_xrt, run_ttfa, samples, tokens, run_wall)
    xrt, ttfa, total_samples, total_tokens, wall = best
    # The fused AR+codec superstep pays ONE dispatch + ONE fetch per chunk,
    # and the fetch of chunk N is issued while chunk N+1 computes, so host
    # stall time OVERLAPS device compute (host waiting != device idle —
    # stall_s must NOT be subtracted from the wall). The only tunnel legs
    # that don't overlap anything are the pipeline ends: input upload +
    # first dispatch and the final fetch (~3 RTTs) — that is all a
    # co-located deployment would save.
    stats = getattr(model, "_last_stream_stats", None) or {}
    stall_s = float(stats.get("stall_s", 0.0))
    n_syncs = int(stats.get("n_fetches", 0))
    rtt_ms = measure_sync_rtt()
    adj_wall = max(wall - 3 * rtt_ms / 1e3, 1e-9)
    # frame_s charges the full end-to-end wall (codec decode + host loop
    # included) to the AR frame — the pessimistic per-frame latency a user
    # sees; pct_of_roofline is correspondingly an UNDER-estimate of the AR
    # loop's own bandwidth efficiency (tools/profile_qwen3_decode.py
    # isolates that: 96% of SoL at r4)
    roof = _qwen3_roofline(model, frame_s=wall / max(total_tokens, 1))
    roof["tunnel_rtt_ms"] = rtt_ms
    # blocking syncs = the pipeline-end legs that actually cost wall time
    # (input upload + first dispatch + final fetch); per-chunk fetches are
    # issued while the next chunk computes and hide behind device work
    roof["n_syncs"] = 3
    roof["n_chunk_fetches"] = n_syncs
    roof["host_stall_overlapped_s"] = round(stall_s, 3)
    return {"xrt": round(xrt, 3), "ttfa_s": round(ttfa or -1, 3),
            "xrt_rtt_adjusted": round((total_samples / 24000) / adj_wall, 3),
            "tokens": int(total_tokens),
            "audio_s": round(total_samples / 24000, 2),
            "wall_s": round(wall, 3),
            "compile_s": round(compile_wall, 1),
            "roofline": roof}


def measure_sync_rtt(samples: int = 12) -> float:
    """Per-sync device->host round-trip latency (ms) of this connection.

    The axon tunnel adds ~25 ms to EVERY host synchronization; real
    co-located TPU hosts see ~0.1 ms. Streaming benches pay one sync per
    emitted chunk, so walls are reported raw plus this number so the
    deployment-side latency can be reconstructed."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda i: i * 2)
    np.asarray(fn(jnp.int32(0)))  # compile
    walls = []
    for i in range(samples):
        t0 = time.perf_counter()
        np.asarray(fn(jnp.int32(i)))
        walls.append(time.perf_counter() - t0)
    return round(min(walls) * 1e3, 2)


def _init_bf16(model, seed: int = 0):
    """Materialize params directly in bf16 on device.

    3B-class models cannot take the default f32 init + astype round trip on
    a 16 GB v5e (13 GB f32 + 6.6 GB bf16 live at once); eval_shape gives the
    pytree skeleton for free and each leaf is drawn straight into bf16.
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    shapes = jax.eval_shape(model.init_params, key)
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, s in zip(keys, leaves):
        if jnp.issubdtype(s.dtype, jnp.floating):
            out.append(jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02)
        else:
            out.append(jnp.zeros(s.shape, s.dtype))
    model.params = jax.tree.unflatten(treedef, out)
    return model


def bench_higgs_v2(bits=None):
    """Higgs Audio v2 3B — the reference's only published TTS RTF
    (docs/models/tts/higgs_audio.md:156-160: bf16 0.60x, q8 0.36x, q6 0.33x
    on M5 Max = 1.67x / 2.78x / 3.0x realtime, warm + long prompt).

    Random bf16 weights at real checkpoint dims (HBM traffic and FLOPs
    match the real model; sampled EOS with random logits would stop
    generation at a random point, so the decode loop is driven for a fixed
    250 frames = 10 s of audio and the wall composed exactly as a real
    generate() call: prefill + frames + codec decode).
    """
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.ops.roofline import ar_decode_roofline
    from mlx_audio_tpu.tts.models.higgs_audio import Model, ModelConfig
    from mlx_audio_tpu.tts.models.higgs_audio.higgs_audio import (
        CHUNK_FRAMES, _bucket)

    cfg = ModelConfig()            # defaults are the real 3B dims
    model = _init_bf16(Model(cfg))
    if bits:
        from mlx_audio_tpu.ops.quant import (
            maybe_quantize_tree, tree_to_i8_layout)

        model.params = maybe_quantize_tree(
            model.params, group_size=64, bits=bits,
            predicate=lambda path, w: model.model_quant_predicate(path, w),
            consume=True)
        if bits == 8:
            # product q8 decode path (utils.apply_quantization mxu_int8):
            # per-channel W8A8 via the MXU's s8xs8->s32 dot, ~1.5x faster
            # than bf16-dense and the VPU-dequant formulation at b=1 on v5e
            model.params = tree_to_i8_layout(model.params, consume=True)

    t = cfg.text
    rng = np.random.RandomState(0)
    plen, n_frames, fps = 480, 250, 25           # 10 s of 24 kHz audio
    pb = _bucket(plen)
    cache_len = _bucket(pb + n_frames + cfg.audio_num_codebooks
                        + CHUNK_FRAMES)
    embeds = jnp.asarray(rng.randn(1, pb, t.hidden_size) * 0.02,
                         jnp.bfloat16)
    mask = jnp.zeros((1, pb), bool)

    prefill = model._prefill_fn(pb, cache_len)
    step = model._chunk_fn(CHUNK_FRAMES, 0.7, 0.95, 0, 7, 2, 0)

    def run():
        carry, _ = prefill(model.params, embeds, mask, jnp.int32(plen),
                           jax.random.PRNGKey(0))
        blocks = []
        for _ in range(n_frames // CHUNK_FRAMES):
            carry, frames, _ = step(model.params, carry)
            blocks.append(np.asarray(frames))
        return np.concatenate(blocks, axis=0)            # (N, K)

    t0 = time.perf_counter()
    frames = run()                                        # compile + warm
    compile_wall = time.perf_counter() - t0

    walls = []
    for _ in range(3):                                    # tunnel jitter
        t0 = time.perf_counter()
        frames = run()
        walls.append(time.perf_counter() - t0)
    gen_wall = min(walls)

    # codec decode at real dims (RVQ + 1024-hidden DAC decoder) — part of
    # the reference's measured RTF too
    from mlx_audio_tpu.codec.models.higgs_audio import (
        Model as Codec, ModelConfig as CodecConfig)

    codec = Codec(CodecConfig()).init_and_bind()
    codec.astype(jnp.bfloat16)
    codes = np.ascontiguousarray(frames.T)[:, :n_frames - 8] % 1024
    codec.decode(codes.T)                                 # warm
    t0 = time.perf_counter()
    codec.decode(codes.T)
    codec_wall = time.perf_counter() - t0

    audio_s = n_frames / fps
    wall = gen_wall + codec_wall
    xrt = audio_s / wall
    frame_ms = gen_wall / n_frames * 1e3
    # Roofline charges only the weights a decode step actually streams:
    # XLA dead-code-eliminates the text-FFN branch of every dual-FFN layer
    # (the audio_out_mask is a compile-time constant True during decode)
    # and embed_tokens / codebook embeddings are gathers, not streams.
    decode_tree = {
        "layers": {i: {"self_attn": lp["self_attn"],
                       "audio_mlp": lp["audio_mlp"]}
                   for i, lp in model.params["layers"].items()},
        "norm": model.params["norm"],
        "audio_lm_head": model.params["audio_decoder_proj"][
            "audio_lm_head"],
    }
    n_syncs = n_frames // CHUNK_FRAMES + 1      # one asarray per chunk
    rtt_ms = measure_sync_rtt()
    onchip_step = max(gen_wall - n_syncs * rtt_ms / 1e3, 1e-9) / n_frames
    roof = ar_decode_roofline(
        decode_tree, fps=fps, measured_step_s=onchip_step,
        cache_len=cache_len, n_layers=t.num_hidden_layers,
        n_kv_heads=t.num_key_value_heads, head_dim=t.head_dim,
        kv_itemsize=2)
    roof["tunnel_rtt_ms"] = rtt_ms
    roof["n_syncs"] = n_syncs
    roof["raw_step_ms"] = round(gen_wall / n_frames * 1e3, 3)
    label = f"q{bits}" if bits else "bf16"
    ref_rtf = {None: 0.60, 8: 0.36, 6: 0.33, 4: 0.33}.get(bits, 0.60)
    return {"xrt": round(xrt, 2), "rtf": round(1.0 / xrt, 3),
            "wall_s": round(wall, 2), "audio_s": audio_s,
            "frame_ms": round(frame_ms, 2),
            "codec_wall_s": round(codec_wall, 3),
            "compile_s": round(compile_wall, 1),
            "dtype": label, "ref_m5max_rtf": ref_rtf,
            "vs_ref_m5max": round(xrt / (1.0 / ref_rtf), 2),
            "roofline": roof}


def _kugel_model_q8(seed: int = 0):
    """KugelAudio-0-open at real dims, init'd straight into the q8 decode
    layout (reference kugelaudio/config.py defaults: Qwen2.5-7B backbone +
    4-layer/3584-hidden diffusion head, latent 64, hop 3200 = 7.5 fps).

    bf16 would be ~17.4 GB — the reference's "~17GB unified memory"
    (kugelaudio/README.md:70-72) — which exceeds a v5e's 16 GB HBM, so the
    single-chip recipe is per-channel W8A8 for every matmul the frame loop
    streams (LM layers + diffusion head). embed_tokens / lm_head stay bf16:
    both are gather-only (pick4 reads 4 rows; prompt embeds are a gather),
    so they cost HBM capacity but zero per-frame bandwidth. Weights are
    quantized leaf-by-leaf during init so peak memory never holds the bf16
    model (~9.5 GB total).
    """
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.ops.quant import quantize_weight, to_i8_layout
    from mlx_audio_tpu.tts.models.kugelaudio import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        acoustic_tokenizer_config=dict(
            vae_dim=64, channels=1, causal=True, encoder_n_filters=32,
            encoder_ratios=[8, 5, 5, 4, 2, 2],
            encoder_depths="3-3-3-3-3-3-8"),
        decoder_config=dict(
            hidden_size=3584, intermediate_size=18944,
            num_attention_heads=28, num_hidden_layers=28,
            num_key_value_heads=4, vocab_size=152064,
            rope_theta=1000000.0),
        diffusion_head_config=dict(
            hidden_size=3584, head_layers=4, head_ffn_ratio=3.0,
            latent_size=64, ddpm_num_steps=1000,
            ddpm_num_inference_steps=10),
        acoustic_vae_dim=64, tie_word_embeddings=False))
    model = Model(cfg)
    skel = jax.eval_shape(model.init_params, jax.random.PRNGKey(seed))
    counter = [0]

    def draw(s, dtype):
        counter[0] += 1
        k = jax.random.fold_in(jax.random.PRNGKey(seed), counter[0])
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jax.random.normal(k, s.shape, dtype) * 0.02
        return jnp.zeros(s.shape, s.dtype)

    def hot_linear(path, node):
        w = node.get("weight")
        return (w is not None and getattr(w, "ndim", 0) == 2
                and w.shape[1] % 64 == 0
                and (path.startswith("language_model.model.layers")
                     or path.startswith("prediction_head")))

    def build(node, path=""):
        if isinstance(node, dict):
            if hot_linear(path, node):
                w = draw(node["weight"], jnp.bfloat16)
                q = to_i8_layout(quantize_weight(w, group_size=64, bits=8))
                del w
                if "bias" in node:
                    q["bias"] = draw(node["bias"], jnp.float32)
                return q
            return {k: build(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        return draw(node, jnp.bfloat16)

    model.bind(build(skel))

    class _Tok:            # offline stand-in; real prompt-length regime
        def encode(self, s, **kw):
            return [1000 + (ord(c) % 5000) for c in s]

    model.tokenizer = _Tok()
    return model


def bench_kugelaudio():
    """KugelAudio 7B — the reference's AR+diffusion RTF number
    (kugelaudio/README.md:76-78: 'RTF is approximately 5-7x with
    cfg_scale=3.0 and ddpm_steps=10 on M4 Max').

    The exact reference recipe: cfg_scale 3.0 (CFG on), 10 SDE-DPM-Solver++
    steps per latent. 64 latent frames = 8.5 s of 24 kHz audio — the
    per-frame cost is constant (fixed weight+KV stream per frame), so xRT
    needs only enough frames to amortize prefill/decode tails, not 20 s of
    audio (round-4's 150-frame lane helped push the bench past the driver
    budget). Random weights never pick speech_diffusion, so a +1e4 lm_head
    bias on the diffusion row forces every frame down the full AR+diffusion
    path (the per-frame cost is weight-independent).
    """
    import jax.numpy as jnp

    from mlx_audio_tpu.ops.roofline import (CHIP_SPECS, detect_chip,
                                            kv_read_bytes,
                                            param_footprint_bytes)
    from mlx_audio_tpu.tts.models.kugelaudio.kugelaudio import (
        CHUNK_FRAMES, SPEECH_DIFFUSION_ID)

    model = _kugel_model_q8()
    model._collect_stats = True
    vocab = model.config.decoder_config.vocab_size
    bias = np.zeros((vocab,), np.float32)
    bias[SPEECH_DIFFUSION_ID] = 1e4
    model.params["lm_head"]["bias"] = jnp.asarray(bias)

    text = ("Machine learning systems now synthesize natural speech in "
            "real time on a single accelerator chip, streaming audio to "
            "listeners across the planet.")
    n_frames, steps = 64, 10

    def run(seed):
        res = list(model.generate(text, cfg_scale=3.0,
                                  max_tokens=n_frames, ddpm_steps=steps,
                                  seed=seed))
        return res[0]

    t0 = time.perf_counter()
    r = run(0)                                         # compile + warm
    compile_wall = time.perf_counter() - t0
    assert r.samples == n_frames * 3200, (r.samples, n_frames)

    walls, stats = [], []
    for seed in (1, 2):
        t0 = time.perf_counter()
        r = run(seed)
        walls.append(time.perf_counter() - t0)
        stats.append(dict(model._last_gen_stats))
    wall = min(walls)
    phases = stats[int(np.argmin(walls))]
    audio_s = r.samples / 24000
    xrt = audio_s / wall

    # bandwidth roofline: per frame the chip streams the q8 LM layer stack
    # once (b=2 CFG rows share it), the q8 diffusion head once per SDE step,
    # and the 2-row KV buffer; embed/lm_head are gathers.
    lm_layers = model.params["language_model"]["model"]["layers"]
    head = model.params["prediction_head"]
    lm_cfg = model._lm_cfg()
    kv = kv_read_bytes(
        cache_len=512, n_layers=lm_cfg.num_hidden_layers,
        n_kv_heads=lm_cfg.num_key_value_heads,
        head_dim=lm_cfg.resolved_head_dim, itemsize=4, batch=2)
    bytes_frame = (param_footprint_bytes(lm_layers)
                   + steps * param_footprint_bytes(head) + kv)
    chip = detect_chip()
    bw = CHIP_SPECS[chip]["hbm_gbs"] * 1e9
    sol_frame_s = bytes_frame / bw
    frame_s = wall / n_frames
    n_chunks = -(-n_frames // CHUNK_FRAMES)
    return {"xrt": round(xrt, 2), "rtf": round(1.0 / xrt, 3),
            "wall_s": round(wall, 2), "audio_s": round(audio_s, 2),
            "frame_ms": round(frame_s * 1e3, 2),
            "compile_s": round(compile_wall, 1),
            "ddpm_steps": steps, "cfg_scale": 3.0, "dtype": "q8",
            "n_syncs": n_chunks + 2,
            "phases": phases,
            # axon exposes no memory_stats; the analytic resident footprint
            # (weights; + ~0.3 GB caches/latbuf/activations) vs ref ~17 GB
            "param_hbm_gb": round(
                param_footprint_bytes(model.params) / 1e9, 2),
            "ref_m4max_xrt": "5-7 (bf16, ~17GB)",
            "vs_ref_m4max_mid": round(xrt / 6.0, 2),
            "roofline": {
                "chip": chip, "bytes_per_frame": bytes_frame,
                "sol_frame_ms": round(sol_frame_s * 1e3, 2),
                "sol_xrt": round((3200 / 24000) / sol_frame_s, 2),
                "pct_of_roofline": round(
                    100 * sol_frame_s / max(frame_s, 1e-12), 1),
                "achieved_gbs": round(
                    bytes_frame / max(frame_s, 1e-12) / 1e9, 1)}}


def bench_realtime_stt():
    """Streaming-STT latency on the chip (round-4 verdict missing #3):
    drive a voxtral_realtime session (real Voxtral-Mini-3B-Realtime dims,
    the model behind /v1/realtime) with 1 s PCM16-rate chunks for 30 s of
    audio and report p50/p95 per-chunk step latency, end-of-turn ->
    final-transcript latency, and xRT. "True realtime" = p95 chunk latency
    under the 1 s chunk duration. The reference's realtime story is
    qualitative only (ref docs/models/stt/voxtral-realtime.md:93-97); this
    lane turns it into a number. Session protocol parity: reference
    voxtral_realtime/streaming.py:388, server.py:1549."""
    return _realtime_stt_lane()


def _realtime_stt_lane(cfg=None, seconds=30):
    from mlx_audio_tpu.stt.models.voxtral_realtime import Model, ModelConfig

    model = _init_bf16(Model(cfg or ModelConfig()))   # defaults = real dims

    class _Tok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    model._tokenizer = _Tok()
    rng = np.random.RandomState(0)
    audio = (rng.randn(seconds * 16000) * 0.1).astype(np.float32)

    def drive(n_seconds):
        sess = model.create_streaming_session(max_tokens=4096)
        lat = []
        for i in range(n_seconds):
            t0 = time.perf_counter()
            sess.feed(audio[i * 16000:(i + 1) * 16000])
            # one step per chunk: the decoder is pace-limited by available
            # adapter frames (12.5 tok/s), so 16 covers a 1 s chunk
            sess.step(max_decode_tokens=16)
            lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sess.close()
        guard = 0
        while not sess.done and guard < 500:
            sess.step(max_decode_tokens=32)
            guard += 1
        eot = time.perf_counter() - t0
        return lat, eot, len(sess.generated)

    t0 = time.perf_counter()
    drive(min(6, seconds))       # compile every program (model-level cache)
    compile_wall = time.perf_counter() - t0
    lat, eot, n_tok = drive(seconds)
    wall = sum(lat) + eot
    ls = sorted(lat)
    p50 = ls[len(ls) // 2]
    p95 = ls[min(len(ls) - 1, int(len(ls) * 0.95))]
    return {"chunks": len(lat), "chunk_s": 1.0,
            "step_p50_ms": round(p50 * 1e3, 1),
            "step_p95_ms": round(p95 * 1e3, 1),
            "step_max_ms": round(ls[-1] * 1e3, 1),
            "eot_to_final_s": round(eot, 3),
            "xrt": round(seconds / wall, 2),
            "realtime": bool(p95 < 1.0),
            "decoded_tokens": n_tok,
            "compile_s": round(compile_wall, 1),
            "arch": "voxtral-mini-3b-realtime"}


def bench_qwen3_batched(batch_sizes=(1, 8)):
    """Continuous-batching aggregate throughput — the TPU's strongest
    serving argument over single-stream MLX (round-2 verdict missing #3).

    Drives the fixed-slot Qwen3TTSBatchSession (continuous_batching.py) at
    B concurrent requests submitted at t0; reports aggregate xRT/chip,
    per-stream TTFA, and bandwidth roofline at that batch.
    """
    from mlx_audio_tpu.server_inference import InferenceRequest
    from mlx_audio_tpu.tts.continuous import TTSBatchOptions

    model = _qwen3_model()
    frames = 100                                    # 8 s of 12.5 Hz audio

    def _run(bsz):
        # right-size the session timeline: B prompts (~50 tokens each) +
        # the frame budget; the decode step streams the whole buffer, so a
        # 4096 default would burn 4x the KV bandwidth and OOM at b=8
        sess = model.create_tts_batch_session(TTSBatchOptions(
            max_batch_size=bsz, max_tokens=frames, streaming_interval=0.4,
            max_cache_len=1024))
        # a production broker keeps one warm session alive across bursts
        # (server_inference idle-TTL retention) — measure what requests see
        sess.warmup()
        reqs = []
        t0 = time.perf_counter()
        for i in range(bsz):
            r = InferenceRequest(
                endpoint_kind="tts", model_name="bench", payload=None,
                normalized_kwargs={
                    "text_ids": np.arange(100 + i, 150 + i)[None]})
            sess.submit(r)
            reqs.append(r)
        ttfa = {}
        samples = {i: 0 for i in range(bsz)}
        steps = 0
        while not sess.idle and steps < frames * 4:
            sess.step()
            steps += 1
            now = time.perf_counter()
            for i, r in enumerate(reqs):
                while not r.result_queue.empty():
                    c = r.result_queue.get()
                    if c.kind == "data" and c.payload and "audio" in c.payload:
                        if i not in ttfa:
                            ttfa[i] = now - t0
                        samples[i] += len(c.payload["audio"])
        wall = time.perf_counter() - t0
        audio_s = sum(samples.values()) / 24000.0
        tt = sorted(ttfa.values()) or [-1.0]
        return {"batch": bsz, "agg_xrt": round(audio_s / wall, 2),
                "audio_s": round(audio_s, 2), "wall_s": round(wall, 2),
                "ttfa_p50_s": round(tt[len(tt) // 2], 3),
                "ttfa_max_s": round(tt[-1], 3)}

    out = {}
    for bsz in batch_sizes:
        _run(bsz)                                   # compile at this width
        best = None
        for _ in range(2):                          # tunnel jitter
            r = _run(bsz)
            if best is None or r["agg_xrt"] > best["agg_xrt"]:
                best = r
        out[f"b{bsz}"] = best
        print(f"qwen3 batched b={bsz}: {best}", file=sys.stderr)
    bs = [out[k] for k in out]
    if len(bs) > 1 and bs[0]["agg_xrt"] > 0:
        out["scaling_b1_to_max"] = round(bs[-1]["agg_xrt"] / bs[0]["agg_xrt"],
                                         2)
    return out


def bench_cohere_asr():
    """10-minute-meeting analog (BASELINE: reference does it in 32 s wall on
    M1 Max => 18.75x realtime). Real checkpoint dims (48-layer d1280
    FastConformer + 8-layer d1024 decoder); random weights never emit EOS,
    so every row decodes the full 150 tokens — a pessimistic workload."""
    import jax.numpy as jnp

    from mlx_audio_tpu.stt.models.cohere_asr import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        vocab_size=16384,
        encoder=dict(feat_in=128, n_layers=48, d_model=1280, n_heads=8,
                     ff_expansion_factor=4, subsampling_factor=8,
                     subsampling_conv_channels=256, conv_kernel_size=9),
        transf_decoder=dict(config_dict=dict(
            hidden_size=1024, inner_size=4096, num_attention_heads=8,
            num_layers=8, max_sequence_length=1024)),
        head=dict(hidden_size=1024, num_classes=16384),
        batch_size=8))
    model = Model(cfg).init_and_bind()
    model.astype(jnp.bfloat16)

    class _Tok:
        token2id = {s: i for i, s in enumerate(
            ["<|startofcontext|>", "<|startoftranscript|>",
             "<|emo:undefined|>", "<|en|>", "<|pnc|>", "<|nopnc|>",
             "<|noitn|>", "<|notimestamp|>", "<|nodiarize|>",
             "<|endoftext|>"])}
        eos_id = token2id["<|endoftext|>"]

        def decode(self, ids):
            return " ".join(map(str, ids))

    model._tokenizer = _Tok()
    rng = np.random.RandomState(0)
    audio_s = 600
    audio = (rng.randn(audio_s * 16000) * 0.1).astype(np.float32)

    # warmup: one full pass compiles every (mel_bucket, batch_bucket) the
    # energy chunker produces; the timed pass is the warm steady state
    # (matching the reference's warm wall-clock methodology)
    model.generate(audio, language="en", max_tokens=150)
    wall = None
    for _ in range(3):  # best-of-3: tunnel jitter
        t0 = time.perf_counter()
        out = model.generate(audio, language="en", max_tokens=150)
        w = time.perf_counter() - t0
        wall = w if wall is None else min(wall, w)
    return {"xrt": round(audio_s / wall, 2), "wall_s": round(wall, 2),
            "segments": len(out.segments),
            "gen_tokens": out.generation_tokens,
            "ref_m1max_xrt": 18.75}


def bench_whisper():
    """Whisper large-v3-turbo dims (BASELINE.md: 'Whisper-style STT —
    competitive xRT vs reference wall-clock numbers').

    Random weights at the real turbo architecture (32-layer d1280 encoder,
    4-layer d1280 decoder, 128 mels). Random logits never emit EOT, so the
    decode is capped at sample_len=100 tokens/30-s window — about the
    transcript density of real speech; the fallback-temperature retries and
    quality thresholds are disabled so exactly one greedy decode runs per
    window (what a well-transcribed real file does).
    """
    import jax.numpy as jnp

    from mlx_audio_tpu.stt.models.whisper import Model
    from mlx_audio_tpu.stt.models.whisper.whisper import ModelDimensions

    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4)
    model = Model(dims).init_and_bind()
    model.astype(jnp.bfloat16)
    rng = np.random.RandomState(0)
    audio_s = 600                                   # 10-minute file
    audio = (rng.randn(audio_s * 16000) * 0.1).astype(np.float32)

    kw = dict(language="en", temperature=0.0,
              compression_ratio_threshold=None, logprob_threshold=None,
              no_speech_threshold=None, return_timestamps=True,
              sample_len=100)
    model.generate(audio, **kw)                     # compile-warm
    wall = None
    for _ in range(3):                              # tunnel jitter
        t0 = time.perf_counter()
        out = model.generate(audio, **kw)
        w = time.perf_counter() - t0
        wall = w if wall is None else min(wall, w)
    return {"xrt": round(audio_s / wall, 2), "wall_s": round(wall, 2),
            "audio_s": audio_s, "segments": len(out.segments or []),
            "arch": "large-v3-turbo"}


def bench_compile_cached():
    """Cold-start proof (round-2 verdict missing/weak #2): time the qwen3
    first-generate in a FRESH process with the persistent compilation cache
    already warm (this process compiled it). A production restart pays
    compile_cached_s, not compile_cold_s."""
    import subprocess

    code = (
        "import json, time, numpy as np\n"
        "t_imp = time.perf_counter()\n"
        "from mlx_audio_tpu import enable_compilation_cache\n"
        "enable_compilation_cache()\n"
        "import bench\n"
        "model = bench._qwen3_model(prewarm=True)\n"
        "t0 = time.perf_counter()\n"
        "ttfa = None\n"
        "for r in model.generate(text_ids=np.arange(100, 150)[None],\n"
        "        temperature=0.9, max_tokens=60, stream=True,\n"
        "        streaming_interval=0.6, seed=0):\n"
        "    if ttfa is None and r.samples > 0:\n"
        "        ttfa = time.perf_counter() - t0\n"
        "print('COLD_START', json.dumps({\n"
        "    'compile_cached_s': round(time.perf_counter() - t0, 1),\n"
        "    'setup_s': round(t0 - t_imp, 1),\n"
        "    'ttfa_s': round(ttfa if ttfa is not None else -1, 1),\n"
        "    'prewarm': model._prewarm_outcome}))\n"
    )
    # 240 s box (was 900): the metric is compile_cached_s (clock starts
    # after setup), but the subprocess also pays ~60-120 s of host-side
    # 1.7B random-param init on this 1-vCPU box before that clock starts —
    # the box must cover setup without re-risking the round-4 driver
    # timeout (the per-lane time box bounds the damage either way)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=240,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in out.stdout.splitlines():
        if line.startswith("COLD_START "):
            res = json.loads(line[len("COLD_START "):])
            # a silently-failed prewarm invalidates the number: surface it
            if not (res.get("prewarm") or {}).get("ok"):
                res["warning"] = "prewarm did not complete cleanly"
            return res
    raise RuntimeError(f"cached-compile subprocess failed: {out.stderr[-800:]}")


def _retry(fn, attempts=2):
    """The axon tunnel has transient failure windows; one retry per bench
    keeps a single flake from zeroing the round's record."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - record and retry once
            last = e
            print(f"{fn.__name__} attempt {i + 1} failed: {e}",
                  file=sys.stderr)
    raise last


def _flush(details):
    try:
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=2)
    except OSError:
        pass


def _headline(details):
    kok = details.get("kokoro_82m") or {}
    xrt = kok.get("xrt", 0.0)
    return json.dumps({
        "metric": "kokoro_82m_xrt",
        "value": xrt,
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 50.0, 3),
    })


def _run_lane(name, fn, budget_s, details, t_start, retries=2):
    """Run one lane under a hard time box, flushing results immediately.

    The lane runs on a worker thread; join(budget) bounds it. A lane that
    overruns is recorded as a timeout and ABANDONED (daemon thread) — the
    record of every other lane survives, which is the whole point
    (round-4's un-boxed lanes lost a 25-minute record to one overrun).
    """
    elapsed = time.monotonic() - t_start
    remaining = TOTAL_BUDGET_S - elapsed
    if remaining < min(90.0, budget_s):
        details[name] = {"skipped":
                         f"global budget: {remaining:.0f}s left"}
        details.setdefault("_lanes", []).append(
            {"lane": name, "status": "skipped", "at_s": round(elapsed, 1)})
        _flush(details)
        print(f"{name}: SKIPPED ({remaining:.0f}s left)", file=sys.stderr)
        return None
    budget = min(budget_s, remaining)
    box = {}

    def work():
        try:
            box["result"] = _retry(fn, attempts=retries)
        except Exception as e:  # noqa: BLE001 - lane outcome is data
            box["error"] = f"{type(e).__name__}: {e}"[:400]

    t0 = time.monotonic()
    worker = threading.Thread(target=work, daemon=True, name=f"lane-{name}")
    worker.start()
    worker.join(budget)
    wall = time.monotonic() - t0
    if worker.is_alive():
        details[name] = {"timeout_s": round(budget, 1)}
        status = "timeout"
        # short grace so in-flight device work drains before the next lane
        worker.join(15)
    elif "error" in box:
        details[name] = {"error": box["error"]}
        status = "error"
    else:
        details[name] = box["result"]
        status = "ok"
    # lane models die as reference cycles: without an explicit collect the
    # device buffers (10 GB for kugel) survive into the next lane and OOM
    # the 16 GB chip (measured: gc.collect() returns live_arrays to 0)
    import gc

    gc.collect()
    rec = {"lane": name, "status": status, "wall_s": round(wall, 1)}
    try:
        import jax

        live = sum(a.nbytes for a in jax.live_arrays()) / 1e9
        if live > 2.0:
            # a closure/trace still pins device memory — drop jax's
            # tracing caches (executables reload from the disk cache)
            jax.clear_caches()
            gc.collect()
            live = sum(a.nbytes for a in jax.live_arrays()) / 1e9
        rec["live_gb_after"] = round(live, 2)
    except Exception:  # noqa: BLE001 - diagnostics only
        pass
    details.setdefault("_lanes", []).append(rec)
    _flush(details)
    print(f"{name} [{status}, {wall:.0f}s]: {details[name]}",
          file=sys.stderr)
    return box.get("result")


def _device_alive(timeout_s: float = 90) -> bool:
    """True once jax.devices() answers within the window. The axon chip
    grant can stall indefinitely when the pool is busy; a bench that can't
    get the device should record that and exit rather than burn every
    lane's budget on the same hang."""
    box = {}

    def probe():
        try:
            import jax

            box["n"] = len(jax.devices())
        except Exception:  # noqa: BLE001
            box["n"] = 0

    t = threading.Thread(target=probe, daemon=True, name="device-probe")
    t.start()
    t.join(timeout_s)
    return box.get("n", 0) > 0


def main():
    from mlx_audio_tpu import enable_compilation_cache

    enable_compilation_cache()
    t_start = time.monotonic()
    details = {}

    # ---- headline lane first: its JSON line prints the moment it's done
    # (generous box: a code change invalidating the acoustic-jit cache
    # costs ~2 fresh compiles here, measured >300 s twice in round 5)
    _run_lane("kokoro_82m", bench_kokoro, 420, details, t_start)
    print(_headline(details), flush=True)

    if "xrt" not in (details.get("kokoro_82m") or {}) \
            and not _device_alive(90):
        details["device_unreachable"] = True
        details["total_wall_s"] = round(time.monotonic() - t_start, 1)
        _flush(details)
        print("device unreachable: aborting remaining lanes",
              file=sys.stderr)
        print(_headline(details), flush=True)
        return

    # ---- remaining lanes, most-important first (a late driver kill keeps
    # everything already flushed)
    q = _run_lane("qwen3_tts_1b7", bench_qwen3, 360, details, t_start)
    if q:
        details["qwen3_vs_target"] = round(q["xrt"] / 5.0, 3)
    _run_lane("qwen3_tts_1b7_q8", lambda: bench_qwen3(8), 300, details,
              t_start)
    _run_lane("qwen3_tts_batched", bench_qwen3_batched, 300, details,
              t_start)
    _run_lane("kokoro_batched_b8", bench_kokoro_batched, 240, details,
              t_start, retries=1)
    _run_lane("cold_start", bench_compile_cached, 330, details, t_start,
              retries=1)
    _run_lane("kugelaudio_7b", bench_kugelaudio, 330, details, t_start,
              retries=1)
    _run_lane("realtime_stt", bench_realtime_stt, 300, details, t_start,
              retries=1)
    c = _run_lane("cohere_asr_10min", bench_cohere_asr, 240, details,
                  t_start)
    if c:
        details["cohere_vs_ref_m1max"] = round(c["xrt"] / 18.75, 3)
    _run_lane("whisper_turbo_10min", bench_whisper, 300, details, t_start)
    _run_lane("higgs_v2_3b_bf16", lambda: bench_higgs_v2(None), 270,
              details, t_start)
    _run_lane("higgs_v2_3b_q8", lambda: bench_higgs_v2(8), 240, details,
              t_start)

    # headline safety net: if the kokoro lane timed out (a cold-cache
    # compile after a code change can exceed its box), the abandoned worker
    # has since finished those compiles — a retry with leftover budget is
    # cheap and rescues the driver-parsed headline metric
    if "xrt" not in (details.get("kokoro_82m") or {}) \
            and TOTAL_BUDGET_S - (time.monotonic() - t_start) > 180:
        _run_lane("kokoro_82m", bench_kokoro, 300, details, t_start,
                  retries=1)

    try:
        details["tunnel_rtt_ms"] = measure_sync_rtt()
    except Exception as e:  # noqa: BLE001
        details["tunnel_rtt_ms"] = str(e)[:100]
    details["total_wall_s"] = round(time.monotonic() - t_start, 1)
    _flush(details)
    # the driver parses the LAST stdout line
    print(_headline(details), flush=True)


if __name__ == "__main__":
    main()
