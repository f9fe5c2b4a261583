"""Decompose the qwen3_tts decode frame time on the real chip.

One frame = talker step (28L) + G-1=15 code-predictor sub-steps (5L each)
+ sampling + embedding assembly. The roofline says the frame should cost
~bytes/757 GB/s; this script times each piece as ONE jitted N-iteration
loop (so tunnel RTT is amortized to nothing) and reports achieved GB/s
per piece — pointing at whichever piece is leaving bandwidth on the table.

Run (real TPU): python tools/profile_qwen3_decode.py [N_FRAMES] [--fuse]
  --fuse: apply fuse_layer_projections to the talker stack first (QKV +
  gate/up fused matvecs) to measure the dispatch-overhead recovery.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 64
    fuse = "--fuse" in sys.argv

    import jax
    import jax.numpy as jnp

    from bench import _qwen3_model
    from mlx_audio_tpu.ops.roofline import param_footprint_bytes
    from mlx_audio_tpu.tts.models.qwen3_tts.talker import (
        code_predictor_sample, fuse_layer_projections, make_stacked_caches,
        talker_forward,
    )

    model = _qwen3_model()
    if fuse:
        model.params["talker"]["model"]["layers"] = fuse_layer_projections(
            model.params["talker"]["model"]["layers"])
        cp_layers = model.params["talker"]["code_predictor"]["model"].get(
            "layers")
        if cp_layers is not None:
            model.params["talker"]["code_predictor"]["model"]["layers"] = (
                fuse_layer_projections(cp_layers))
        print("fused QKV + gate/up projections")
    tcfg, cpcfg = model.tcfg, model.cpcfg
    params = model.params
    cache_len = 256
    n_groups = tcfg.num_code_groups

    cp = params["talker"]["code_predictor"]
    talker_only = {k: v for k, v in params["talker"].items()
                   if k != "code_predictor"}
    talker_only["model"] = {k: v for k, v in talker_only["model"].items()
                            if k != "text_embedding"}
    cp_bytes = param_footprint_bytes(cp)
    talker_bytes = param_footprint_bytes(talker_only)
    kv_bytes = (2 * tcfg.num_hidden_layers * cache_len
                * tcfg.num_key_value_heads * tcfg.head_dim * 2)
    print(f"talker weights: {talker_bytes/1e9:.3f} GB  "
          f"cp weights: {cp_bytes/1e9:.3f} GB  "
          f"kv(cache_len={cache_len}): {kv_bytes/1e9:.3f} GB")

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            walls.append(time.perf_counter() - t0)
        return min(walls)

    # ---- 1. talker-only: N serialized decode steps in one jit ----
    @jax.jit
    def talker_loop(p, embed, caches):
        def body(i, carry):
            embed, caches = carry
            logits, hidden, caches = talker_forward(
                p["talker"], tcfg, embed, caches, i)
            tok = jnp.argmax(logits[:, -1], axis=-1)
            nxt = jnp.take(p["talker"]["model"]["codec_embedding"]["weight"],
                           tok, axis=0)[:, None]
            return nxt, caches
        embed, caches = jax.lax.fori_loop(0, n, body, (embed, caches))
        return embed

    embed0 = jnp.zeros((1, 1, tcfg.hidden_size), jnp.bfloat16)
    caches0 = make_stacked_caches(
        tcfg.num_hidden_layers, 1, cache_len, tcfg.num_key_value_heads,
        tcfg.head_dim, jnp.bfloat16)
    w = timeit(talker_loop, params, embed0, caches0)
    t_talker = w / n
    print(f"talker step:   {t_talker*1e3:7.3f} ms  "
          f"({(talker_bytes + kv_bytes)/t_talker/1e9:6.1f} GB/s achieved)")

    # ---- 2. code-predictor: N frames of the G-1 sub-step scan ----
    def greedy(key, logits):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    @jax.jit
    def cp_loop(p, hidden, code0):
        def body(i, carry):
            hidden, code0, key = carry
            codes, emb_sum, key = code_predictor_sample(
                p["talker"]["code_predictor"], cpcfg, hidden, code0, key,
                greedy, n_groups)
            return hidden + 0.0 * emb_sum, code0 + 0.0 * emb_sum, key
        hidden, code0, _ = jax.lax.fori_loop(
            0, n, body, (hidden, code0, jax.random.PRNGKey(0)))
        return hidden
    hid0 = jnp.zeros((1, 1, tcfg.hidden_size), jnp.bfloat16)
    w = timeit(cp_loop, params, hid0, embed0)
    t_cp = w / n
    per_sub = t_cp / (n_groups - 1)
    print(f"cp frame:      {t_cp*1e3:7.3f} ms  ({per_sub*1e3:.3f} ms/sub-step, "
          f"{cp_bytes/per_sub/1e9:6.1f} GB/s achieved)")

    # ---- 3. full chunk stepper (the production path) ----
    from mlx_audio_tpu.tts.models.qwen3_tts.qwen3_tts import GenCarry

    st = model._make_chunk_stepper(0.9, 50, 1.0, 1.05, 16)
    trailing = jnp.zeros((1, 16, tcfg.hidden_size), jnp.bfloat16)
    pad_embed = jnp.zeros((1, 1, tcfg.hidden_size), jnp.bfloat16)
    carry = GenCarry(
        caches=caches0, embed=embed0, offset=jnp.int32(32),
        finished=jnp.zeros((1,), bool),
        history=jnp.full((1, 64), -1, jnp.int32),
        trailing_idx=jnp.int32(0), n_generated=jnp.zeros((1,), jnp.int32),
        key=jax.random.PRNGKey(0))
    steps = 25
    w = timeit(lambda: st(params, carry, trailing, jnp.int32(16),
                          pad_embed, jnp.int32(steps)))
    t_full = w / steps
    frame_bytes = talker_bytes + kv_bytes + cp_bytes * (n_groups - 1)
    print(f"full frame:    {t_full*1e3:7.3f} ms  "
          f"({frame_bytes/t_full/1e9:6.1f} GB/s achieved)")
    print(f"  sum of parts: talker {t_talker*1e3:.3f} + cp {t_cp*1e3:.3f} "
          f"= {(t_talker + t_cp)*1e3:.3f} ms; overhead "
          f"{(t_full - t_talker - t_cp)*1e3:.3f} ms "
          f"(sampling + penalty + embed assembly)")
    sol = frame_bytes / 757e9
    print(f"  SoL frame {sol*1e3:.3f} ms -> frame at "
          f"{100*sol/t_full:.0f}% of roofline; "
          f"xRT ceiling {1/12.5/t_full:.1f}x (SoL {1/12.5/sol:.1f}x)")


if __name__ == "__main__":
    main()
