"""QKV / gate-up projection fusion parity.

`fuse_layer_projections` concatenates q/k/v (and gate/up) weights along the
output dim — mathematically exact, so fused and unfused forwards must agree
to float tolerance, for dense and affine-quantized params, in both the
unrolled layer forward and the stacked scan path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.ops.quant import quantize_weight
from mlx_audio_tpu.tts.models.qwen3_tts.talker import (
    fuse_layer_projections,
    init_stacked_layers,
    make_stacked_caches,
    qwen3_layer_forward,
    scan_layers,
)

HID, HEADS, KV, HD, INTER, L = 64, 4, 2, 16, 96, 3
EPS = 1e-6


def _layers(key, bias=True):
    ks = iter(jax.random.split(key, 16 * L + 8))
    return init_stacked_layers(ks, L, HID, HEADS, KV, HD, INTER, bias)


def _inv_freq():
    return 1.0 / (10000.0 ** (jnp.arange(0, HD, 2) / HD))


def test_fused_scan_matches_unfused():
    layers = _layers(jax.random.PRNGKey(0))
    fused = fuse_layer_projections(layers)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, HID))
    pos = jnp.arange(5)[None]
    caches = make_stacked_caches(L, 2, 16, KV, HD, jnp.float32)
    y0, c0 = scan_layers(layers, x, pos, _inv_freq(), HEADS, KV, HD, EPS,
                         caches, 0, None, True)
    y1, c1 = scan_layers(fused, x, pos, _inv_freq(), HEADS, KV, HD, EPS,
                         caches, 0, None, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c0.k), np.asarray(c1.k),
                               rtol=1e-5, atol=1e-5)


def test_fused_single_layer_forward():
    layers = _layers(jax.random.PRNGKey(2), bias=False)
    lp = jax.tree.map(lambda a: a[0], layers)
    fused = fuse_layer_projections(lp)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, HID))
    pos = jnp.arange(4)[None]
    y0, _ = qwen3_layer_forward(lp, x, pos, _inv_freq(), HEADS, KV, HD,
                                EPS, None, 0, None, True)
    y1, _ = qwen3_layer_forward(fused, x, pos, _inv_freq(), HEADS, KV, HD,
                                EPS, None, 0, None, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)


def test_fused_quantized_params():
    """Fusing quantized leaves concatenates w_q/scales/biases along the out
    axis — group structure along `in` is untouched, so dequantized math is
    identical to the per-projection quantized forward."""
    layers = _layers(jax.random.PRNGKey(4), bias=False)

    def quant_leafdict(p):
        if "weight" in p and p["weight"].ndim == 3 \
                and p["weight"].shape[-1] % 16 == 0 \
                and p["weight"].shape[-2] % 8 == 0:
            qs = [quantize_weight(w, group_size=16, bits=8)
                  for w in p["weight"]]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
        return p

    def walk(tree):
        if isinstance(tree, dict) and "weight" in tree:
            return quant_leafdict(tree)
        if isinstance(tree, dict):
            return {k: walk(v) for k, v in tree.items()}
        return tree

    qlayers = walk(layers)
    assert "w_q" in qlayers["self_attn"]["q_proj"]
    fused = fuse_layer_projections(qlayers)
    assert "w_q" in fused["self_attn"]["qkv_proj"]
    assert "w_q" in fused["mlp"]["gateup_proj"]
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, HID))
    pos = jnp.arange(3)[None]
    caches = make_stacked_caches(L, 1, 8, KV, HD, jnp.float32)
    y0, _ = scan_layers(qlayers, x, pos, _inv_freq(), HEADS, KV, HD, EPS,
                        caches, 0, None, True)
    y1, _ = scan_layers(fused, x, pos, _inv_freq(), HEADS, KV, HD, EPS,
                        caches, 0, None, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


def test_fused_decode_step_with_cache():
    layers = _layers(jax.random.PRNGKey(6))
    fused = fuse_layer_projections(layers)
    caches = make_stacked_caches(L, 1, 8, KV, HD, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 1, HID))
    pos = jnp.full((1, 1), 3)
    y0, _ = scan_layers(layers, x, pos, _inv_freq(), HEADS, KV, HD, EPS,
                        caches, 3, None, True)
    y1, _ = scan_layers(fused, x, pos, _inv_freq(), HEADS, KV, HD, EPS,
                        caches, 3, None, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
