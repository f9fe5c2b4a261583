"""TP-sharded KV-cache inference decode == unsharded decode.

The multi-chip product path is inference (VERDICT r1 weak #2): a 4B+ model
decodes with its params TP-sharded over heads and its KV caches sharded the
same way. This asserts numerical parity on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mlx_audio_tpu.parallel import make_mesh, shard_params
from mlx_audio_tpu.tts.models.llama import ModelConfig, init_llama
from mlx_audio_tpu.tts.models.llama.llama import (
    decode_step,
    init_caches,
    llama_forward,
    logits_from_hidden,
)


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=8, num_key_value_heads=4, vocab_size=256,
        head_dim=8, rope_theta=10000.0)


def _run_decode(params, cfg, prompt, caches, decode_steps=4):
    prompt_len = prompt.shape[1]

    def prefill(p, toks, caches):
        hidden, caches = llama_forward(p, cfg, toks, caches=caches, offset=0)
        return logits_from_hidden(p, cfg, hidden)[:, -1], caches

    logits, caches = jax.jit(prefill)(params, prompt, caches)
    outs = [logits]
    tok = jnp.argmax(logits, axis=-1)[:, None]
    step = jax.jit(lambda p, tok, caches, off:
                   decode_step(p, cfg, tok, caches, off))
    for i in range(decode_steps):
        logits, caches = step(params, tok, caches, prompt_len + i)
        outs.append(logits)
        tok = jnp.argmax(logits, axis=-1)[:, None]
    return np.asarray(jnp.stack(outs))


def test_tp_sharded_decode_matches_unsharded(cfg):
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    dp, tp = 4, 2
    mesh = make_mesh((dp, tp), ("dp", "tp"))
    params = init_llama(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (dp, 8)))
    cap = 32

    ref = _run_decode(params, cfg, prompt,
                      init_caches(cfg, dp, cap, dtype=jnp.float32))

    kv_spec = NamedSharding(mesh, P("dp", None, "tp", None))
    sh_caches = jax.tree.map(
        lambda x: jax.device_put(x, kv_spec),
        init_caches(cfg, dp, cap, dtype=jnp.float32))
    sh_params = shard_params(params, mesh)
    sh_prompt = jax.device_put(prompt, NamedSharding(mesh, P("dp", None)))
    with mesh:
        sharded = _run_decode(sh_params, cfg, sh_prompt, sh_caches)

    np.testing.assert_allclose(sharded, ref, atol=1e-4, rtol=1e-4)


class TestMoeExpertParallel:
    """Ming-Omni-class MoE under the mesh (SURVEY §2.10 EP row).

    Both layouts must reproduce the unsharded forward bit-close:
    * transformer_param_rules: expert-internal TP (F/tp per expert)
    * expert_parallel_rules: whole experts sharded E/tp per device
    """

    @pytest.fixture(scope="class")
    def moe(self):
        from mlx_audio_tpu.tts.models.bailingmm.backbones import (
            BailingMoeConfig, bailing_moe_forward, init_bailing_moe,
        )

        cfg = BailingMoeConfig(
            hidden_size=32, num_hidden_layers=2, intermediate_size=64,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=64,
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=16,
            num_shared_experts=1, first_k_dense_replace=1,
            score_function="softmax")
        params = init_bailing_moe(jax.random.PRNGKey(0), cfg)
        emb = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 32))
        ref, _ = bailing_moe_forward(params, cfg, emb)
        return cfg, params, emb, np.asarray(ref), bailing_moe_forward

    @pytest.mark.parametrize("mode", ["tp", "ep"])
    def test_sharded_forward_matches(self, moe, mode):
        from mlx_audio_tpu.parallel import (
            expert_parallel_rules, transformer_param_rules,
        )

        cfg, params, emb, ref, fwd = moe
        mesh = make_mesh((1, 8), ("dp", "tp"))
        rules = (expert_parallel_rules() if mode == "ep"
                 else transformer_param_rules())
        sharded = shard_params(params, mesh, rules)
        if mode == "ep":
            gw = sharded["layers"]["1"]["mlp"]["switch_mlp"][
                "gate_proj"]["weight"]
            spec = gw.sharding.spec
            assert spec[0] == "tp", spec  # expert axis actually sharded
        with mesh:
            got, _ = jax.jit(lambda p, e: fwd(p, cfg, e))(sharded, emb)
            got = np.asarray(got)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
