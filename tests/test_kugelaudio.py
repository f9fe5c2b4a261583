"""KugelAudio: SDE-DPM tables + AR/diffusion loop (tiny config)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.kugelaudio import Model, ModelConfig
from mlx_audio_tpu.tts.models.kugelaudio.kugelaudio import (
    EOS_TOKEN_ID,
    SPEECH_DIFFUSION_ID,
    SPEECH_END_ID,
    SPEECH_START_ID,
    VALID_SPEECH_TOKENS,
)
from mlx_audio_tpu.tts.models.vibevoice.scheduler import sde_dpm_tables


class CharTok:
    def encode(self, s, **kwargs):
        return [100 + (ord(c) % 200) for c in s]


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        acoustic_tokenizer_config=dict(vae_dim=8, decoder_n_filters=4,
                                       encoder_ratios=[2, 2],
                                       encoder_depths="1-1-1", channels=1),
        decoder_config=dict(hidden_size=32, num_hidden_layers=2,
                            intermediate_size=64, num_attention_heads=4,
                            num_key_value_heads=2, vocab_size=151700),
        diffusion_head_config=dict(hidden_size=32, head_layers=2,
                                   head_ffn_ratio=2.0, latent_size=8,
                                   ddpm_num_steps=1000,
                                   ddpm_num_inference_steps=4),
        acoustic_vae_dim=8, tie_word_embeddings=False))


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    m.tokenizer = CharTok()
    return m


class TestScheduler:
    def test_sde_tables(self):
        t = sde_dpm_tables(1000, 10)
        assert len(t["t"]) == 10
        # final step reaches sigma=0: no injected noise, sample term dies
        assert t["c_noise"][-1] == 0.0
        assert t["a_sample"][-1] == 0.0
        # first + last steps are order-1
        assert t["use_first"][0] == 1.0 and t["use_first"][-1] == 1.0

    def test_config_typo_alias(self):
        cfg = ModelConfig.from_dict(dict(acostic_vae_dim=32))
        assert cfg.acoustic_vae_dim == 32


class TestGenerate:
    def test_prompt_frame(self, model):
        toks = model._build_prompt_tokens("hi there")
        assert toks[-1] == SPEECH_START_ID

    def test_valid_token_constraint(self, model):
        # whatever the weights, the picked token is one of the 4 valid ids
        res = list(model.generate("hello", max_tokens=3, cfg_scale=1.0,
                                  ddpm_steps=4))
        assert res[0].token_count > 0

    def test_forced_diffusion_decodes(self, model):
        # bias the head so speech_diffusion wins initially -> latents flow
        # through connector + VAE decode (hop = prod(ratios) = 4)
        for sign in (10.0, -10.0):
            w = np.zeros_like(np.asarray(model.params["lm_head"]["weight"]))
            w[SPEECH_DIFFUSION_ID] = sign
            model.params["lm_head"]["weight"] = jnp.asarray(w)
            res = list(model.generate("x", max_tokens=5, cfg_scale=3.0,
                                      ddpm_steps=4))
            if res[0].samples:
                assert res[0].samples % 4 == 0
                return
        pytest.fail("diffusion branch never taken for either bias sign")

    def test_max_tokens_beyond_latent_capacity_terminates(self, monkeypatch):
        """Regression: max_tokens > LAT_MAX froze n_tok at the device cap
        while the host break waited for n_tok >= max_tokens — an infinite
        no-op dispatch loop (reachable from server requests). Now the
        budget is clamped with a warning and generation terminates."""
        from mlx_audio_tpu.tts.models.kugelaudio import kugelaudio as q

        monkeypatch.setattr(q, "LAT_MAX", 4)
        m = Model(tiny_cfg()).init_and_bind()
        m.tokenizer = CharTok()
        # +1e4 bias on speech_diffusion: every frame takes the diffusion
        # branch, so neither END nor EOS ever fires and only the budget
        # (or the old hang) can end the loop
        vocab = m.config.decoder_config.vocab_size
        bias = np.zeros((vocab,), np.float32)
        bias[SPEECH_DIFFUSION_ID] = 1e4
        m.params["lm_head"]["bias"] = jnp.asarray(bias)
        with pytest.warns(UserWarning, match="clamping"):
            res = list(m.generate("hello there", max_tokens=10,
                                  cfg_scale=1.0, ddpm_steps=4))
        assert res[0].samples == 4 * 4  # LAT_MAX latents * hop(=4)

    def test_compiled_chunk_matches_two_stream_host_loop(self, model):
        """The b=2 CFG-batched chunk stepper (neg stream sharing cache
        slots behind a mask, weights streamed once per frame) must produce
        the same token/latent sequence as the reference algorithm run as
        two separate b=1 LM streams (reference kugelaudio.py:227-266)."""
        # zero the competing rows and bias speech_diffusion: whichever
        # sign aligns with the hidden state forces several diffusion
        # frames (START ties win at 0 when it doesn't, exercising the
        # pos-row-only advance too)
        rng = np.random.RandomState(3)
        old_w = model.params["lm_head"]["weight"]
        try:
            for trial in range(6):
                v = rng.randn(np.asarray(old_w).shape[1]) * 0.5
                for sign in (1.0, -1.0):
                    w = np.asarray(old_w).copy()
                    for t in (SPEECH_START_ID, SPEECH_END_ID, EOS_TOKEN_ID):
                        w[t] = 0.0
                    w[SPEECH_DIFFUSION_ID] = sign * v
                    model.params["lm_head"]["weight"] = jnp.asarray(w)
                    if self._run_parity(model) >= 2:
                        return
            pytest.fail("no bias direction produced >=2 latents")
        finally:
            model.params["lm_head"]["weight"] = old_w

    def _run_parity(self, model):
        import jax
        from mlx_audio_tpu.ops.kvcache import KVCache
        from mlx_audio_tpu.tts.models.kugelaudio.kugelaudio import (
            FINAL_LATENT_LOGIT_MARGIN)
        from mlx_audio_tpu.tts.models.llama.llama import llama_forward

        cfg_scale, steps, max_tokens, seed = 3.0, 4, 12, 7
        prompt = model._build_prompt_tokens("parity check")
        plen = len(prompt)

        # --- reference: two independent b=1 streams ---
        lm_cfg = model._lm_cfg()
        p = model.params
        cache_len = 512

        def b1_prefill(tokens):
            caches = [KVCache.init(1, cache_len,
                                   lm_cfg.num_key_value_heads,
                                   lm_cfg.resolved_head_dim,
                                   jnp.float32)
                      for _ in range(lm_cfg.num_hidden_layers)]
            n = len(tokens)
            if n == 1:   # t==1 takes the decode path: boolean keep-mask
                mask = (jnp.arange(cache_len) < n)[None]
            else:        # prefill path: additive mask
                mask = jnp.where(jnp.arange(cache_len) < n, 0.0,
                                 -jnp.inf)[None]
            tok = jnp.asarray([tokens], jnp.int32)
            hidden, caches = llama_forward(
                p["language_model"], lm_cfg, tok, caches=caches,
                offset=0, mask=mask)
            return caches, hidden[:, n - 1]

        pos_c, pos_h = b1_prefill(prompt)
        neg_c, neg_h = b1_prefill(
            [int(prompt[-1])])                 # bare speech_start
        sde = model._sde_fn(steps, cfg_scale)
        key = jax.random.PRNGKey(seed)
        ref_lats, ref_toks = [], []
        off, noff = plen, 1
        for _ in range(max_tokens):
            l4 = np.asarray(model._pick4_logits(p, pos_h[0]))
            a = int(np.argmax(l4))
            ref_toks.append(a)
            is_end = a in (1, 3)
            emit = a == 2 or (
                is_end and ref_lats
                and l4[2] > l4[a] - FINAL_LATENT_LOGIT_MARGIN)
            if emit:
                lat, key = sde(p, pos_h, neg_h, key)
                ref_lats.append(np.asarray(lat))
            if is_end:
                break
            emb = model._connector(p, lat) if a == 2 else \
                p["language_model"]["model"]["embed_tokens"][
                    "weight"][jnp.asarray([VALID_SPEECH_TOKENS[a]])]
            emb = emb[None].astype(jnp.float32)
            mask = (jnp.arange(cache_len) <= off)[None]
            pos_h, pos_c = llama_forward(
                p["language_model"], lm_cfg, emb,
                positions=jnp.asarray([[off]]), caches=pos_c,
                offset=jnp.int32(off), mask=mask)
            pos_h = pos_h[:, 0]
            if a == 2:   # neg stream advances on diffusion embeds only
                nmask = (jnp.arange(cache_len) <= noff)[None]
                neg_h, neg_c = llama_forward(
                    p["language_model"], lm_cfg, emb,
                    positions=jnp.asarray([[noff]]),
                    caches=neg_c, offset=jnp.int32(noff), mask=nmask)
                neg_h = neg_h[:, 0]
                noff += 1
            off += 1

        # --- new compiled path ---
        res = list(model.generate("parity check", cfg_scale=cfg_scale,
                                  max_tokens=max_tokens,
                                  ddpm_steps=steps, seed=seed))
        got_n = res[0].token_count - plen
        assert got_n == len(ref_toks)
        hop = int(np.prod(
            model.config.acoustic_tokenizer_config.ratios))
        assert res[0].samples == len(ref_lats) * hop
        if len(ref_lats) < 2:
            return len(ref_lats)   # caller retries with the other sign

        # decode the reference latents through the same VAE path and
        # compare waveforms (catches hidden/cond drift, not just counts)
        from mlx_audio_tpu.tts.models.vibevoice.vibevoice import \
            decode_latents
        seq = np.stack([r[0] for r in ref_lats], axis=0)[None]
        scale = float(np.asarray(p["speech_scaling_factor"]))
        bias = float(np.asarray(p["speech_bias_factor"]))
        if not np.isnan(scale):
            seq = seq / scale - bias
        ref_audio = np.asarray(decode_latents(
            p["acoustic_tokenizer"],
            model.config.acoustic_tokenizer_config,
            jnp.asarray(seq)))[0]
        peak = np.abs(ref_audio).max()
        if peak > 1.0:
            ref_audio = ref_audio * (0.95 / peak)
        np.testing.assert_allclose(res[0].audio, ref_audio,
                                   atol=2e-3, rtol=0)
        return len(ref_lats)

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["kugelaudio"] == "kugelaudio"
        assert set(VALID_SPEECH_TOKENS) == {SPEECH_START_ID, SPEECH_END_ID,
                                            SPEECH_DIFFUSION_ID,
                                            EOS_TOKEN_ID}
