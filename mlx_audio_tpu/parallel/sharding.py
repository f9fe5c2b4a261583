"""NamedSharding rules for model param pytrees.

Tensor-parallel layout for transformer backbones (the ≥4B families: Higgs v3,
Voxtral, VibeVoice-ASR — SURVEY.md §2.10 "TPU build plan"):

* attention q/k/v projections: shard output dim (heads) over "tp"
* attention o projection:      shard input dim over "tp"  (psum on output)
* mlp up/gate:                 shard output dim over "tp"
* mlp down:                    shard input dim over "tp"
* embeddings / norms:          replicated
* batch axis of activations:   "dp"

XLA inserts the all-reduces from these annotations; layouts keep the
collectives on ICI.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 2):
    """Shard the leading (batch) axis over 'dp'."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))


# rule: regex on the flattened param path -> PartitionSpec factory(ndim)
def transformer_param_rules() -> Dict[str, Callable[[int], P]]:
    # weights are (out, in); scan-stacked layers add a leading L axis
    # ((L, out, in)) which must stay unsharded — shard relative to the
    # TRAILING dims so both layouts work.
    def col_w(ndim):   # shard out features: (..., tp, None)
        return P(*([None] * (ndim - 2) + ["tp", None]))

    def row_w(ndim):   # shard in features: (..., None, tp)
        return P(*([None] * (ndim - 1) + ["tp"]))

    def col_b(ndim):   # bias (out,) or stacked (L, out)
        return P(*([None] * (ndim - 1) + ["tp"]))

    return {
        r"\.(q_proj|k_proj|v_proj)\.weight$": col_w,
        r"\.(gate_proj|up_proj)\.weight$": col_w,
        r"\.(q_proj|k_proj|v_proj)\.bias$": col_b,
        r"\.o_proj\.weight$": row_w,
        r"\.down_proj\.weight$": row_w,
        r"\.(wqkv|in_proj)\.weight$": col_w,
        r"\.(wo|out_proj)\.weight$": row_w,
    }


def expert_parallel_rules() -> Dict[str, Callable[[int], P]]:
    """TP rules + expert-parallel MoE layout (SURVEY §2.10 EP plan).

    Expert-stacked weights ((E, out, in) switch_mlp tensors, e.g.
    bailingmm/Ming-Omni and zonos2 MoE layers) shard the EXPERT axis over
    "tp" instead of splitting inside each expert: each device holds E/tp
    whole experts, routed gathers ride ICI. The dense/attention rules are
    unchanged, so this is a drop-in `rules=` for shard_params.
    """
    def expert_w(ndim):  # (E, out, in): shard experts
        return P(*(["tp"] + [None] * (ndim - 1)))

    rules = {
        r"\.switch_mlp\.(gate_proj|up_proj|down_proj)\.weight$": expert_w,
    }
    rules.update(transformer_param_rules())
    return rules


def spec_for_path(path: str, ndim: int,
                  rules: Optional[Dict] = None) -> P:
    rules = rules or transformer_param_rules()
    for pattern, fn in rules.items():
        if re.search(pattern, path):
            return fn(ndim)
    return P()


def shard_params(params: dict, mesh: Mesh, rules: Optional[Dict] = None,
                 prefix: str = "") -> dict:
    """Device-put a params pytree according to path rules."""
    out = {}
    for k, v in params.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out[k] = shard_params(v, mesh, rules, path)
        elif isinstance(v, jax.Array):
            spec = spec_for_path(path, v.ndim, rules)
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        else:
            out[k] = v
    return out
