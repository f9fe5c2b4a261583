"""LoRA delta application over functional param trees.

Parity: reference stt/models/mega_asr/{lora.py, convert_lora.py} —
materialize scaling*(B@A) (:13-19), resolve dotted module paths, add or
subtract in place (:41-73); factor files hold <module>.lora_A/.lora_B pairs
with scaling pre-folded (convert_lora.py:78-94), adapter dirs hold PEFT
lora_A.weight/lora_B.weight with rank/alpha patterns (:43-75).

Functional version: paths are walked through the nested params dict; the
delta is added to (or subtracted from) the leaf "weight" entry, producing a
new tree (no mutation, jit-cache safe).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

LoraModule = Dict[str, object]      # {"A": (r, in), "B": (out, r),
#                                      "scaling": float}


def materialize_delta(module: LoraModule) -> jnp.ndarray:
    a = jnp.asarray(module["A"], jnp.float32)
    b = jnp.asarray(module["B"], jnp.float32)
    return float(module["scaling"]) * (b @ a)


def load_lora_factors(path) -> Dict[str, LoraModule]:
    """<module>.lora_A/.lora_B safetensors -> adapter dict (scaling 1)."""
    from safetensors.numpy import load_file
    raw = load_file(str(path))
    a = {k[:-len(".lora_A")]: v for k, v in raw.items()
         if k.endswith(".lora_A")}
    b = {k[:-len(".lora_B")]: v for k, v in raw.items()
         if k.endswith(".lora_B")}
    return {m: {"A": np.asarray(v, np.float32),
                "B": np.asarray(b[m], np.float32), "scaling": 1.0}
            for m, v in a.items()}


def load_lora_adapter(directory) -> Dict[str, LoraModule]:
    """PEFT adapter dir (adapter_config.json + adapter_model.safetensors)."""
    from safetensors.numpy import load_file
    directory = Path(directory)
    cfg = json.loads((directory / "adapter_config.json").read_text())
    g_r = int(cfg.get("r", 1))
    g_alpha = int(cfg.get("lora_alpha", g_r))
    rank_pat = cfg.get("rank_pattern") or {}
    alpha_pat = cfg.get("alpha_pattern") or {}
    raw = load_file(str(directory / "adapter_model.safetensors"))

    def name(k):
        for suf in (".lora_A.weight", ".lora_B.weight"):
            if k.endswith(suf):
                k = k[:-len(suf)]
        pre = "base_model.model.thinker."
        return k[len(pre):] if k.startswith(pre) else k

    def pat(m, p, default):
        for cand in (m, "thinker." + m):
            if cand in p:
                return p[cand]
        for k, v in p.items():
            if m == k or m.endswith("." + k):
                return v
        return default

    a = {name(k): v for k, v in raw.items()
         if k.endswith(".lora_A.weight")}
    b = {name(k): v for k, v in raw.items()
         if k.endswith(".lora_B.weight")}
    return {m: {"A": np.asarray(v, np.float32),
                "B": np.asarray(b[m], np.float32),
                "scaling": float(pat(m, alpha_pat, g_alpha))
                / float(pat(m, rank_pat, g_r))}
            for m, v in a.items()}


def _leaf(params: dict, path: str) -> dict:
    node = params
    for seg in path.split("."):
        node = node[seg]
    if "weight" not in node:
        raise TypeError(f"path {path!r} does not resolve to a linear leaf")
    return node


def apply_deltas(params: dict, adapter: Dict[str, LoraModule],
                 sign: float = 1.0) -> dict:
    """Return params with sign * scaling * (B @ A) added at each path."""
    for path, module in adapter.items():
        leaf = _leaf(params, path)
        delta = materialize_delta(module).astype(leaf["weight"].dtype)
        if delta.shape != leaf["weight"].shape:
            raise ValueError(
                f"{path}: delta {delta.shape} != weight "
                f"{leaf['weight'].shape}")
        leaf["weight"] = leaf["weight"] + (delta if sign > 0 else -delta)
    return params
