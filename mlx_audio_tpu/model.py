"""FunctionalModel: the base class for every model family.

The reference builds models as mlx `nn.Module` object graphs; here a model is
a **config + pure apply functions + a params pytree**. The class instance is
a thin handle that owns the params (on device), caches jitted step functions,
and exposes the same public surface (`generate()` iterators, `sanitize()`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


class FunctionalModel:
    """Base for all model families (tts/stt/sts/vad/lid/codec)."""

    def __init__(self, config):
        self.config = config
        self.params: Optional[dict] = None
        self._jit_cache: Dict[Any, Any] = {}

    # -- weight pipeline ---------------------------------------------------

    def sanitize(self, weights: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Remap checkpoint keys / layouts. Default: passthrough."""
        return weights

    def bind(self, params: dict, strict: bool = False) -> None:
        """Attach a params pytree to this model."""
        if strict and hasattr(self, "init_params"):
            expected = set(_leaf_paths(self.init_params(jax.random.PRNGKey(0))))
            got = set(_leaf_paths(params))
            missing = expected - got
            if missing:
                raise ValueError(f"Missing weights: {sorted(missing)[:20]}")
        self.params = params
        # params-derived caches (e.g. cached prompt embeds) key on this
        self._params_epoch = getattr(self, "_params_epoch", 0) + 1

    def init_and_bind(self, key=None) -> "FunctionalModel":
        """Random-init params (tiny-config tests / benchmarks).

        On accelerator backends the whole init runs as ONE jitted program:
        eagerly it is one tiny launch per leaf (~300 for a 1.7B model),
        which costs ~30 s through the tunneled TPU and — being host-side
        dispatch — starves concurrent threads (prewarm) of the GIL. On CPU
        (the test suite) eager init avoids per-config compiles."""
        if key is None:
            key = jax.random.PRNGKey(0)
        if jax.default_backend() != "cpu":
            try:
                self.bind(jax.jit(self.init_params)(key))
                return self
            except Exception:  # fall back to eager init
                pass
        self.bind(self.init_params(key))
        return self

    @classmethod
    def from_pretrained(cls, path_or_repo, filename: Optional[str] = None,
                        dtype=None, **config_overrides) -> "FunctionalModel":
        """Load a checkpoint directly into this family: resolve the path
        (local dir or HF repo id), read config.json when present, then
        sanitize + bind the weights. Mirrors the per-family
        `from_pretrained` classmethods on the reference codec models
        (e.g. reference codec/models/mimi/mimi.py:265,
        codec/models/snac/snac.py:185); `filename` optionally restricts
        loading to one weight file inside the checkpoint."""
        from .utils import (get_model_path, load_config, load_weights,
                            unflatten)

        path = get_model_path(str(path_or_repo))
        try:
            config = load_config(path)
        except FileNotFoundError:
            config = {}
        config.update(config_overrides)
        model = cls(config) if config else cls()
        if filename is not None:
            from safetensors import safe_open

            weights = {}
            with safe_open(str(path / filename), framework="numpy") as f:
                for k in f.keys():
                    weights[k] = jnp.asarray(f.get_tensor(k))
        else:
            weights = load_weights(path, dtype=dtype)
        pre_converted = config.get("converted_by") == "mlx_audio_tpu.convert"
        if not pre_converted:
            weights = model.sanitize(weights)
        model.bind(unflatten(dict(weights)))
        if dtype is not None:
            model.astype(dtype)
        return model

    # -- utilities ---------------------------------------------------------

    def astype(self, dtype) -> "FunctionalModel":
        """Cast floating-point params to dtype (e.g. jnp.bfloat16)."""
        self.params = jax.tree.map(
            lambda x: x.astype(dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            self.params,
        )
        self._params_epoch = getattr(self, "_params_epoch", 0) + 1
        return self

    def num_params(self) -> int:
        return sum(
            x.size for x in jax.tree.leaves(self.params)
            if isinstance(x, jax.Array)
        )


def _leaf_paths(tree: dict, prefix: str = "") -> list:
    out = []
    for k, v in tree.items():
        if str(k).startswith("_"):
            continue
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.extend(_leaf_paths(v, key))
        else:
            out.append(key)
    return out
