"""Model loading, weight management, and audio helpers.

Functional parity target: /root/reference/mlx_audio/utils.py — the L2 layer
of SURVEY.md §1 (get_model_path :108, load_config :155, load_weights :179,
apply_quantization :209, get_model_class :259, base_load_model :321,
get_model_category/load_model :754-898, resample_audio :541,
trim_silence :602, load_audio :641, audio_volume_normalize :477).

TPU redesign: weights load from safetensors directly into a nested jnp
pytree (flat "a.b.c" keys -> nested dicts); each model's `sanitize` does
key remapping AND one-time layout transforms (conv -> WIO etc.); models are
functional (params pytree + pure apply), so "loading" returns a Model object
holding `params` on device in the requested dtype/sharding.
"""

from __future__ import annotations

import contextlib
import glob
import importlib
import importlib.util
import json
import logging
import os
import re
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModelArgs, from_dict  # re-exported for model modules

logger = logging.getLogger(__name__)

PACKAGE = "mlx_audio_tpu"

DEFAULT_ALLOW_PATTERNS = [
    "*.json", "*.safetensors", "*.py", "*.model", "*.tiktoken", "*.txt",
    "*.jinja", "*.jsonl", "*.yaml", "*.npz", "*.pth",
]


def _is_local_path(path: str) -> bool:
    return (
        path.startswith(".") or path.startswith("/") or path.startswith("~")
        or (len(path) > 1 and path[1] == ":")
    )


def get_model_path(
    path_or_hf_repo: str,
    revision: Optional[str] = None,
    force_download: bool = False,
    allow_patterns: Optional[List[str]] = None,
) -> Path:
    """Resolve a local path or download an HF snapshot (network-gated)."""
    model_path = Path(path_or_hf_repo).expanduser()
    if model_path.exists():
        return model_path
    if _is_local_path(path_or_hf_repo):
        raise FileNotFoundError(f"Local model path not found: {path_or_hf_repo}")
    try:
        from huggingface_hub import snapshot_download

        return Path(
            snapshot_download(
                repo_id=path_or_hf_repo,
                revision=revision,
                force_download=force_download,
                allow_patterns=allow_patterns or DEFAULT_ALLOW_PATTERNS,
            )
        )
    except Exception as e:
        raise FileNotFoundError(
            f"Model not found locally and HF download failed for "
            f"'{path_or_hf_repo}': {e}"
        ) from e


def load_config(model_path: Union[str, Path], **kwargs) -> dict:
    if isinstance(model_path, str):
        model_path = get_model_path(model_path, **kwargs)
    config_file = Path(model_path) / "config.json"
    if config_file.exists():
        return json.loads(config_file.read_text(encoding="utf-8"))
    raise FileNotFoundError(f"Config not found at {model_path}")


def load_weights(model_path: Path, dtype=None) -> Dict[str, jnp.ndarray]:
    """Load all *.safetensors / *.npz under model_path into flat {key: array}."""
    model_path = Path(model_path)
    weight_files = sorted(glob.glob(str(model_path / "*.safetensors")))
    weights: Dict[str, jnp.ndarray] = {}
    if weight_files:
        from safetensors import safe_open

        for wf in weight_files:
            with safe_open(wf, framework="numpy") as f:
                for k in f.keys():
                    arr = f.get_tensor(k)
                    weights[k] = _to_jnp(arr, dtype)
        return weights
    npz_files = sorted(glob.glob(str(model_path / "*.npz")))
    if not npz_files:
        raise FileNotFoundError(
            f"No weight files (safetensors or npz) found in {model_path}"
        )
    for wf in npz_files:
        with np.load(wf) as data:
            for k in data.files:
                weights[k] = _to_jnp(data[k], dtype)
    return weights


def _to_jnp(arr: np.ndarray, dtype=None) -> jnp.ndarray:
    # ml_dtypes handles bfloat16 numpy arrays transparently
    x = jnp.asarray(arr)
    if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(dtype)
    return x


def unflatten(flat: Dict[str, Any], sep: str = ".") -> dict:
    """{'a.b.c': v} -> {'a': {'b': {'c': v}}} (list indices stay string keys)."""
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def flatten(tree: dict, prefix: str = "", sep: str = ".") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key, sep))
        else:
            out[key] = v
    return out


def apply_quantization(
    params: dict,
    config: dict,
    weights: Optional[Dict[str, jnp.ndarray]] = None,
    model_quant_predicate: Optional[Callable] = None,
    model_i8_predicate: Optional[Callable] = None,
) -> dict:
    """Quantize linear weights per config['quantization'] (reference utils.py:209).

    For checkpoints that ship pre-quantized (scales present in weights), the
    sanitize path reconstructs dense weights instead; this function handles
    on-the-fly quantization of dense checkpoints.
    """
    quantization = config.get("quantization") or config.get("quantization_config")
    if quantization is None:
        return params
    from .ops.quant import maybe_quantize_tree

    group_size = quantization.get("group_size", 64)
    bits = quantization.get("bits", 4)

    pre_quantized = weights is not None and any(
        k.endswith(".scales") for k in weights
    )

    def predicate(path, w):
        if pre_quantized:
            # checkpoint ships packed codes; leaves that have scales are
            # unpacked by maybe_quantize_tree, the rest were deliberately
            # left dense by the converter — never re-quantize them
            return False
        if model_quant_predicate is not None and not model_quant_predicate(path, w):
            return False
        if path in quantization:
            q = quantization[path]
            return bool(q) if isinstance(q, bool) else True
        return True

    params = maybe_quantize_tree(params, group_size, bits, predicate)

    # Opt-in W8A8 decode layout: per-channel symmetric int8 codes feeding
    # the MXU's native s8 x s8 -> s32 dot (ops/quant.py:qmatmul_i8).
    # Measured 1.5x faster than both bf16-dense and the VPU-dequant qmatmul
    # at b=1 decode shapes on v5e (tools/bench_qmm_formulations.py), at
    # ~1.1e-2 relative error from the per-channel re-quant + dynamic
    # per-token activation quantization — hence opt-in, not default.
    mxu_int8 = quantization.get("mxu_int8")
    if mxu_int8 is None:
        mxu_int8 = os.environ.get(
            "MLX_AUDIO_TPU_MXU_INT8", "").strip().lower() in ("1", "true",
                                                              "yes")
    if mxu_int8 and bits == 8:
        from .ops.quant import tree_to_i8_layout

        # model_i8_predicate (path -> bool) lets a model keep sensitive
        # layers (e.g. a quantized lm_head) on the exact per-group path
        params = tree_to_i8_layout(params, predicate=model_i8_predicate,
                                   consume=True)
    return params


def is_valid_module_name(name: Optional[str]) -> bool:
    return bool(name) and bool(re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", name))


def _has_model_module(module_path: str) -> bool:
    try:
        return importlib.util.find_spec(module_path) is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def get_model_class(
    model_type: str,
    category: str,
    model_remapping: dict,
    model_name: Optional[List[str]] = None,
):
    """Resolve `mlx_audio_tpu.{category}.models.{arch}` dynamically
    (reference utils.py:259-318)."""
    candidates = [model_type] + (model_name or [])
    tried = []
    for hint in candidates:
        if hint is None:
            continue
        arch = model_remapping.get(hint, hint)
        if not is_valid_module_name(arch):
            continue
        module_path = f"{PACKAGE}.{category}.models.{arch}"
        tried.append(module_path)
        if _has_model_module(module_path):
            return importlib.import_module(module_path), arch
    raise ValueError(
        f"Model type '{model_type}' not supported for category '{category}'. "
        f"Tried: {tried}"
    )


def get_model_name_parts(model_path: Union[str, Path]) -> List[str]:
    """Fuzzy name-part extraction for architecture guessing
    (reference utils.py:807-860)."""
    if isinstance(model_path, str):
        model_name = model_path.lower().split("/")[-1]
    elif isinstance(model_path, Path):
        try:
            index = model_path.parts.index("hub")
            model_name = model_path.parts[index + 1].lower().split("--")[-1]
        except ValueError:
            model_name = model_path.name.lower()
    else:
        raise ValueError(f"Invalid model path type: {type(model_path)}")

    parts: List[str] = []
    seen = set()
    dash_parts = [p for p in model_name.split("-") if p]
    for part in dash_parts:
        if part in seen:
            continue
        parts.append(part)
        seen.add(part)
        if "_" in part:
            for sub in part.split("_"):
                if sub and sub not in seen:
                    parts.append(sub)
                    seen.add(sub)
        norm = re.sub(r"[^a-z0-9]+", "", part)
        if norm and norm not in seen:
            parts.append(norm)
            seen.add(norm)
    # joined n-grams: "qwen3-tts-..." -> "qwen3_tts" etc.
    for start in range(len(dash_parts)):
        for end in range(start + 2, len(dash_parts) + 1):
            joined = "_".join(dash_parts[start:end])
            joined = re.sub(r"[^a-z0-9_]+", "", joined)
            if joined and joined not in seen:
                parts.append(joined)
                seen.add(joined)
    return parts


def base_load_model(
    model_path: Union[str, Path],
    category: str,
    model_remapping: dict,
    dtype=None,
    strict: bool = False,
    tensor_parallel: Optional[int] = None,
    **kwargs,
):
    """The 10-step loader pipeline (reference utils.py:321-416), functional:

    resolve path -> config -> model_type remap -> ModelConfig.from_dict ->
    Model(config) -> sanitize(weights) -> [quantize] -> bind params ->
    device put [optionally TP-sharded] -> post_load_hook.

    tensor_parallel=N shards attention/MLP weights over an N-way "tp" mesh
    axis (parallel/sharding.py rules). Every jitted step the model builds
    then runs sharded — XLA propagates the NamedShardings from the params
    through prefill/decode, inserting the ICI collectives. The reference is
    single-device (SURVEY §2.10); this is the TPU-native scale-out path.
    """
    from . import enable_compilation_cache

    enable_compilation_cache()

    model_name = kwargs.pop("model_name_parts", None)
    model_type = kwargs.pop("model_type", None)
    allow_patterns = kwargs.pop("allow_patterns", None)

    if isinstance(model_path, str):
        if model_name is None:
            model_name = get_model_name_parts(model_path)
        model_path = get_model_path(
            model_path,
            revision=kwargs.get("revision"),
            force_download=kwargs.get("force_download", False),
            allow_patterns=allow_patterns,
        )
    elif isinstance(model_path, Path):
        if model_name is None:
            model_name = get_model_name_parts(model_path)
    else:
        raise ValueError(f"Invalid model path type: {type(model_path)}")

    config = load_config(model_path)
    config["model_path"] = str(model_path)

    if model_type is None:
        model_type = config.get("model_type") or config.get("architecture")
    if model_type is None and model_name:
        model_type = model_name[0].lower()
    # TADA models: config says "llama" but carry acoustic_dim (utils.py:377)
    if model_type == "llama" and "acoustic_dim" in config:
        model_type = "tada"

    module, model_type = get_model_class(
        model_type=model_type,
        category=category,
        model_remapping=model_remapping,
        model_name=model_name,
    )

    model_config = (
        module.ModelConfig.from_dict(config)
        if hasattr(module, "ModelConfig")
        else config
    )
    model = module.Model(model_config)

    weights = load_weights(model_path, dtype=dtype)
    # Families whose published checkpoints ship extra weight files in
    # subfolders declare WEIGHT_SUBDIRS = {"subdir": "key_prefix."} on the
    # Model class; the subfolder's tensors are merged under the prefix so
    # one sanitize() sees the whole checkpoint (e.g. qwen3_tts ships its
    # codec in speech_tokenizer/ — reference qwen3_tts.py:2850 loads it in
    # post_load_hook instead).
    for subdir, prefix in getattr(module.Model, "WEIGHT_SUBDIRS",
                                  {}).items():
        sub = Path(model_path) / subdir
        if sub.is_dir():
            try:
                extra = load_weights(sub, dtype=dtype)
            except FileNotFoundError:
                continue
            weights.update({prefix + k: v for k, v in extra.items()})
    pre_converted = config.get("converted_by") == "mlx_audio_tpu.convert"
    if hasattr(model, "sanitize") and not pre_converted:
        weights = model.sanitize(weights)

    params = unflatten(weights)
    if not pre_converted:
        quant_pred = getattr(model, "model_quant_predicate", None)
        i8_pred = getattr(model, "model_i8_predicate", None)
        params = apply_quantization(params, config, weights, quant_pred,
                                    model_i8_predicate=i8_pred)

    if tensor_parallel and tensor_parallel > 1:
        import jax

        from .parallel import make_mesh, shard_params

        n = len(jax.devices())
        if n % tensor_parallel:
            raise ValueError(
                f"tensor_parallel={tensor_parallel} does not divide the "
                f"{n} available devices")
        mesh = make_mesh((n // tensor_parallel, tensor_parallel),
                         ("dp", "tp"))
        params = shard_params(params, mesh)
        model._mesh = mesh

    model.bind(params, strict=strict)

    if hasattr(type(model), "post_load_hook"):
        model = type(model).post_load_hook(model, model_path)
    return model


# ---------------------------------------------------------------------------
# Category auto-detection (reference utils.py:754-898)
# ---------------------------------------------------------------------------

_CATEGORIES = ("tts", "stt", "sts", "lid", "vad")


def _category_remapping(category: str) -> dict:
    mod = importlib.import_module(f"{PACKAGE}.{category}.utils")
    return getattr(mod, "MODEL_REMAPPING", {})


def get_model_category(model_type: Optional[str], model_name: List[str]) -> Optional[str]:
    candidates = ([model_type] if model_type else []) + (model_name or [])
    cats = [(c, _category_remapping(c)) for c in _CATEGORIES]

    # explicit category token in the name wins
    for category, remap in cats:
        if category not in candidates:
            continue
        for hint in candidates:
            arch = remap.get(hint, hint)
            if is_valid_module_name(arch) and _has_model_module(
                f"{PACKAGE}.{category}.models.{arch}"
            ):
                return category
    # explicit remapping matches
    for category, remap in cats:
        for hint in candidates:
            if hint in remap:
                arch = remap[hint]
                if is_valid_module_name(arch) and _has_model_module(
                    f"{PACKAGE}.{category}.models.{arch}"
                ):
                    return category
    # direct module-name matches
    for category, remap in cats:
        for hint in candidates:
            if hint not in remap and is_valid_module_name(hint) and _has_model_module(
                f"{PACKAGE}.{category}.models.{hint}"
            ):
                return category
    return None


def load_model(model_path: Union[str, Path], **kwargs):
    """Auto-detect the task category and dispatch to its loader
    (reference utils.py:861-898)."""
    name_parts = get_model_name_parts(model_path)
    model_type = kwargs.pop("model_type", None)
    if model_type is None:
        try:
            cfg_path = (
                Path(model_path) if Path(str(model_path)).expanduser().exists()
                else get_model_path(str(model_path))
            )
            config = load_config(cfg_path)
            model_type = config.get("model_type") or config.get("architecture")
        except (FileNotFoundError, Exception):
            model_type = None

    category = kwargs.pop("category", None) or get_model_category(model_type, name_parts)
    if category is None:
        raise ValueError(
            f"Could not determine model category for '{model_path}' "
            f"(model_type={model_type})"
        )
    task_utils = importlib.import_module(f"{PACKAGE}.{category}.utils")
    return task_utils.load_model(
        model_path, model_type=model_type, model_name_parts=name_parts, **kwargs
    )


# ---------------------------------------------------------------------------
# Audio helpers (reference utils.py:477-704)
# ---------------------------------------------------------------------------


def audio_volume_normalize(audio: np.ndarray, coeff: float = 0.2) -> np.ndarray:
    """Normalize waveform volume using the high-amplitude tail statistic
    (reference utils.py:477-538 behavior)."""
    audio = np.asarray(audio, dtype=np.float32)
    temp = np.sort(np.abs(audio))
    if temp[-1] < 0.1:
        scaling = max(temp[-1], 1e-3)
        audio = audio / scaling * 0.1
        temp = temp / scaling * 0.1
    temp = temp[temp > 0.01]
    if temp.shape[0] <= 10:
        return audio
    volume = np.mean(temp[int(0.9 * temp.shape[0]) : int(0.99 * temp.shape[0])])
    audio = audio * np.clip(coeff / max(volume, 1e-8), 0.1, 10)
    max_value = np.max(np.abs(audio[max(0, len(audio) - 16000):]))
    if max_value > 1:
        audio = audio / max_value
    return audio


def random_select_audio_segment(audio: np.ndarray, length: int) -> np.ndarray:
    """Random fixed-length segment (zero-padded if short) — used by voice
    cloning prompt croppers (reference utils.py:519-538)."""
    import random

    audio = np.asarray(audio)
    if audio.shape[0] < length:
        audio = np.pad(audio, (0, int(length - audio.shape[0])))
    start = random.randint(0, audio.shape[0] - length)
    return audio[start:start + int(length)]


def resample_audio(
    audio: np.ndarray, orig_sr: int, target_sr: int
) -> np.ndarray:
    """High-quality polyphase resampling (kaiser window), reference utils.py:541."""
    if orig_sr == target_sr:
        return np.asarray(audio)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    return resample_poly(np.asarray(audio, dtype=np.float64), up, down).astype(
        np.float32
    )


def trim_silence(
    audio: np.ndarray,
    sample_rate: int,
    threshold_db: float = -40.0,
    min_silence_sec: float = 0.1,
) -> np.ndarray:
    """Trim leading/trailing silence below threshold (reference utils.py:602)."""
    audio = np.asarray(audio)
    frame = max(1, int(sample_rate * 0.01))
    n_frames = len(audio) // frame
    if n_frames == 0:
        return audio
    rms = np.sqrt(
        np.mean(audio[: n_frames * frame].reshape(n_frames, frame) ** 2, axis=1)
    )
    db = 20 * np.log10(np.maximum(rms, 1e-10))
    loud = np.where(db > threshold_db)[0]
    if len(loud) == 0:
        return audio
    keep = int(min_silence_sec * sample_rate)
    start = max(0, loud[0] * frame - keep)
    end = min(len(audio), (loud[-1] + 1) * frame + keep)
    return audio[start:end]


def load_audio(
    path: Union[str, Path],
    sample_rate: Optional[int] = None,
    volume_normalize: bool = False,
    segment_duration: Optional[float] = None,
) -> jnp.ndarray:
    """Read + mono-mix + resample an audio file to a float32 jnp array
    (reference utils.py:641-704)."""
    from . import audio_io

    audio, sr = audio_io.read(path, dtype="float32")
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if sample_rate is not None and sr != sample_rate:
        audio = resample_audio(audio, sr, sample_rate)
        sr = sample_rate
    if segment_duration is not None:
        seg_len = int(sr * segment_duration)
        audio = audio[:seg_len]
    if volume_normalize:
        audio = audio_volume_normalize(audio)
    return jnp.asarray(audio, dtype=jnp.float32)


@contextlib.contextmanager
def maybe_profile():
    """`jax.profiler` trace around a generation when MLX_AUDIO_TPU_PROFILE
    points at a directory (SURVEY §5.1 — the TPU-native replacement for the
    reference's per-request metric prints is the result-schema telemetry
    plus this opt-in XLA trace; view with tensorboard or xprof)."""
    trace_dir = os.environ.get("MLX_AUDIO_TPU_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
