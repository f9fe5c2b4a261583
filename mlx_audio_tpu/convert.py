"""Domain-aware model conversion / quantization CLI.

Parity: /root/reference/mlx_audio/convert.py (Domain enum :26, dynamic
model-type discovery :124-210, domain detection :253-335, convert() :544,
main() :745; quant recipes/modes :22-23). TPU notes: quantization targets
the affine int4/int8 group scheme in ops/quant.py (the TPU path — mxfp4/
nvfp4/mxfp8 are Apple-GPU formats with no TPU kernel; requesting them maps
to the nearest affine config with a warning). Output checkpoints are
safetensors + config.json compatible with this package's loaders.
"""

from __future__ import annotations

import argparse
import importlib
import json
import pkgutil
import shutil
from dataclasses import dataclass
from enum import Enum
from pathlib import Path
from typing import Optional

import numpy as np

MODEL_CONVERSION_DTYPES = ["float16", "bfloat16", "float32"]
QUANT_RECIPES = ["mixed_2_6", "mixed_3_4", "mixed_3_6", "mixed_4_6"]
QUANT_MODES = ["affine", "mxfp4", "nvfp4", "mxfp8"]


class Domain(str, Enum):
    TTS = "tts"
    STT = "stt"
    STS = "sts"
    LID = "lid"
    VAD = "vad"
    CODEC = "codec"


def discover_model_types(domain: str) -> set:
    """Enumerate model family packages under mlx_audio_tpu.{domain}.models."""
    try:
        pkg = importlib.import_module(f"mlx_audio_tpu.{domain}.models")
    except ImportError:
        return set()
    return {m.name for m in pkgutil.iter_modules(pkg.__path__) if m.ispkg}


def detect_model_domain(config: dict, model_path: Path) -> Domain:
    """Guess the domain from model_type / config keys / path name
    (reference convert.py:306-335)."""
    model_type = str(config.get("model_type", "")).lower()
    for domain in Domain:
        if model_type in discover_model_types(domain.value):
            return domain
    keys = set(config)
    if {"talker_config", "istftnet", "tts_model_type"} & keys:
        return Domain.TTS
    if {"encoder_layers", "n_audio_ctx", "max_source_positions"} & keys:
        return Domain.STT
    if {"branch_16k", "threshold"} & keys:
        return Domain.VAD
    if {"num_classes", "id2label"} & keys:
        return Domain.LID
    name = model_path.name.lower()
    for domain in Domain:
        if domain.value in name:
            return domain
    for domain in Domain:
        for mt in discover_model_types(domain.value):
            if mt in name.replace("-", "_"):
                return domain
    raise ValueError(
        f"Could not detect domain for {model_path} "
        f"(model_type={model_type!r}); pass --domain explicitly.")


def convert(
    hf_path: str,
    mlx_path: str = "mlx_model",
    dtype: str = "bfloat16",
    quantize: bool = False,
    q_group_size: Optional[int] = None,
    q_bits: int = 4,
    q_mode: str = "affine",
    quant_predicate: Optional[str] = None,
    domain: Optional[str] = None,
    upload_repo: Optional[str] = None,
    dequantize: bool = False,
    revision: Optional[str] = None,
) -> Path:
    """Convert a checkpoint: load through the domain loader (sanitize +
    layout conversion), optionally quantize (affine int-N, microscaling
    mxfp4/nvfp4/mxfp8, or a mixed_L_H recipe), and save safetensors +
    config.json runnable by this package (reference convert.py:544-744)."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from .utils import flatten, get_model_path, load_config

    if quantize and dequantize:
        raise ValueError("--quantize and --dequantize are mutually exclusive")
    model_path = get_model_path(hf_path, revision=revision)
    config = load_config(model_path)
    dom = Domain(domain) if domain else detect_model_domain(config, model_path)

    task_utils = importlib.import_module(f"mlx_audio_tpu.{dom.value}.utils")
    target_dtype = {"float16": jnp.float16, "bfloat16": jnp.bfloat16,
                    "float32": jnp.float32}[dtype]
    model = task_utils.load_model(model_path, dtype=jnp.float32)

    params = model.params
    if quantize:
        from .ops.quant import (FP_MODE_DEFAULTS, maybe_quantize_tree,
                                mixed_quant_predicate)

        gs = q_group_size or FP_MODE_DEFAULTS.get(q_mode, 64)
        predicate = None
        if quant_predicate:
            predicate = mixed_quant_predicate(quant_predicate)
        model_pred = getattr(model, "model_quant_predicate", None)
        if model_pred is not None:
            inner = predicate

            def predicate(p, w, _inner=inner):  # noqa: E306
                if not model_pred(p, w):
                    return False
                return _inner(p, w) if _inner is not None else True

        params = maybe_quantize_tree(params, gs, q_bits, predicate,
                                     mode=q_mode)
        config["quantization"] = {
            "group_size": gs, "bits": q_bits, "mode": q_mode,
            **({"recipe": quant_predicate} if quant_predicate else {})}
    elif dequantize:
        from .ops.quant import dequantize_tree

        params = dequantize_tree(params)
        config.pop("quantization", None)
    # cast remaining float leaves
    params = jax.tree.map(
        lambda x: x.astype(target_dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, params)

    out = Path(mlx_path)
    out.mkdir(parents=True, exist_ok=True)
    flat = {k: np.ascontiguousarray(np.asarray(v))
            for k, v in flatten(params).items()
            if hasattr(v, "dtype")}
    save_file(flat, str(out / "model.safetensors"),
              metadata={"format": "mlx_audio_tpu", "domain": dom.value})
    config["converted_by"] = "mlx_audio_tpu.convert"
    config.pop("model_path", None)
    (out / "config.json").write_text(json.dumps(config, indent=2))
    # carry along aux assets (tokenizer/voices)
    for pattern in ("tokenizer*", "*.tiktoken", "vocab*", "voices*",
                    "merges.txt"):
        for f in Path(model_path).glob(pattern):
            dest = out / f.name
            if f.is_dir():
                shutil.copytree(f, dest, dirs_exist_ok=True)
            elif not dest.exists():
                shutil.copy2(f, dest)
    print(f"✅ Converted {hf_path} [{dom.value}] -> {out}")

    if upload_repo:
        _upload_to_hub(out, upload_repo)
    return out


def _upload_to_hub(path: Path, upload_repo: str) -> None:
    from huggingface_hub import HfApi

    api = HfApi()
    api.create_repo(repo_id=upload_repo, exist_ok=True)
    api.upload_folder(folder_path=str(path), repo_id=upload_repo,
                      repo_type="model")
    print(f"✅ Uploaded to https://huggingface.co/{upload_repo}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert audio models to mlx_audio_tpu format")
    parser.add_argument("--hf-path", "--hf_path", "--model", dest="hf_path",
                        required=True)
    parser.add_argument("--mlx-path", "--mlx_path", "--output",
                        dest="mlx_path", default="mlx_model")
    parser.add_argument("--dtype", default="bfloat16",
                        choices=MODEL_CONVERSION_DTYPES)
    parser.add_argument("-q", "--quantize", action="store_true")
    parser.add_argument("--q-group-size", type=int, default=None)
    parser.add_argument("--q-bits", type=int, default=4)
    parser.add_argument("--q-mode", default="affine", choices=QUANT_MODES)
    parser.add_argument("--quant-predicate", default=None,
                        choices=QUANT_RECIPES,
                        help="Mixed-bit quantization recipe.")
    parser.add_argument("--domain", "--model-domain", "--model_domain",
                        dest="domain", default=None,
                        choices=[d.value for d in Domain])
    parser.add_argument("--upload-repo", default=None)
    parser.add_argument("-d", "--dequantize", action="store_true",
                        help="Dequantize a quantized model")
    parser.add_argument("--revision", type=str, default=None,
                        help="Model revision to download")
    args = parser.parse_args(argv)
    convert(
        hf_path=args.hf_path, mlx_path=args.mlx_path, dtype=args.dtype,
        quantize=args.quantize, q_group_size=args.q_group_size,
        q_bits=args.q_bits, q_mode=args.q_mode,
        quant_predicate=args.quant_predicate, domain=args.domain,
        upload_repo=args.upload_repo, dequantize=args.dequantize,
        revision=args.revision)


if __name__ == "__main__":
    main()
