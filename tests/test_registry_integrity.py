"""Every MODEL_REMAPPING entry must resolve to a loadable module exposing
Model (+ ModelConfig), and every model package must be registered.

Guards against the "registered but unloadable" trap (round-1 spark:
registry entry without a Model class made load_model crash with
ImportError instead of a clear error)."""

import importlib
import pkgutil
from pathlib import Path

import pytest

import mlx_audio_tpu

CATEGORIES = ("tts", "stt", "sts", "vad", "lid")

# shared backbones/shims that are intentionally not directly loadable
# top-level families (they are wired through other families' configs)
BACKBONE_ONLY = {
    ("tts", "llama"), ("tts", "qwen3"), ("tts", "dense"),
    ("stt", "nemo"),      # alignment library, not a checkpointed model
    ("stt", "qwen3_lm"),  # shared LM decode stepper module
}


def _remapping(cat):
    return importlib.import_module(
        f"mlx_audio_tpu.{cat}.utils").MODEL_REMAPPING


@pytest.mark.parametrize("cat", CATEGORIES)
def test_registry_entries_loadable(cat):
    remap = _remapping(cat)
    for alias, arch in remap.items():
        mod = importlib.import_module(f"mlx_audio_tpu.{cat}.models.{arch}")
        assert hasattr(mod, "Model"), f"{cat}/{arch} (alias {alias}): " \
            "registered but exposes no Model class"
        assert hasattr(mod, "ModelConfig") or hasattr(mod.Model, "__init__")


@pytest.mark.parametrize("cat", CATEGORIES)
def test_model_packages_registered_or_resolvable(cat):
    """Every package under {cat}/models must be reachable by load_model:
    either via a registry alias or directly by its module name."""
    from mlx_audio_tpu.utils import get_model_class

    pkg = importlib.import_module(f"mlx_audio_tpu.{cat}.models")
    remap = _remapping(cat)
    for info in pkgutil.iter_modules(pkg.__path__):
        name = info.name
        if name in ("base",):
            continue
        if (cat, name) in BACKBONE_ONLY:
            continue
        mod, arch = get_model_class(name, cat, remap)
        assert hasattr(mod, "Model"), f"{cat}/{name}: resolves to {arch} " \
            "but that module has no Model"


@pytest.mark.parametrize("cat", CATEGORIES)
def test_no_namespace_packages(cat):
    """A models/ subdir without __init__.py resolves via find_spec but
    fails at import — reject them early (advisor finding r1)."""
    pkg_dir = Path(mlx_audio_tpu.__file__).parent / cat / "models"
    for sub in pkg_dir.iterdir():
        if sub.is_dir() and not sub.name.startswith("__"):
            assert (sub / "__init__.py").exists(), \
                f"{cat}/models/{sub.name} is a namespace package " \
                "(missing __init__.py)"
