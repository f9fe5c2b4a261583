"""Import hygiene (reference tests/test_lazy_imports.py, SURVEY §4.6):
core modules must not drag in task packages or model families."""

import subprocess
import sys


def _loaded_after(stmt: str) -> set:
    code = (
        "import sys\n"
        f"{stmt}\n"
        "mods = [m for m in sys.modules if m.startswith('mlx_audio_tpu')]\n"
        "print('\\n'.join(mods))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    return set(out.stdout.split())


def test_dsp_pulls_no_task_packages():
    mods = _loaded_after("import mlx_audio_tpu.dsp")
    bad = [m for m in mods if any(
        f".{t}." in m or m.endswith(f".{t}")
        for t in ("tts", "stt", "sts", "vad", "lid", "codec", "server"))]
    assert not bad, bad


def test_audio_io_pulls_no_task_packages():
    mods = _loaded_after("import mlx_audio_tpu.audio_io")
    bad = [m for m in mods if any(
        f".{t}." in m or m.endswith(f".{t}")
        for t in ("tts", "stt", "sts", "vad", "lid", "codec"))]
    assert not bad, bad


def test_package_import_pulls_no_model_families():
    mods = _loaded_after("import mlx_audio_tpu")
    bad = [m for m in mods if ".models." in m]
    assert not bad, bad
