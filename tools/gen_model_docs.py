"""Generate per-family model doc pages + the mkdocs nav.

The reference ships 22 docs pages plus ~45 in-tree model READMEs; this
generator gives every family in this repo a docs page built from the
module's own parity docstring (which cites reference file:line), the
Model.generate/encode signature (so supported kwargs are documented), and a
task-specific usage template. Hand-written pages (kokoro, qwen3-tts, ...)
are preserved and linked as-is.

Run: python tools/gen_model_docs.py   (idempotent; rewrites docs/models/ and
the Models section of mkdocs.yml)
"""

from __future__ import annotations

import ast
import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "mlx_audio_tpu"
DOCS = REPO / "docs" / "models"

# Bench lanes (BENCH_DETAILS.json keys) that belong to a model family's
# doc page. Measured tables regenerate from the latest bench run, so
# flagship pages carry real numbers like the reference's
# (ref docs/models/tts/higgs_audio.md:156-160) without hand-maintenance.
BENCH_LANES = {
    ("tts", "kokoro"): ["kokoro_82m"],
    ("tts", "qwen3_tts"): ["qwen3_tts_1b7", "qwen3_tts_1b7_q8",
                           "qwen3_tts_batched", "cold_start"],
    ("tts", "higgs_audio"): ["higgs_v2_3b_bf16", "higgs_v2_3b_q8"],
    ("tts", "higgs_audio_v3"): ["higgs_v2_3b_bf16", "higgs_v2_3b_q8"],
    ("tts", "kugelaudio"): ["kugelaudio_7b"],
    ("stt", "cohere_asr"): ["cohere_asr_10min"],
    ("stt", "whisper"): ["whisper_turbo_10min"],
    ("stt", "voxtral_realtime"): ["realtime_stt"],
}

BENCH_BEGIN = "<!-- bench:begin (generated from BENCH_DETAILS.json) -->"
BENCH_END = "<!-- bench:end -->"


def _fmt_cell(v) -> str:
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


def _lane_table(name: str, lane: dict) -> list[str]:
    """One lane -> a two-column metric table (scalars only; from nested
    roofline dicts keep the three judgment-relevant fields)."""
    rows = []
    for k, v in lane.items():
        if isinstance(v, dict):
            if k == "roofline":
                for rk in ("sol_xrt", "pct_of_roofline", "achieved_gbs"):
                    if rk in v:
                        rows.append((f"roofline.{rk}", _fmt_cell(v[rk])))
            elif k == "prewarm":
                rows.append(("prewarm_ok", _fmt_cell(v.get("ok"))))
            elif name == "qwen3_tts_batched" and k.startswith("b"):
                for rk in ("agg_xrt", "ttfa_p50_s"):
                    if rk in v:
                        rows.append((f"{k}.{rk}", _fmt_cell(v[rk])))
        elif isinstance(v, (int, float, str, bool)):
            if k in ("flops_per_synth",):
                continue
            rows.append((k, _fmt_cell(v)))
    if not rows:
        return []
    out = [f"**`{name}`**", "", "| metric | value |", "|---|---|"]
    out += [f"| {k} | {v} |" for k, v in rows]
    out.append("")
    return out


def bench_section(task: str, fam: str) -> str:
    """Measured-performance markdown for a family ('' if no data)."""
    lanes = BENCH_LANES.get((task, fam))
    if not lanes:
        return ""
    path = REPO / "BENCH_DETAILS.json"
    if not path.exists():
        return ""
    try:
        details = json.loads(path.read_text())
    except (OSError, ValueError):
        return ""
    blocks = []
    for lane in lanes:
        data = details.get(lane)
        if isinstance(data, dict) and not any(
                k in data for k in ("error", "timeout_s", "skipped")):
            blocks += _lane_table(lane, data)
    if not blocks:
        return ""
    head = ["## Measured performance (TPU v5e, one chip)", "",
            "Randomly-initialized weights at real checkpoint dimensions "
            "(FLOPs and HBM traffic match the real model); regenerated "
            "from the latest `bench.py` run — see `BENCH_DETAILS.json` "
            "and the [TPU performance guide](../../guides/"
            "tpu-performance.md).", ""]
    return "\n".join(head + blocks)


def inject_bench(md_path: Path, section: str) -> bool:
    """Idempotently place `section` between bench markers in a hand-written
    page (replace if present, append if absent). Returns True on change."""
    text = md_path.read_text()
    block = f"{BENCH_BEGIN}\n\n{section.strip()}\n\n{BENCH_END}"
    if BENCH_BEGIN in text and BENCH_END in text:
        head, _, rest = text.partition(BENCH_BEGIN)
        _, _, tail = rest.partition(BENCH_END)
        new = head + block + tail
    else:
        new = text.rstrip() + "\n\n" + block + "\n"
    if new != text:
        md_path.write_text(new)
        return True
    return False

TASKS = ("tts", "stt", "codec", "vad", "sts", "lid")

# Hand-written pages to keep (family -> existing doc path relative to docs/)
HAND_WRITTEN = {
    ("tts", "kokoro"): "models/tts/kokoro.md",
    ("tts", "qwen3_tts"): "models/tts/qwen3-tts.md",
    ("tts", "higgs_audio"): "models/tts/higgs_audio.md",
    ("tts", "higgs_audio_v3"): "models/tts/higgs_audio.md",
    ("tts", "kugelaudio"): "models/tts/kugelaudio.md",
    ("tts", "vibevoice"): "models/tts/vibevoice.md",
    ("tts", "dia"): "models/tts/dia.md",
    ("tts", "sesame"): "models/tts/sesame.md",
    ("tts", "chatterbox"): "models/tts/chatterbox.md",
    ("tts", "bark"): "models/tts/bark.md",
    ("stt", "whisper"): "models/stt/whisper.md",
    ("stt", "cohere_asr"): "models/stt/cohere-asr.md",
    ("stt", "voxtral_realtime"): "models/stt/voxtral-realtime.md",
    ("stt", "parakeet"): "models/stt/parakeet.md",
    ("codec", "mimi"): "models/codec/mimi.md",
    ("codec", "snac"): "models/codec/snac.md",
    ("vad", "silero_vad"): "models/vad/silero_vad.md",
    ("sts", "sam_audio"): "models/sts/sam_audio.md",
}

USAGE = {
    "tts": '''```python
from mlx_audio_tpu.tts.utils import load_model

model = load_model("{repo}")
for result in model.generate(text="Hello from the TPU!"):
    audio = result.audio            # float32 waveform
    sr = result.sample_rate

# or the CLI:
#   python -m mlx_audio_tpu.tts.generate --model {repo} \\
#       --text "Hello from the TPU!" --output_path out
```''',
    "stt": '''```python
from mlx_audio_tpu.stt.utils import load_model

model = load_model("{repo}")
out = model.generate("speech.wav")
print(out.text)

# or the CLI:
#   python -m mlx_audio_tpu.stt.generate --model {repo} --audio speech.wav
```''',
    "codec": '''```python
from mlx_audio_tpu.utils import load_model

codec = load_model("{repo}")
codes = codec.encode(audio)         # waveform -> discrete codes
recon = codec.decode(codes)         # codes -> waveform
```''',
    "vad": '''```python
from mlx_audio_tpu.utils import load_model

vad = load_model("{repo}")
result = vad.generate(audio)        # speech segments / probabilities
```''',
    "sts": '''```python
from mlx_audio_tpu.utils import load_model

model = load_model("{repo}")
enhanced = model.generate(audio)    # speech-to-speech processing
```''',
    "lid": '''```python
from mlx_audio_tpu.utils import load_model

model = load_model("{repo}")
result = model.generate(audio)      # language id / probabilities
```''',
}

TASK_TITLES = {"tts": "TTS", "stt": "STT", "codec": "Codecs", "vad": "VAD",
               "sts": "STS / enhancement", "lid": "Language ID"}


def find_main(fam_dir: Path):
    """File that defines `class Model` (fallback: largest .py / __init__)."""
    best = None
    for f in sorted(fam_dir.glob("*.py")):
        try:
            tree = ast.parse(f.read_text())
        except SyntaxError:
            continue
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef) and node.name == "Model":
                return f, tree
        if f.name != "__init__.py" and (
                best is None or f.stat().st_size > best[0].stat().st_size):
            best = (f, tree)
    if best:
        return best
    init = fam_dir / "__init__.py"
    return init, ast.parse(init.read_text())


def model_entrypoints(tree) -> list[str]:
    """Signatures of the user-facing Model methods."""
    out = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.ClassDef) and node.name == "Model"):
            continue
        for item in node.body:
            if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)) \
                    and item.name in (
                        "generate", "batch_generate", "stream_generate",
                        "encode", "decode", "separate", "transcribe",
                        "stream_transcribe", "decode_stream"):
                args = []
                a = item.args
                pos = a.posonlyargs + a.args
                defaults = [None] * (len(pos) - len(a.defaults)) + \
                    list(a.defaults)
                for arg, d in zip(pos, defaults):
                    if arg.arg == "self":
                        continue
                    if d is None:
                        args.append(arg.arg)
                    else:
                        args.append(f"{arg.arg}={ast.unparse(d)}")
                if a.vararg:
                    args.append("*" + a.vararg.arg)
                elif a.kwonlyargs:
                    args.append("*")
                for arg, d in zip(a.kwonlyargs, a.kw_defaults):
                    args.append(arg.arg if d is None
                                else f"{arg.arg}={ast.unparse(d)}")
                if a.kwarg:
                    args.append("**" + a.kwarg.arg)
                out.append(f"{item.name}({', '.join(args)})")
    return out


def sanitize_doc(tree) -> str | None:
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "sanitize":
            return ast.get_docstring(node)
    return None


# Known public checkpoint ids per family (harvested from the reference's
# docs/READMEs and the public hubs; any repo whose config maps to the family
# works — these are the canonical starting points).
REPOS = {
    ("tts", "bailingmm"): "mlx-community/Ming-omni-tts-16.8B-A3B-bf16",
    ("tts", "bark"): "suno/bark-small",
    ("tts", "chatterbox"): "mlx-community/Chatterbox-TTS-fp16",
    ("tts", "chatterbox_turbo"): "ResembleAI/chatterbox-turbo",
    ("tts", "confucius4"): "netease-youdao/Confucius4-TTS",
    ("tts", "dense"): "mlx-community/Ming-omni-tts-0.5B-bf16",
    ("tts", "dia"): "mlx-community/Dia-1.6B-fp16",
    ("tts", "dramabox"): "mlx-community/ResembleAI-Dramabox",
    ("tts", "echo_tts"): "mlx-community/echo-tts-base",
    ("tts", "fish_qwen3_omni"): "mlx-community/fish-audio-s2-pro",
    ("tts", "higgs_audio_v3"): "bosonai/higgs-audio-v3-tts-4b",
    ("tts", "indextts"): "mlx-community/IndexTTS",
    ("tts", "irodori_tts"): "mlx-community/Irodori-TTS-500M-v3-fp16",
    ("tts", "kitten_tts"): "KittenML/kitten-tts-nano-0.2",
    ("tts", "kugelaudio"): "kugelaudio/kugelaudio-0-open",
    ("tts", "llama"): "mlx-community/orpheus-3b-0.1-ft-bf16",
    ("tts", "longcat_audiodit"): "mlx-community/LongCat-AudioDiT-1B-bf16",
    ("tts", "melotts"): "myshell-ai/MeloTTS-English",
    ("tts", "moss_tts"): "OpenMOSS-Team/MOSS-TTS-v1.5",
    ("tts", "moss_tts_delay"): "OpenMOSS-Team/MOSS-TTSD-v0.5",
    ("tts", "moss_tts_local"):
        "OpenMOSS-Team/MOSS-TTS-Local-Transformer-v1.5",
    ("tts", "moss_tts_nano"): "mlx-community/MOSS-TTS-Nano-100M",
    ("tts", "omnivoice"): "mlx-community/OmniVoice-bf16",
    ("tts", "outetts"): "OuteAI/Llama-OuteTTS-1.0-1B",
    ("tts", "pocket_tts"): "mlx-community/pocket-tts",
    ("tts", "qwen3"): "mlx-community/svara-tts-v1-4bit",
    ("tts", "sesame"): "mlx-community/csm-1b",
    ("tts", "soprano"): "ekwek/Soprano-80M",
    ("tts", "spark"): "SparkAudio/Spark-TTS-0.5B",
    ("tts", "tada"): "HumeAI/mlx-tada-1b",
    ("tts", "vibevoice"): "microsoft/VibeVoice-1.5B",
    ("tts", "voxcpm"): "openbmb/VoxCPM-0.5B",
    ("tts", "voxcpm2"): "mlx-community/VoxCPM2-8bit",
    ("tts", "voxtral_tts"): "mlx-community/Voxtral-4B-TTS-2603-mlx-bf16",
    ("tts", "zonos2"): "mlx-community/Zyphra-ZONOS2",
    ("stt", "canary"): "nvidia/canary-1b-flash",
    ("stt", "fireredasr2"): "FireRedTeam/FireRedASR2-AED",
    ("stt", "fun_asr_nano"): "mlx-community/Fun-ASR-Nano-2512",
    ("stt", "glmasr"): "THUDM/glm-asr",
    ("stt", "granite_speech"): "ibm-granite/granite-speech-3.3-8b",
    ("stt", "granite_speech_nar"): "ibm-granite/granite-speech-3.3-2b",
    ("stt", "higgs_audio_3"): "bosonai/higgs-audio-v3-tts-4b",
    ("stt", "lasr_ctc"): "espnet/lasr-ctc",
    ("stt", "mega_asr"): "mlx-community/Qwen3-ASR-0.6B-8bit",
    ("stt", "mms"): "facebook/mms-1b-all",
    ("stt", "moonshine"): "UsefulSensors/moonshine-base",
    ("stt", "moss_music"): "mlx-community/MOSS-Music-8B-Thinking-MLX",
    ("stt", "moss_transcribe_diarize"):
        "OpenMOSS-Team/MOSS-Transcribe-Diarize",
    ("stt", "nemotron_asr"): "nvidia/nemotron-3.5-asr-streaming-0.6b",
    ("stt", "parakeet"): "mlx-community/parakeet-tdt-0.6b-v3",
    ("stt", "qwen2_audio"): "mlx-community/Qwen2-Audio-7B-Instruct-4bit",
    ("stt", "qwen3_asr"): "mlx-community/Qwen3-ASR-0.6B-8bit",
    ("stt", "qwen3_forced_aligner"): "Qwen/Qwen3-ForcedAligner-0.6B",
    ("stt", "sensevoice"): "FunAudioLLM/SenseVoiceSmall",
    ("stt", "vibevoice_asr"): "microsoft/VibeVoice-ASR",
    ("stt", "voxtral"): "mistralai/Voxtral-Mini-3B-2507",
    ("stt", "wav2vec"): "facebook/wav2vec2-large-960h-lv60-self",
    ("codec", "bigvgan"): "nvidia/bigvgan_v2_22khz_80band_256x",
    ("codec", "dacvae"): "Aratako/Semantic-DACVAE-Japanese-32dim",
    ("codec", "descript"): "mlx-community/descript-audio-codec-44khz",
    ("codec", "ecapa_tdnn"): "speechbrain/spkrec-ecapa-voxceleb",
    ("codec", "encodec"): "mlx-community/encodec-24khz-float32",
    ("codec", "fish_s1_dac"): "jordand/fish-s1-dac-min",
    ("codec", "higgs_audio"): "mlx-community/higgs-audio-v2-tokenizer",
    ("codec", "mimi"): "kyutai/mimi",
    ("codec", "moss_audio_tokenizer"):
        "OpenMOSS-Team/MOSS-Audio-Tokenizer-v2",
    ("codec", "s3"): "mlx-community/S3TokenizerV2",
    ("codec", "snac"): "mlx-community/snac_24khz",
    ("codec", "stepaudio2"): "mlx-community/Step-Audio-2-token2wav",
    ("codec", "vocos"): "charactr/vocos-mel-24khz",
    ("vad", "fsmn"): "mlx-community/fsmn-vad",
    ("vad", "silero_vad"): "mlx-community/silero-vad",
    ("vad", "smart_turn"): "mlx-community/smart-turn-v3",
    ("vad", "sortformer"): "nvidia/diar_streaming_sortformer_4spk-v2.1",
    ("sts", "deepfilternet"): "mlx-community/DeepFilterNet-mlx",
    ("sts", "lfm_audio"): "mlx-community/LFM2.5-Audio-1.5B-4bit",
    ("sts", "mel_roformer"): "mlx-community/mel-band-roformer",
    ("sts", "moshi"): "kyutai/moshiko-mlx-bf16",
    ("sts", "mossformer2_se"): "starkdmi/MossFormer2_SE_48K_MLX",
    ("sts", "sam_audio"): "facebook/sam-audio-large",
    ("lid", "ecapa_tdnn"): "speechbrain/lang-id-voxlingua107-ecapa",
    ("lid", "wav2vec2"): "facebook/mms-lid-256",
}


def default_repo(task: str, fam: str) -> str:
    """Checkpoint id hint: the converter accepts any HF repo or local dir
    whose config maps to this family."""
    return REPOS.get((task, fam), f"<hf-repo-or-local-dir for {fam}>")


def gen_page(task: str, fam: str) -> str:
    fam_dir = PKG / task / "models" / fam
    main, tree = find_main(fam_dir)
    doc = ast.get_docstring(tree) or f"{fam} ({task})."
    first, _, rest = doc.partition("\n\n")
    eps = model_entrypoints(tree)
    san = sanitize_doc(tree)

    lines = [f"# {fam}", "", first.strip(), ""]
    if rest.strip():
        lines += ["## Design & reference parity", "", rest.strip(), ""]
    lines += ["## Usage", "",
              USAGE[task].format(repo=default_repo(task, fam)), ""]
    if eps:
        lines += ["## Entry points", ""]
        lines += [f"- `Model.{e}`" for e in eps]
        lines += [""]
    lines += ["## Checkpoint layout", ""]
    if san:
        lines += [san.strip(), ""]
    else:
        lines += [
            "Checkpoints load through the standard pipeline "
            "(`mlx_audio_tpu.utils.load_model`): safetensors weights are "
            "mapped by the family's `sanitize` into the functional "
            "parameter tree; `convert.py` handles dtype casts and "
            "quantization (see the quantization guide).", ""]
    bench = bench_section(task, fam)
    if bench:
        lines += [bench, ""]
    lines += [f"*Source: `mlx_audio_tpu/{task}/models/{fam}/{main.name}` "
              f"(reference parity citations in the module docstring).*", ""]
    return "\n".join(lines)


def main():
    nav: dict[str, list[tuple[str, str]]] = {t: [] for t in TASKS}
    for task in TASKS:
        d = PKG / task / "models"
        for fam_dir in sorted(p for p in d.iterdir()
                              if p.is_dir() and p.name != "__pycache__"):
            fam = fam_dir.name
            if (task, fam) in HAND_WRITTEN:
                bench = bench_section(task, fam)
                if bench:
                    inject_bench(REPO / "docs"
                                 / HAND_WRITTEN[(task, fam)], bench)
                nav[task].append((fam, HAND_WRITTEN[(task, fam)]))
                continue
            page = gen_page(task, fam)
            out = DOCS / task / f"{fam}.md"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(page)
            nav[task].append((fam, f"models/{task}/{fam}.md"))

    # ---- mkdocs nav ----
    mk = REPO / "mkdocs.yml"
    text = mk.read_text()
    head, marker, _ = text.partition("  - Models:\n")
    if not marker:
        raise SystemExit("mkdocs.yml: Models nav anchor not found")
    nav_lines = ["  - Models:", "      - Catalog: models/index.md"]
    for task in TASKS:
        nav_lines.append(f"      - {TASK_TITLES[task]}:")
        for fam, path in nav[task]:
            nav_lines.append(f"          - {fam}: {path}")
    nav_lines.append("  - API reference: api-reference.md")
    mk.write_text(head + "\n".join(nav_lines) + "\n")
    n = sum(len(v) for v in nav.values())
    print(f"wrote {n} model pages ({len(HAND_WRITTEN)} hand-written kept)")


if __name__ == "__main__":
    main()
