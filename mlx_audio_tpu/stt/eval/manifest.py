"""Eval samples from local manifests (jsonl/tsv) or mapping rows.

Parity: reference mlx_audio/stt/eval/standard.py (column aliases) plus a
local-file front-end so the harness runs with zero network egress — the
reference streams Seed-TTS from the HF hub (seed_tts.py); here that loader
is gated behind huggingface_hub availability and the common path is a
manifest on disk.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Any, Iterable, Iterator, Mapping, Optional, Union

from .schema import STTEvalSample

ID_COLUMNS = ("utt_id", "id", "sample_id")
AUDIO_COLUMNS = ("audio_path", "path", "audio")
REFERENCE_COLUMNS = ("reference_text", "text", "transcript")


def _first(row: Mapping[str, Any], cols: tuple) -> Any:
    for c in cols:
        if c in row:
            return row[c]
    return None


def sample_from_row(row: Mapping[str, Any], *,
                    base_dir: Optional[Union[str, Path]] = None
                    ) -> STTEvalSample:
    utt_id = _first(row, ID_COLUMNS)
    audio = _first(row, AUDIO_COLUMNS)
    ref = _first(row, REFERENCE_COLUMNS)
    if isinstance(audio, Mapping):
        audio = audio.get("path")
    if not utt_id:
        raise ValueError(f"row missing an ID column {ID_COLUMNS}")
    if not audio:
        raise ValueError(f"row missing an audio column {AUDIO_COLUMNS}")
    if ref is None:
        raise ValueError(f"row missing a reference column {REFERENCE_COLUMNS}")
    path = Path(str(audio))
    if base_dir is not None and not path.is_absolute():
        path = Path(base_dir) / path
    skip = {*ID_COLUMNS, *AUDIO_COLUMNS, *REFERENCE_COLUMNS}
    return STTEvalSample(
        utt_id=str(utt_id), audio_path=path, reference_text=str(ref),
        source_path=str(audio),
        metadata={k: v for k, v in row.items() if k not in skip})


def iter_samples_from_rows(rows: Iterable[Mapping[str, Any]], *,
                           base_dir: Optional[Union[str, Path]] = None
                           ) -> Iterator[STTEvalSample]:
    for row in rows:
        yield sample_from_row(row, base_dir=base_dir)


def iter_samples_from_manifest(path: Union[str, Path], *,
                               base_dir: Optional[Union[str, Path]] = None
                               ) -> Iterator[STTEvalSample]:
    """jsonl (one object/line) or tsv/csv (header row) manifest on disk.
    Audio paths resolve relative to `base_dir` (default: manifest's dir)."""
    path = Path(path)
    if base_dir is None:
        base_dir = path.parent
    suffix = path.suffix.lower()
    if suffix in (".jsonl", ".json"):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    yield sample_from_row(json.loads(line), base_dir=base_dir)
    elif suffix in (".tsv", ".csv"):
        delim = "\t" if suffix == ".tsv" else ","
        with open(path, encoding="utf-8", newline="") as f:
            for row in csv.DictReader(f, delimiter=delim):
                yield sample_from_row(row, base_dir=base_dir)
    else:
        raise ValueError(f"unsupported manifest format: {path}")


# ---------------------------------------------------------------- seed-tts

DEFAULT_DATASET_REPO = "zhaochenyang20/seed-tts-eval"
EN_META_FILE = "en/meta.lst"
EN_TARGET_PREFIX = "en/wavs/"


def parse_seed_tts_meta_line(line: str) -> Optional[dict]:
    """One `utt|prompt_text|prompt_wav|target_text[|target_wav]` record
    (reference seed_tts.py parse_seed_tts_meta_line)."""
    line = line.strip()
    if not line:
        return None
    parts = line.split("|")
    if len(parts) not in (4, 5):
        raise ValueError(f"expected 4/5 pipe-delimited fields: {line!r}")
    utt_id = parts[0]
    if utt_id.endswith(".wav"):
        utt_id = utt_id[:-4]
    target_wav = parts[4] if len(parts) == 5 and parts[4] else \
        f"{EN_TARGET_PREFIX}{utt_id}.wav"
    return {"utt_id": utt_id, "prompt_text": parts[1],
            "prompt_wav": parts[2], "target_text": parts[3],
            "target_wav": target_wav}


def iter_seed_tts_english_samples(dataset_repo: str = DEFAULT_DATASET_REPO,
                                  revision: str = "main",
                                  audio_cache_dir: Optional[Union[str, Path]]
                                  = None,
                                  limit: Optional[int] = None,
                                  fail_on_missing_audio: bool = True
                                  ) -> Iterator[STTEvalSample]:
    """Stream the Seed-TTS English eval set from the HF hub (needs network +
    huggingface_hub; gated so offline environments can use manifests)."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "huggingface_hub is required for seed-tts streaming; use "
            "iter_samples_from_manifest with a local copy instead") from e

    meta = hf_hub_download(repo_id=dataset_repo, repo_type="dataset",
                           revision=revision, filename=EN_META_FILE)
    count = 0
    with open(meta, encoding="utf-8") as f:
        for line in f:
            entry = parse_seed_tts_meta_line(line)
            if entry is None or not entry["target_wav"].startswith(
                    EN_TARGET_PREFIX):
                continue
            if limit is not None and count >= limit:
                return
            try:
                wav = hf_hub_download(
                    repo_id=dataset_repo, repo_type="dataset",
                    revision=revision, filename=entry["target_wav"],
                    local_dir=audio_cache_dir)
            except Exception:
                if fail_on_missing_audio:
                    raise
                continue
            count += 1
            yield STTEvalSample(
                utt_id=entry["utt_id"], audio_path=Path(wav),
                reference_text=entry["target_text"],
                source_path=entry["target_wav"],
                metadata={"prompt_text": entry["prompt_text"],
                          "prompt_wav": entry["prompt_wav"]})
