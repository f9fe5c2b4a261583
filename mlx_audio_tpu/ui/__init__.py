"""MLX-Audio-TPU Studio UI.

Parity: /root/reference/mlx_audio/ui/ — a Next.js 15 + React studio with
text-to-speech / speech-to-text (incl. realtime) / audio-separation pages,
voice selection, an audio-orb visualizer and a theme toggle, launched as an
`npm run dev` subprocess (reference server.py:1946-1981).

TPU/server-native redesign: the same feature surface is a BUILDLESS static
single-page app (vanilla ES modules, zero npm dependencies) served directly
by the aiohttp server at `/` — one process, no node toolchain, works in
air-gapped deployments. The audio orb is a canvas visualizer driven by a
WebAudio AnalyserNode instead of three.js.
"""

from pathlib import Path


def ui_static_dir() -> Path:
    """Directory holding the studio's static assets."""
    return Path(__file__).parent / "static"


__all__ = ["ui_static_dir"]
