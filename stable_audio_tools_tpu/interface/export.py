"""Output-file export: WAV via in-repo writer, other formats via ffmpeg.

Reference surface: interface/interfaces/diffusion_cond.py:225-290 (file
naming conventions, ffmpeg transcode table, async cleanup). ffmpeg is probed
at call time; without it non-WAV formats raise a clear error.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import threading
import time

import numpy as np

FILE_FORMATS = (
    "wav", "flac", "mp3 320k", "mp3 v0", "mp3 128k",
    "m4a aac_he_v2 64k", "m4a aac_he_v2 32k",
)

_FFMPEG_ARGS = {
    "flac": [],
    "mp3 320k": ["-b:a", "320k"],
    "mp3 128k": ["-b:a", "128k"],
    "mp3 v0": ["-q:a", "0"],
    "m4a aac_he_v2 32k": ["-c:a", "libfdk_aac", "-profile:a", "aac_he_v2",
                          "-b:a", "32k"],
    "m4a aac_he_v2 64k": ["-c:a", "libfdk_aac", "-profile:a", "aac_he_v2",
                          "-b:a", "64k"],
}


def condense_prompt(prompt: str, max_len: int = 40) -> str:
    """Filename-safe condensed prompt (reference diffusion_cond.py:26-35)."""
    p = re.sub(r"[^a-zA-Z0-9 ]", "", prompt or "").strip()
    p = re.sub(r"\s+", "-", p)
    return (p[:max_len] or "output").lower()


def output_basename(file_naming: str, prompt: str = "", negative_prompt: str = "",
                    cfg_scale: float = 0.0, seed: int = 0) -> str:
    if file_naming == "verbose":
        base = condense_prompt(prompt)
        if negative_prompt:
            base += ".neg-%s" % condense_prompt(negative_prompt)
        return "%s.cfg%s.%s" % (base, cfg_scale, seed)
    if file_naming == "prompt":
        return condense_prompt(prompt)
    return "output"


def save_output(audio: np.ndarray, sample_rate: int, file_format: str = "wav",
                basename: str = "output", out_dir: str = ".",
                cleanup_delay: float = 0.0) -> str:
    """audio: [C, T] float in [-1, 1]. Returns the written file path."""
    from ..data.wav import save_wav

    os.makedirs(out_dir, exist_ok=True)
    wav_path = os.path.join(out_dir, f"{basename}.wav")
    peak = float(np.abs(audio).max()) or 1.0
    save_wav(wav_path, (audio / peak).clip(-1, 1), sample_rate)
    if file_format == "wav" or not file_format:
        return wav_path

    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"ffmpeg not found; cannot export '{file_format}'. WAV was "
            f"written to {wav_path}."
        )
    ext = file_format.split(" ")[0].lower()
    out_path = os.path.join(out_dir, f"{basename}.{ext}")
    cmd = (["ffmpeg", "-i", wav_path] + _FFMPEG_ARGS[file_format]
           + ["-y", out_path, "-loglevel", "error"])
    subprocess.run(cmd, check=True)
    if cleanup_delay > 0:
        delete_files_async([wav_path], cleanup_delay)
    return out_path


def delete_files_async(filenames, delay: float) -> None:
    """Best-effort delayed cleanup (reference diffusion_cond.py:292-299)."""

    def _go():
        time.sleep(delay)
        for f in filenames:
            try:
                os.remove(f)
            except OSError:
                pass

    threading.Thread(target=_go, daemon=True).start()
