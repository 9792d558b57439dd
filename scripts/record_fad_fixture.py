"""Record the FAD embedding-path regression fixture.

Embeds a fixed-seed synthetic audio set with the CLAP audio tower and
saves the gaussian stats (mu, sigma) plus the raw embeddings to
tests/fixtures/fad_stats.npz. tests/test_fad.py compares a fresh run
against the committed file, so any silent change in the logmel frontend,
HTSAT trunk, projection, or Frechet math is caught (VERDICT r4 #4).

With a real CLAP fixture present (fixtures/clap, via
scripts/fetch_clap_fixture.py) the recording is made with real weights
and the npz notes it; otherwise the deterministic random-init tower
(seeded init) is used — still a valid regression oracle for the
embedding PATH, just not for absolute quality numbers.

Usage: python scripts/record_fad_fixture.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np


def fixture_clips():
    """Deterministic mixed-content clips: tones, chirps, filtered noise."""
    sr = 48000
    rng = np.random.RandomState(1234)
    t = np.arange(sr) / sr
    clips = []
    for i in range(6):
        tone = 0.3 * np.sin(2 * np.pi * (220 * (i + 1)) * t)
        chirp = 0.2 * np.sin(2 * np.pi * (100 + 40 * i + 400 * t) * t)
        noise = 0.1 * rng.randn(sr)
        clips.append((tone + chirp + noise).astype(np.float32))
    return clips, sr


def main():
    from stable_audio_tools_tpu.eval.fad import CLAPEmbedder, embedding_stats
    from stable_audio_tools_tpu.models.conditioners import _clap_fixture_path

    ckpt = _clap_fixture_path()
    emb = CLAPEmbedder(clap_ckpt_path=ckpt, allow_random_init=ckpt is None)
    clips, sr = fixture_clips()
    e = emb.embed(clips, sr)
    mu, sigma = embedding_stats(e)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "fad_stats.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, embeddings=e.astype(np.float32), mu=mu, sigma=sigma,
             tower=np.array("clap-ckpt" if ckpt else "random-init-seeded"))
    print(f"recorded {e.shape} embeddings (tower="
          f"{'clap-ckpt' if ckpt else 'random-init-seeded'}) to {out}")


if __name__ == "__main__":
    main()
