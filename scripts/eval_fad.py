"""Offline FAD between two directories of WAV files.

Usage:
    python scripts/eval_fad.py REAL_DIR FAKE_DIR \
        [--clap-ckpt /path/to/clap.pt] [--allow-random-init] [--limit N]

Embeds both sets with the in-repo HTSAT/CLAP audio tower
(stable_audio_tools_tpu/models/htsat.py) and prints the Fréchet distance.
Without --clap-ckpt the tower is random-init (pass --allow-random-init);
the number then only validates the pipeline, not audio quality.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_dir(path, limit=None):
    from stable_audio_tools_tpu.data.wav import load_wav

    wavs = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith(".wav")
    )
    if limit:
        wavs = wavs[:limit]
    assert wavs, f"no .wav files under {path}"
    clips, sr = [], None
    for w in wavs:
        a, s = load_wav(w)
        assert sr is None or s == sr, "mixed sample rates in a set"
        sr = s
        clips.append(a)
    return clips, sr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("real_dir")
    p.add_argument("fake_dir")
    p.add_argument("--clap-ckpt", default=None)
    p.add_argument("--allow-random-init", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    from stable_audio_tools_tpu.eval.fad import CLAPEmbedder, fad_between

    real, sr_r = load_dir(args.real_dir, args.limit)
    fake, sr_f = load_dir(args.fake_dir, args.limit)

    embedder = CLAPEmbedder(
        clap_ckpt_path=args.clap_ckpt,
        allow_random_init=args.allow_random_init,
    )
    e_r = embedder.embed(real, sr_r)
    e_f = embedder.embed(fake, sr_f)
    from stable_audio_tools_tpu.eval.fad import embedding_stats, frechet_distance

    fad = frechet_distance(*embedding_stats(e_r), *embedding_stats(e_f))
    tower = "clap-ckpt" if args.clap_ckpt else "RANDOM-INIT (pipeline check only)"
    print(f"FAD ({len(real)} real vs {len(fake)} fake clips, tower={tower}): "
          f"{fad:.6f}")


if __name__ == "__main__":
    main()
