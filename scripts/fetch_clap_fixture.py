"""Fetch a LAION-CLAP checkpoint into the repo-local fixture pack.

Run this wherever network (or a populated HF cache) exists:

    python scripts/fetch_clap_fixture.py [--out fixtures/clap]

Saves the music_audioset CLAP checkpoint (the one stable-audio models use
for conditioning and FAD evaluation) under fixtures/clap/. Every CLAP
conditioner — and therefore eval/fad.py and scripts/eval_fad.py — picks
the fixture up automatically (models/conditioners.py::_clap_fixture_path),
so zero-egress environments get REAL embeddings instead of the
random-init pipeline check. Override the directory at runtime with
SAT_CLAP_FIXTURE_DIR.

Match: reference stable_audio_tools/models/conditioners.py:222-286 loads
the same family of checkpoints via laion_clap.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = "lukewys/laion_clap"
FILENAME = "music_audioset_epoch_15_esc_90.14.pt"


def main():
    out_root = "fixtures/clap"
    if "--out" in sys.argv:
        out_root = sys.argv[sys.argv.index("--out") + 1]
    os.makedirs(out_root, exist_ok=True)

    from huggingface_hub import hf_hub_download

    print(f"fetching {REPO}/{FILENAME} ...")
    path = hf_hub_download(REPO, FILENAME)
    dst = os.path.join(out_root, FILENAME)
    import shutil

    shutil.copyfile(path, dst)
    print(f"saved fixture to {dst}; CLAP conditioners and eval/fad.py will "
          "now load it automatically in any environment with this checkout.")


if __name__ == "__main__":
    main()
