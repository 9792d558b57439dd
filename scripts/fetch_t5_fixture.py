"""Fetch a T5 encoder + tokenizer into the repo-local fixture pack.

Run this wherever network (or a populated HF cache) exists:

    python scripts/fetch_t5_fixture.py [t5-base] [--out fixtures/t5]

It saves the flax encoder weights + tokenizer under
fixtures/t5/<name with '/'->'__'>. Every T5Conditioner (and therefore
bench.py and the gradio app) picks the fixture up automatically before
trying the hub, so zero-egress environments run with REAL weights instead
of the architecture-exact random-init fallback. Override the fixture root
at runtime with SAT_T5_FIXTURE_DIR.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "t5-base"
    out_root = "fixtures/t5"
    if "--out" in sys.argv:
        out_root = sys.argv[sys.argv.index("--out") + 1]
    out = os.path.join(out_root, name.replace("/", "__"))

    from transformers import AutoTokenizer, FlaxT5EncoderModel

    print(f"fetching {name} ...")
    tok = AutoTokenizer.from_pretrained(name)
    model = FlaxT5EncoderModel.from_pretrained(name, from_pt=True)
    os.makedirs(out, exist_ok=True)
    tok.save_pretrained(out)
    model.save_pretrained(out)
    print(f"saved fixture to {out}; T5Conditioner will now load it "
          "automatically (before the hub) in any environment that has "
          "this repo checkout.")


if __name__ == "__main__":
    main()
