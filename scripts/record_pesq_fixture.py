"""Record PESQ oracle fixtures using the reference `pesq` wheel.

Run on ANY machine that has `pip install pesq` (the ITU-T P.862 reference
C implementation) — this image does not. For each (ref, deg) pair it
stores the wheel's wideband MOS-LQO next to the audio in
tests/fixtures/pesq/cases.json; tests/test_pesq.py::
test_conformance_fixtures_match_reference then bounds the in-repo
implementation's deviation against these recorded oracle values
(VERDICT r4 #4).

Usage:
    python scripts/record_pesq_fixture.py ref1.wav deg1.wav [ref2 deg2 ...]

With no arguments, records the repo's deterministic synthetic test pairs
(same generator as tests/test_pesq.py) so no external audio is needed.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIX_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "pesq")
FS = 16000


def synthetic_pairs():
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(FIX_DIR), ".."))
    from tests.test_pesq import _speechlike

    x = _speechlike(FS * 2)
    rng = np.random.RandomState(1)
    noise = rng.randn(x.shape[0])
    pairs = [("identity", x, x.copy())]
    for snr_db in (30, 20, 10):
        scale = np.sqrt(np.mean(x ** 2) / (10 ** (snr_db / 10)
                                           * np.mean(noise ** 2)))
        pairs.append((f"snr{snr_db}", x, x + scale * noise))
    return pairs


def main():
    from pesq import pesq as pesq_ref  # the ITU reference wheel

    import numpy as np

    os.makedirs(FIX_DIR, exist_ok=True)
    cases = []
    args = sys.argv[1:]
    if args:
        from stable_audio_tools_tpu.data.wav import load_wav, save_wav

        assert len(args) % 2 == 0, "pass ref/deg wav pairs"
        it = [(os.path.basename(r), *[load_wav(p) for p in (r, d)])
              for r, d in zip(args[::2], args[1::2])]
        pairs = []
        for name, (ra, rs), (da, ds) in it:
            assert rs == ds == FS, "PESQ-WB fixtures must be 16 kHz"
            pairs.append((name, ra.mean(0) if ra.ndim > 1 else ra,
                          da.mean(0) if da.ndim > 1 else da))
    else:
        pairs = synthetic_pairs()

    from stable_audio_tools_tpu.data.wav import save_wav

    for name, ref, deg in pairs:
        mos = float(pesq_ref(FS, np.asarray(ref, np.float64),
                             np.asarray(deg, np.float64), "wb"))
        rp, dp = f"{name}_ref.wav", f"{name}_deg.wav"
        save_wav(os.path.join(FIX_DIR, rp), ref[None, :], FS)
        save_wav(os.path.join(FIX_DIR, dp), deg[None, :], FS)
        cases.append({"name": name, "ref": rp, "deg": dp,
                      "mos_lqo_wb": mos, "source": "pesq-wheel"})
        print(f"{name}: reference MOS-LQO {mos:.4f}")
    with open(os.path.join(FIX_DIR, "cases.json"), "w") as f:
        json.dump(cases, f, indent=1)
    print(f"recorded {len(cases)} oracle cases to {FIX_DIR}/cases.json")


if __name__ == "__main__":
    main()
