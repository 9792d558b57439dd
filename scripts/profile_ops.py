"""Aggregate per-op self-times from a jax.profiler trace (xplane.pb).

Usage:
    python scripts/profile_ops.py /tmp/trace_dir [filter_regex]

Works with the TensorFlow tsl xplane proto shipped in this image (the
tensorboard_plugin_profile converter is version-mismatched here). Prints the
top op categories and individual ops by accumulated duration on the TPU
plane — the tool behind the step profiles in docs/performance.md.
"""
import glob
import re
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    pat = re.compile(sys.argv[2]) if len(sys.argv) > 2 else None
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    tpu = [p for p in xs.planes if "TPU" in p.name and "device" in p.name]
    if not tpu:
        raise SystemExit(f"no TPU plane; planes: {[p.name for p in xs.planes]}")
    tpu = tpu[0]
    meta = {m.id: m.name for m in tpu.event_metadata.values()}
    ops = defaultdict(float)
    for line in tpu.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta[ev.metadata_id]
            if pat and not pat.search(name):
                continue
            ops[name] += ev.duration_ps / 1e12

    def category(n):
        base = n.split(".")[0].split(" ")[0]
        return re.sub(r"[_\-]?\d+$", "", base)

    cats = defaultdict(float)
    for n, d in ops.items():
        cats[category(n)] += d
    total = sum(ops.values())
    print(f"total XLA op time {total * 1000:.1f} ms ({len(ops)} ops)")
    print("\n== categories ==")
    for kname, v in sorted(cats.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v * 1000:9.2f} ms  {kname}")
    print("\n== top ops ==")
    for n, d in sorted(ops.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d * 1000:9.2f} ms  {n[:140]}")


if __name__ == "__main__":
    main()
