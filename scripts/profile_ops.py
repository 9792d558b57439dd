"""Aggregate per-op self-times from a jax.profiler trace (xplane.pb).

Usage:
    python scripts/profile_ops.py /tmp/trace_dir [filter_regex]

Works with the TensorFlow tsl xplane proto shipped in this image (the
tensorboard_plugin_profile converter is version-mismatched here). Prints
time grouped three ways — by hlo_category, by SOURCE LINE (from the op
metadata's `source` stat, with model-FLOPS rates), and the top individual
ops — the tool behind the step profiles in docs/performance.md. The
by-source table is usually the one that tells you what to fix.
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
    stat_meta = {m.id: m.name for m in tpu.stat_metadata.values()}
    info = {}
    for m in tpu.event_metadata.values():
        stats = {}
        for st in m.stats:
            nm = stat_meta.get(st.metadata_id, "?")
            w = st.WhichOneof("value")
            v = getattr(st, w) if w else None
            if w == "ref_value":
                v = stat_meta.get(st.ref_value, "")
            stats[nm] = v
        info[m.id] = (m.name, stats)

    ops = defaultdict(float)
    cats = defaultdict(float)
    srcs = defaultdict(float)
    src_flops = defaultdict(float)
    for line in tpu.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name, stats = info[ev.metadata_id]
            if pat and not pat.search(name):
                continue
            d = ev.duration_ps / 1e12
            ops[name] += d
            cats[stats.get("hlo_category", "?")] += d
            src = str(stats.get("source", "") or "(no source)")
            srcs[src] += d
            src_flops[src] += float(stats.get("model_flops", 0) or 0)

    total = sum(ops.values())
    print(f"total XLA op time {total * 1000:.1f} ms ({len(ops)} ops)")
    print("\n== by hlo_category ==")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{v * 1000:9.2f} ms  {k}")
    print("\n== by source line ==")
    for k, v in sorted(srcs.items(), key=lambda kv: -kv[1])[:35]:
        tf = src_flops[k] / (v + 1e-12) / 1e12
        print(f"{v * 1000:9.2f} ms {tf:7.1f} TF/s  {k[-110:]}")
    print("\n== top ops ==")
    for n, d in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d * 1000:9.2f} ms  {n[:140]}")


if __name__ == "__main__":
    main()
