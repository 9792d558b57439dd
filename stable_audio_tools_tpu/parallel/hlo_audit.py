"""Collective-op accounting over compiled HLO text.

Shared by scripts/audit_tp_hlo.py (the docs/multichip.md evidence base) and
tests/test_sharding_correctness.py::test_tp_collective_floor_pinned, which
pins the audited "3 all-reduces/layer, zero all-gathers/permutes" pattern so
a sharding-rule regression can't land silently.
"""

from __future__ import annotations

import re

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
             "f64": 8, "s8": 1, "u8": 1}

COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                  "collective-permute")


def count_collectives(hlo: str) -> dict[str, list[int]]:
    """Parse compiled HLO text → {op: [count, bytes]}.

    Counts unique collective DEFINITIONS only: anchored at line start with
    the full %name captured for dedup (a bare \\w+ cannot match
    '%all-reduce.72', so the schedule section's re-listing would
    double-count every collective — the source of round 2's bogus
    "4.7 all-reduces/layer" figure).
    """
    counts: dict[str, list[int]] = {}
    seen: set[str] = set()
    for m in re.finditer(
        r"^\s*(%[\w.\-]+) = (\w+)\[([\d,]*)\][^=]*?"
        r"(" + "|".join(COLLECTIVE_OPS) + r")"
        r"\(", hlo, re.M,
    ):
        name, dtype, shape_s, op = m.groups()
        if name in seen:
            continue
        seen.add(name)
        n = 1
        for d in filter(None, shape_s.split(",")):
            n *= int(d)
        counts.setdefault(op, [0, 0])
        counts[op][0] += 1
        counts[op][1] += n * _DT_BYTES.get(dtype, 4)
    return counts
