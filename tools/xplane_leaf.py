"""Leaf-level (self-time) breakdown of a jax.profiler xplane trace.

The per-op totals in xplane_summary.py double-count: a `while` op's duration
includes every fusion inside it. Here each event's SELF time is its duration
minus time covered by events nested inside it on the same trace line, giving
an honest additive breakdown. Ops are also grouped by a coarse category
(matmul/conv fusion, other fusion, copy, slice, etc) and, when available, by
the HLO op's source category.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python tools/xplane_leaf.py /tmp/bench_profile [n_frames]
"""

import re
import sys
from collections import defaultdict

from xplane_summary import load_xspace


def _category(name):
    base = name.split(" = ")[0].lstrip("%")
    base = re.sub(r"[.\d]+$", "", base)
    return base


def summarize(xs, n_frames=None, top=45):
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        by_name = defaultdict(float)
        by_cat = defaultdict(float)
        total_self = 0.0
        for line in plane.lines:
            if "module" in line.name.lower():
                continue
            evs = []
            for ev in line.events:
                evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                            meta[ev.metadata_id].name))
            if not evs:
                continue
            evs.sort(key=lambda t: (t[0], -t[1]))
            # nesting via a stack: subtract child durations from parents
            stack = []  # (end, accumulated_child_time)
            self_ms = []
            for s, e, name in evs:
                while stack and stack[-1][0] <= s:
                    end, child, ps, pname = stack.pop()
                    dur = (end - ps - child) / 1e9
                    self_ms.append((pname, dur))
                    if stack:
                        stack[-1] = (stack[-1][0], stack[-1][1] + (end - ps),
                                     stack[-1][2], stack[-1][3])
                stack.append((e, 0.0, s, name))
            while stack:
                end, child, ps, pname = stack.pop()
                dur = (end - ps - child) / 1e9
                self_ms.append((pname, dur))
                if stack:
                    stack[-1] = (stack[-1][0], stack[-1][1] + (end - ps),
                                 stack[-1][2], stack[-1][3])
            for name, dur in self_ms:
                by_name[name] += dur
                by_cat[_category(name)] += dur
                total_self += dur
        if not by_name:
            continue
        div = n_frames if n_frames else 1.0
        unit = "ms/frame" if n_frames else "ms total"
        print(f"== plane: {plane.name}  total self {total_self/div:.2f} {unit}")
        print("-- by category:")
        for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {v/div:9.3f} {unit}  {k}")
        print("-- top ops (self time):")
        for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {v/div:9.3f} {unit}  {k[:150]}")


if __name__ == "__main__":
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else None
    summarize(load_xspace(sys.argv[1]), nf)
