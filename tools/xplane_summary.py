"""Summarize a jax.profiler xplane trace: device time per XLA program and
per fused op, for the steady-state bench loop.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python tools/xplane_summary.py /tmp/bench_profile

(The pure-python protobuf impl is required: the C++ one in this image lacks
the xplane descriptors.)
"""

import glob
import os
import sys
from collections import defaultdict


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(xs, top=40):
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        by_program = defaultdict(float)
        by_op = defaultdict(float)
        n_events = 0
        for line in plane.lines:
            meta = plane.event_metadata
            for ev in line.events:
                name = meta[ev.metadata_id].name
                dur_ms = ev.duration_ps / 1e9
                n_events += 1
                # program-level lines are usually "XLA Modules"; op lines "XLA Ops"
                if "module" in line.name.lower():
                    by_program[name] += dur_ms
                else:
                    by_op[name] += dur_ms
        if not n_events:
            continue
        print(f"== plane: {plane.name} ({n_events} events)")
        if by_program:
            print("-- per program (total device ms):")
            for k, v in sorted(by_program.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {v:10.2f} ms  {k[:110]}")
        if by_op:
            print("-- per op (total device ms):")
            for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {v:10.2f} ms  {k[:110]}")


if __name__ == "__main__":
    summarize(load_xspace(sys.argv[1] if len(sys.argv) > 1 else
                          "/tmp/bench_profile"))
