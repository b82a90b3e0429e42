"""Time-ordered event dump of a jax.profiler xplane trace window.

Answers "what is the device actually doing, second by second": lists each
trace line in the TPU plane, then prints every event inside a wall-clock
window in time order with inter-event gaps, so serialization (gaps, or
copies with nothing overlapping) is visible directly.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python tools/xplane_timeline.py <trace_dir> [start_ms] [dur_ms]

With no window: prints per-line event counts/total only.
"""

import sys

from xplane_summary import load_xspace


def lines_overview(xs):
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name}")
        for line in plane.lines:
            if not line.events:
                continue
            t0 = min(ev.offset_ps for ev in line.events) / 1e9
            t1 = max(ev.offset_ps + ev.duration_ps for ev in line.events) / 1e9
            busy = sum(ev.duration_ps for ev in line.events) / 1e9
            print(f"  line {line.id:4d} {line.name!r}: {len(line.events)} events, "
                  f"span [{t0:.1f}, {t1:.1f}] ms, busy {busy:.1f} ms")


def window_dump(xs, start_ms, dur_ms, min_ms=0.005):
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            evs = [(ev.offset_ps / 1e9, ev.duration_ps / 1e9,
                    meta[ev.metadata_id].name)
                   for ev in line.events
                   if start_ms <= ev.offset_ps / 1e9 <= start_ms + dur_ms]
            if not evs:
                continue
            evs.sort()
            print(f"-- line {line.name!r}: {len(evs)} events in window")
            last_end = None
            for s, d, name in evs:
                if d < min_ms:
                    continue
                gap = f" (gap {s - last_end:7.3f})" if last_end is not None and s - last_end > 0.02 else ""
                print(f"  {s:10.3f} +{d:7.3f}{gap}  {name[:120]}")
                last_end = max(last_end or 0, s + d)


if __name__ == "__main__":
    xs = load_xspace(sys.argv[1])
    if len(sys.argv) > 3:
        window_dump(xs, float(sys.argv[2]), float(sys.argv[3]))
    else:
        lines_overview(xs)
