"""Aggregate an xplane trace by op-name category: per-step cost table.

parse_xplane.py prints raw per-op totals; this groups ops by their HLO name
prefix (fusion kind) + output shape and divides by the step count, which is
the form the floor tables in BASELINE.md use.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/perf/agg_xplane.py <trace_dir> [n_steps]
"""
import re
import sys
from collections import defaultdict

from parse_xplane import load  # noqa: E402  (same dir)


def table(trace_dir: str, n_steps: int = 30, top: int = 40):
    xs = load(trace_dir)
    out = []
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if name.startswith("%while"):
                    continue
                m = re.match(r"%([a-zA-Z_\-\.]+?)[\.\d]*\s*=\s*(\S+)", name)
                key = (m.group(1) if m else name[:40],
                       m.group(2)[:40] if m else "")
                tot[key] += ev.duration_ps / 1e9
                cnt[key] += 1
        rows = sorted(tot.items(), key=lambda kv: -kv[1])
        total = sum(tot.values())
        out.append(f"total op time {total / n_steps * 1000:.0f} us/step")
        for (k, shp), v in rows[:top]:
            out.append(f"{v / n_steps * 1000:9.1f} us/step  "
                       f"x{cnt[(k, shp)] // n_steps:<4} {k:35s} {shp}")
    return "\n".join(out)


if __name__ == "__main__":
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    print(table(sys.argv[1], n))
