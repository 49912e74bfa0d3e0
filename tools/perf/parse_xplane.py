"""Parse an xplane trace dir: aggregate device-op time by op name."""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path):
    import os
    files = glob.glob(path + "/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane.pb under {path}"
    files.sort(key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    xs = load(sys.argv[1])
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and "XLA Modules" not in line.name:
                pass
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                key = (line.name, name)
                tot[key] += ev.duration_ps / 1e9  # ms
                cnt[key] += 1
        print(f"== plane: {plane.name}")
        lines = sorted({k[0] for k in tot})
        for ln in lines:
            rows = [(v, cnt[k], k[1]) for k, v in tot.items() if k[0] == ln]
            rows.sort(reverse=True)
            s = sum(v for v, _, _ in rows)
            print(f"-- line: {ln}  total {s:.2f} ms")
            for v, c, name in rows[:25]:
                print(f"   {v:9.3f} ms  x{c:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
