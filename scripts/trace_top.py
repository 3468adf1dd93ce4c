"""Dump the top individual device ops (full names) from the most recent
perfetto trace under a dir.  Usage: python scripts/trace_top.py /tmp/sam_trace [top]"""

import collections
import glob
import gzip
import json
import os
import sys


def main(trace_dir, top=40):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    if not dev_pids:
        dev_pids = set(pid_names)
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"device total {total:.1f} ms across {sum(cnt.values())} events")
    print(f"{'op':64s} {'total ms':>9s} {'count':>6s}")
    for name, ms in agg.most_common(int(top)):
        print(f"{name[:64]:64s} {ms:9.2f} {cnt[name]:6d}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
