"""Aggregate device trace time by HLO metadata op_name path components.

Usage: python scripts/trace_by_layer.py TRACE_DIR HLO_TXT [depth] [top]
Joins trace event names (fusion.NNN, copy.NNN, ...) with the HLO dump's
metadata op_name to attribute device ms to model-layer paths.
"""
import collections, glob, gzip, json, os, re, sys


def hlo_name_map(hlo_path):
    m = {}
    pat = re.compile(r"%?([\w.\-]+) = .*metadata=\{op_name=\"([^\"]+)\"")
    for line in open(hlo_path):
        r = pat.search(line)
        if r:
            m[r.group(1)] = r.group(2)
    return m


def main(trace_dir, hlo_path, depth=4, top=40):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
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
    hmap = hlo_name_map(hlo_path)
    agg = collections.Counter(); cnt = collections.Counter(); total = 0.0
    unmapped = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3
        # jit-level umbrella events double-count; skip them
        if name.startswith("jit_"):
            continue
        op = hmap.get(name)
        if op is None:
            unmapped[name] += dur
            key = "<unmapped>/" + name.split(".")[0]
        else:
            parts = op.split("/")
            key = "/".join(parts[:int(depth)])
        agg[key] += dur; cnt[key] += 1; total += dur
    print(f"device total {total:.1f} ms (mapped events only)")
    for k, ms in agg.most_common(int(top)):
        print(f"{k[:78]:78s} {ms:9.2f} {cnt[k]:6d}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:] or []))
