#!/usr/bin/env python3
"""Cross-round bench comparison: extracts the graft.Bench JSON line
from every BENCH_r*.json driver artifact (whose `parsed` field is null
because sbt prefixes stdout with [info] — the line lives inside
`tail`) and from any committed BENCH_r*_local.json (already clean
line-JSON), then prints per-query medians side by side.

Usage: python3 tools/bench_compare.py [repo_dir]
"""
import glob
import json
import os
import re
import sys


def parse_tail(tail):
    """Best-effort bench line from a bounded stdout tail: try every
    '{"metric"' start with a balanced JSON decode and keep the LAST
    one that parses — a head-truncated first line (the round-6
    failure: the full line outgrew the driver's 2 KB window) must not
    mask a complete later one."""
    dec = json.JSONDecoder()
    best = None
    for m in re.finditer(r'\{"metric"', tail):
        try:
            obj, _ = dec.raw_decode(tail, m.start())
            if "queries" in obj:
                best = obj
        except ValueError:
            continue
    return best


def extract(path):
    """Return the parsed bench line from a driver or local artifact.
    Prefers the clean file forms (a local artifact IS the full bench
    line; a driver artifact's `parsed` field) over scraping the
    bounded stdout tail."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:          # local artifact: already the bench line
        return d
    if d.get("parsed"):         # driver artifact with a working parser
        return d["parsed"]
    return parse_tail(d.get("tail", ""))


def main():
    repo = sys.argv[1] if len(sys.argv) > 1 else "."
    paths = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    runs = []
    for p in paths:
        parsed = extract(p)
        if parsed:
            runs.append((os.path.basename(p).replace(".json", ""), parsed))
    if not runs:
        print("no BENCH_r*.json artifacts found", file=sys.stderr)
        return 1

    names = []
    for _, r in runs:
        for q in list(r["queries"]) + list(r.get("extra", {})):
            if q not in names:
                names.append(q)
        # fold ad-hoc "extra" timings (same protocol) into the table
        r["queries"] = {**r.get("extra", {}), **r["queries"]}

    label_w = max(len(n) for n in names) + 2
    hdr = "query".ljust(label_w) + "".join(t.rjust(18) for t, _ in runs)
    print(hdr)
    print("-" * len(hdr))
    for n in names:
        row = n.ljust(label_w)
        for _, r in runs:
            v = r["queries"].get(n)
            row += (f"{v:.3f}" if v is not None else "-").rjust(18)
        print(row)
    print("-" * len(hdr))
    row = "TOTAL (shared queries)".ljust(label_w)
    shared = [n for n in names if all(n in r["queries"] for _, r in runs)]
    for _, r in runs:
        row += f"{sum(r['queries'][n] for n in shared):.3f}".rjust(18)
    print(row)
    print(f"shared queries: {len(shared)}; loadavg per run: " + "; ".join(
        f"{t}={r.get('loadavg')}" for t, r in runs))
    # validity verdicts (docs/bench_protocol.md); absent in pre-r6 artifacts
    for t, r in runs:
        if "valid" in r:
            noisy = ",".join(r.get("noisy", []) + r.get("extra_noisy", []))
            print(f"  {t}: valid={r['valid']}"
                  + (f" noisy=[{noisy}]" if noisy else "")
                  + f" (load_bound={r.get('load_bound')})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
