#!/usr/bin/env python3
"""Round-over-round bench guard: diff two BENCH_r{N}.json files per query.

Usage: python3 tools/bench_diff.py BENCH_r02.json BENCH_r03.json [threshold]

Flags queries whose time grew by more than `threshold`x (default 1.5) AND by
more than 0.3 s absolute — sub-second scheduler noise on a 32-thread box
swings small queries by 1.5x without any code change (VERDICT r2), so a pure
ratio gate would cry wolf on every run.

Exit code 1 when any query is flagged, so the check can gate CI.

From round 7 on, Bench prints only the slowest-40 queries in the stdout line
(the full map no longer fits the driver's 2000-char tail at 190+ queries) and
writes the COMPLETE map to bench_full.json, committed per round. For a full
round-over-round diff, extract the old round's copy first:
  git show <round-commit>:bench_full.json > /tmp/full_old.json
  python3 tools/bench_diff.py /tmp/full_old.json bench_full.json
Diffing the BENCH_r{N}.json files still works but covers only queries present
in both top-40 lists.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver BENCH_r{N}.json wraps Bench's line under "parsed"
        if d["parsed"] is None:
            # the driver keeps only a 2000-char stdout tail, which truncates
            # the front of the metric line once the query map grows past it —
            # recover whatever per-query pairs survive in the fragment
            qs = {k: float(v) for k, v in
                  re.findall(r'"(q\d+[a-z0-9_]*)":([0-9.]+)', d.get("tail", ""))}
            m = re.search(r'"metric":"total","value":([0-9.]+)', d.get("tail", ""))
            return qs, (float(m.group(1)) if m else sum(qs.values()) or None)
        d = d["parsed"]
    qs = d.get("queries", {})
    # r2+ shape: {"q01": 1.23, ...}; tolerate {"q01": {"sec": 1.23}} too
    return {k: (v["sec"] if isinstance(v, dict) else float(v))
            for k, v in qs.items()}, d.get("value")


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, old_total = load(old_path)
    new, new_total = load(new_path)

    flagged = []
    print(f"{'query':34} {'old':>8} {'new':>8} {'ratio':>7}")
    for q in sorted(set(old) | set(new)):
        o, n = old.get(q), new.get(q)
        if o is None or n is None:
            tag = "NEW" if o is None else "GONE"
            print(f"{q:34} {'-' if o is None else f'{o:8.2f}':>8} "
                  f"{'-' if n is None else f'{n:8.2f}':>8}   [{tag}]")
            continue
        ratio = n / o if o > 0 else float("inf")
        mark = ""
        if ratio > threshold and (n - o) > 0.3:
            mark = f"  << REGRESSION >{threshold}x"
            flagged.append(q)
        elif ratio < 1 / threshold and (o - n) > 0.3:
            mark = "  (improved)"
        print(f"{q:34} {o:8.2f} {n:8.2f} {ratio:7.2f}{mark}")

    if old_total and new_total:
        print(f"\ntotal: {old_total:.1f}s -> {new_total:.1f}s "
              f"({new_total / old_total:.2f}x) | flagged: {flagged or 'none'}")
    else:
        print(f"\ntotal: {old_total} -> {new_total} | flagged: {flagged or 'none'}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
