#!/usr/bin/env python3
"""Compare a fresh bench_report.json against prior-round BENCH_r*.json.

Usage: bench_drift.py <new_bench_report.json> <old_BENCH_rN.json> [ratio]

Prints per-query new/old ratios above the threshold (default 1.5 — the
judge's drift gate: no common entry >1.5x its prior-round number) and a
common-entry total comparison.
"""
import json
import sys


def load_queries(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc and doc["queries"]:
        return doc["queries"]
    # driver BENCH_r*.json wraps the JSON line in "tail" / "parsed"
    if isinstance(doc.get("parsed"), dict) and doc["parsed"].get("queries"):
        return doc["parsed"]["queries"]
    tail = doc.get("tail", "")
    line = next(l for l in tail.splitlines() if l.startswith('{"metric"'))
    return json.loads(line)["queries"]


def main():
    new_path, old_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    new, old = load_queries(new_path), load_queries(old_path)
    common = sorted(set(new) & set(old))
    slow = []
    for q in common:
        if old[q] > 0 and new[q] / old[q] > thresh and new[q] - old[q] > 0.15:
            slow.append((new[q] / old[q], q, old[q], new[q]))
    for ratio, q, o, n in sorted(slow, reverse=True):
        print(f"SLOW {ratio:5.2f}x  {q:40s} {o:7.3f}s -> {n:7.3f}s")
    tot_old = sum(old[q] for q in common)
    tot_new = sum(new[q] for q in common)
    print(f"\n{len(common)} common entries: old {tot_old:.1f}s -> "
          f"new {tot_new:.1f}s ({tot_new / tot_old:.2f}x); "
          f"{len(slow)} over {thresh}x")
    print(f"only-new: {len(set(new) - set(old))}, "
          f"only-old: {len(set(old) - set(new))}")


if __name__ == "__main__":
    main()
