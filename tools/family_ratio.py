#!/usr/bin/env python3
"""Per-family engine-vs-DuckDB ratio table (driver-side tooling):
joins BENCH_DETAIL.json (engine, idle full run) with a
tools/time_oracle.py output (DuckDB, same host) and prints the
markdown table README embeds.

Usage:
  python3 tools/family_ratio.py BENCH_DETAIL.json /tmp/oracle_times.json
"""
import json
import sys

FAMILY_NAMES = {
    "q": "TPC-H basics (q)", "r": "relational (r)", "v": "video (v)",
    "d": "dedup (d)", "s": "similarity (s)", "x": "corpus/retrieval (x)",
    "g": "graph (g)", "m": "multimodal (m)",
}


def main():
    bench = json.load(open(sys.argv[1]))["queries"]
    oracle = json.load(open(sys.argv[2]))
    if "queries" in oracle:
        oracle = oracle["queries"]
    fams = {}
    for name, sec in bench.items():
        fam = name[0]
        if name not in oracle:
            continue
        e, d, n = fams.setdefault(fam, [0.0, 0.0, 0])
        fams[fam] = [e + sec, d + oracle[name], n + 1]
    print("| family | queries | engine (s) | DuckDB (s) | ratio |")
    print("|---|---|---|---|---|")
    te = td = tn = 0
    for fam in "qrvdsxgm":
        if fam not in fams:
            continue
        e, d, n = fams[fam]
        te += e; td += d; tn += n
        print(f"| {FAMILY_NAMES[fam]} | {n} | {e:.1f} | {d:.1f} | "
              f"{e / d:.2f}x |")
    print(f"| **total** | {tn} | {te:.1f} | {td:.1f} | {te / td:.2f}x |")


if __name__ == "__main__":
    main()
