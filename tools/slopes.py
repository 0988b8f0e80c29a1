#!/usr/bin/env python3
"""Cross-SF scaling slopes (round-10 item 8): read three graft.Bench
JSON lines (sf0.001 / sf0.01 / sf0.1) and print per-query time-vs-SF
ratios, flagging anything whose sf0.01->sf0.1 ratio exceeds the
linear 10x by more than the noise band. The small SFs are fixed-cost
dominated (Spark job overhead ~0.1-0.3 s floors every query), so the
sf0.01->sf0.1 column is the informative one; the 10x derived-corpus
soak (BENCHNOTES) is the controlled continuation above sf0.1.

Usage: slopes.py <sf0001.json-or-log> <sf001.json-or-log> <sf01.json-or-log> [flag_ratio]
"""
import json, re, sys


def load(path):
    for line in open(path):
        line = line.strip()
        if line.startswith('[info] {'):
            line = line[7:]
        if line.startswith('{') and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    a, b, c = (load(p) for p in sys.argv[1:4])
    flag = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    names = sorted(set(a['queries']) & set(b['queries']) & set(c['queries']))
    rows = []
    for q in names:
        t1, t2, t3 = a['queries'][q], b['queries'][q], c['queries'][q]
        rows.append((q, t1, t2, t3, t2 / max(t1, 1e-9), t3 / max(t2, 1e-9)))
    rows.sort(key=lambda r: -r[5])
    print(f"{'query':36s} {'sf.001':>7s} {'sf.01':>7s} {'sf.1':>8s} "
          f"{'r01/001':>8s} {'r1/01':>7s}")
    nflag = 0
    for q, t1, t2, t3, r12, r23 in rows:
        mark = ' <-- superlinear' if r23 > flag else ''
        nflag += bool(mark)
        print(f"{q:36s} {t1:7.3f} {t2:7.3f} {t3:8.3f} {r12:8.2f} {r23:7.2f}{mark}")
    tot = sum(r[3] for r in rows)
    print(f"\n{len(rows)} shared queries; sf0.1 total {tot:.1f} s; "
          f"{nflag} above the {flag}x linear flag on sf0.01->sf0.1")


if __name__ == '__main__':
    main()
