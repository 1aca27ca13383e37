#!/usr/bin/env python3
"""Rebuild SHUFFLES.md / LINEAGE.md from `runMain graft.ExplainAudit` output.

Usage:
  sbt -batch "runMain graft.ExplainAudit counts"  > /tmp/counts.txt 2>&1
  sbt -batch "runMain graft.ExplainAudit lineage" > /tmp/lineage.txt 2>&1
  python3 tools/format_censuses.py shuffles /tmp/counts.txt  > SHUFFLES.md.body
  python3 tools/format_censuses.py lineage  /tmp/lineage.txt > LINEAGE.md.body

Emits only the mechanical body (histogram + per-query list, or the inverted
impact index); the prose header is maintained in the .md files by hand and
this script is pasted below it.
"""
import re
import sys
from collections import defaultdict


def shuffles(path):
    rows = []
    for line in open(path):
        m = re.match(r"(\S+)\s+shuffles=(\d+)\s+broadcasts=(\d+)", line)
        if m:
            rows.append((m.group(1), int(m.group(2)), int(m.group(3))))
    hist = defaultdict(int)
    for _, s, _ in rows:
        hist[min(s, 6)] += 1
    print("| shuffles | queries |")
    print("|---|---|")
    for k in range(0, 6):
        print(f"| {k} | {hist.get(k, 0)} |")
    print(f"| 6+ | {hist.get(6, 0)} |")
    print()
    print("Per-query counts (sorted by shuffles desc):")
    print()
    print("```")
    for n, s, b in sorted(rows, key=lambda r: (-r[1], r[0])):
        print(f"{n:36s} shuffles={s:<3d} broadcasts={b}")
    print("```")


def lineage(path):
    idx = defaultdict(set)
    per = {}
    for line in open(path):
        m = re.match(r"LINEAGE (\S+)\t(.*)", line)
        if not m:
            continue
        refs = [c for c in m.group(2).split() if c != "ERROR" and "." in c]
        per[m.group(1)] = refs
        for colref in refs:
            idx[colref].add(m.group(1))
    print("## Impact index (column -> reading queries)")
    print()
    for colref in sorted(idx):
        qs = " ".join(f"`{q}`" for q in sorted(idx[colref]))
        print(f"- `{colref}` ({len(idx[colref])}): {qs}")
    print()
    print(f"({len(idx)} columns indexed across {len(per)} queries)")
    print()
    print("## Per-query reads")
    print()
    print("```")
    for q in sorted(per):
        print(f"{q:34s} {' '.join(per[q])}")
    print("```")


if __name__ == "__main__":
    {"shuffles": shuffles, "lineage": lineage}[sys.argv[1]](sys.argv[2])
