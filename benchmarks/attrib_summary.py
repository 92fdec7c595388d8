"""Summarize a SYMTENSOR_BASIS_VERBOSE log into per-phase wall-time buckets.

Verbose lines carry a timestamp since op start; the work attributed to a
line is the delta from the previous timestamp (prints happen after the
fenced work when SYMTENSOR_BASIS_FENCE_EVERY=1, so deltas are accurate
under pass A of benchmarks/root_window_attrib.py).

Usage: python benchmarks/attrib_summary.py /tmp/attrib_r6.log
"""

import re
import sys
from collections import defaultdict

PAT = re.compile(r"\[basis\s+([0-9.]+)s\]\s+(.*)")


def classify(msg: str) -> str:
    if msg.startswith("root window"):
        return "root-pass window (t=0 sweep)"
    m = re.match(r"level (\d+) row \d+ window", msg)
    if m:
        return f"t={m.group(1)} per-row sweep"
    m = re.match(r"level (\d+) block", msg)
    if m:
        return f"t={m.group(1)} block bookkeeping"
    if "leaf emit" in msg:
        return "leaf emit"
    return msg.split()[0]


def main(path):
    rows = []
    for ln in open(path, errors="replace"):
        m = PAT.search(ln)
        if m:
            rows.append((float(m.group(1)), m.group(2).strip()))
    if not rows:
        print("no verbose lines found")
        return
    buckets = defaultdict(float)
    counts = defaultdict(int)
    # Group per run.  A new run is detected by its FIRST verbose line —
    # "level 0 block ..." with a small timestamp (process(0, root) is the
    # first print of every basis_change) — not merely by a timestamp
    # decrease: a long compile before the new run's first line can push
    # its timestamp past the previous run's last one, which the old
    # `t < prev` check misread as run continuation (crediting the whole
    # cross-run delta to the new run's first phase).
    prev = 0.0
    for t, msg in rows:
        # process(0, root) runs exactly once per basis_change, so its
        # print is an unambiguous run-start sentinel
        if t < prev or msg.startswith("level 0 block"):  # new run
            prev = 0.0
        buckets[classify(msg)] += t - prev
        counts[classify(msg)] += 1
        prev = t
    total = sum(buckets.values())
    print(f"{'phase':<36}{'total s':>10}{'n':>7}{'mean s':>9}")
    for k in sorted(buckets, key=buckets.get, reverse=True):
        print(f"{k:<36}{buckets[k]:>10.1f}{counts[k]:>7}"
              f"{buckets[k]/max(1,counts[k]):>9.2f}")
    print(f"{'TOTAL attributed':<36}{total:>10.1f}")


if __name__ == "__main__":
    main(sys.argv[1])
