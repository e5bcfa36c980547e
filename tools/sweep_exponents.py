"""Post-process a scale-sweep JSON line into per-query scaling exponents.

exponent = ln(big_s / base_s) / ln(mult): 1.0 = perfectly linear in data
size, < 1 sublinear (fixed overheads amortizing), > 1 superlinear (a
plan whose cost grows faster than its input — the thing the sweep
exists to catch). base_s has a 0.25 s floor applied before the ratio:
sub-quarter-second walls are scheduling floor, and dividing by them
manufactures fake superlinearity.

Usage:
    python tools/sweep_exponents.py /tmp/sweep300.out [--top 40]
Reads the LAST {"scale_sweep": ...} line of the file and prints a
markdown table sorted by exponent descending.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()
    line = None
    with open(args.path) as f:
        for ln in f:
            if ln.startswith("{") and "scale_sweep" in ln:
                line = ln
    if line is None:
        print("no scale_sweep JSON line found", file=sys.stderr)
        sys.exit(1)
    data = json.loads(line)
    mult = data["scale_sweep"]["mult"]
    rows = []
    for name, q in data["queries"].items():
        base = max(q["base_s"], 0.25)
        big = max(q["big_s"], 0.25)
        exp = math.log(big / base) / math.log(mult)
        rows.append((round(exp, 2), name, q["base_s"], q["big_s"], q["ok"]))
    rows.sort(reverse=True)
    print(f"| query | base_s | {mult}x_s | exponent | diff |")
    print("|---|---|---|---|---|")
    for exp, name, b, g, ok in rows[: args.top]:
        print(f"| {name} | {b:.2f} | {g:.2f} | {exp:.2f} | "
              f"{'ok' if ok else 'FAIL'} |")
    sups = [r for r in rows if r[0] > 1.0]
    print(f"\n{len(rows)} queries; exponent > 1.0: "
          f"{[(n, e) for e, n, *_ in sups] or 'none'}")


if __name__ == "__main__":
    main()
