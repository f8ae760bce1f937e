"""Per-query bench continuity: compare two driver bench JSONs
(BENCH_r{N}.json) and print a markdown delta table so regressions are
visible round-over-round.

Usage: python tools/bench_deltas.py BENCH_r01.json BENCH_r02.json
"""

from __future__ import annotations

import json
import sys


def _load(p: str) -> dict:
    d = json.load(open(p))
    # driver BENCH_r{N}.json wraps the bench line under "parsed"
    return d.get("parsed", d)


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    old = _load(old_p)
    new = _load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"# Bench deltas: {old_p} → {new_p}\n")
    print(
        f"headline: {old.get('value')} → {new.get('value')} "
        f"{new.get('unit', '')}\n"
    )
    print("| query | old s | new s | Δ |")
    print("|---|---|---|---|")
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            print(f"| {name} | — | {b} | new |")
        elif b is None:
            print(f"| {name} | {a} | — | removed |")
        else:
            pct = (b - a) / a * 100 if a else 0.0
            print(f"| {name} | {a} | {b} | {pct:+.0f}% |")


if __name__ == "__main__":
    main()
