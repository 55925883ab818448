"""Round-over-round bench comparison: per-query deltas between two
bench artifacts.

Accepts both artifact shapes: the driver's ``BENCH_r{N}.json`` (whose
``tail`` field holds a truncated stdout fragment) and the full
``BENCH_FULL_r{N}.json`` written by bench.py.  Usage:

    python tools/bench_diff.py BENCH_FULL_r06.json BENCH_FULL_r07.json
"""

from __future__ import annotations

import json
import re
import sys


def load_timings(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    if "tail" in d:  # driver artifact: regex the truncated fragment
        frag = d["tail"].replace('\\"', '"')
        return {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', frag)
        }
    raise SystemExit(f"{path}: unrecognized bench artifact shape")


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load_timings(sys.argv[1]), load_timings(sys.argv[2])
    common = sorted(set(a) & set(b), key=lambda k: (b[k] - a[k]))
    print(f"{len(a)} vs {len(b)} queries; {len(common)} common")
    print(f"common totals: {sum(a[k] for k in common):.1f}s ->"
          f" {sum(b[k] for k in common):.1f}s")
    width = max((len(k) for k in common), default=10)
    for k in common:
        da, db = a[k], b[k]
        if abs(db - da) < 0.25 and abs(db - da) < 0.25 * max(da, 0.01):
            continue  # noise floor
        print(f"{k:{width}s} {da:8.2f} -> {db:8.2f}  ({db - da:+.2f})")
    only_b = sorted(set(b) - set(a))
    if only_b:
        print(f"new in {sys.argv[2]}: {', '.join(only_b)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
