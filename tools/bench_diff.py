"""Round-over-round bench comparison: per-query deltas between two
bench artifacts, annotated with the documented noise band.

Accepts both artifact shapes: the driver's ``BENCH_r{N}.json`` (whose
``tail`` field holds a truncated stdout fragment) and the full
``BENCH_FULL_r{N}.json`` written by bench.py.  Usage:

    python tools/bench_diff.py BENCH_FULL_r11.json BENCH_FULL_r12.json

Noise model (measured, COVERAGE.md "run-to-run noise"): identical-code
catalog totals reproduced within ±5%, but SINGLE-SHOT per-query times
swing ±25%+ (r11 flagged three >1.5x "regressions" that all re-timed
to noise).  Since r12, tail queries >= 2 s are median-of-3
(``tail_runs`` in the artifact), so a delta is only reported as a
candidate regression when BOTH sides are medians (headline or
tail_runs) AND the ratio exceeds 1.5x above a 1 s floor; everything
else is annotated as inside the single-shot noise band.
"""

from __future__ import annotations

import json
import re
import sys


def load_artifact(path: str) -> tuple[dict[str, float], set[str]]:
    """Returns (timings, median_backed_names)."""
    d = json.load(open(path))
    if "queries" in d:
        medians = set(d.get("headline_runs", {})) | set(
            d.get("tail_runs", {})
        )
        return {k: float(v) for k, v in d["queries"].items()}, medians
    if "tail" in d:  # driver artifact: regex the truncated fragment
        frag = d["tail"].replace('\\"', '"')
        return {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', frag)
        }, set()
    raise SystemExit(f"{path}: unrecognized bench artifact shape")


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, med_a = load_artifact(sys.argv[1])
    b, med_b = load_artifact(sys.argv[2])
    common = sorted(set(a) & set(b), key=lambda k: (b[k] - a[k]))
    print(f"{len(a)} vs {len(b)} queries; {len(common)} common")
    print(f"common totals: {sum(a[k] for k in common):.1f}s ->"
          f" {sum(b[k] for k in common):.1f}s")
    width = max((len(k) for k in common), default=10)
    candidates = 0
    for k in common:
        da, db = a[k], b[k]
        if abs(db - da) < 0.25 and abs(db - da) < 0.25 * max(da, 0.01):
            continue  # below the absolute+relative noise floor
        ratio = db / max(da, 1e-9)
        both_medians = k in med_a and k in med_b
        if ratio >= 1.5 and db >= 1.0 and both_medians:
            note = "REGRESSION? (both medians, >1.5x)"
            candidates += 1
        elif ratio >= 1.5 and db >= 1.0:
            note = "noise-band (single-shot side; ±25% per-query)"
        else:
            note = ""
        print(
            f"{k:{width}s} {da:8.2f} -> {db:8.2f}"
            f"  ({db - da:+.2f}, {ratio:.2f}x)  {note}"
        )
    only_b = sorted(set(b) - set(a))
    if only_b:
        print(f"new in {sys.argv[2]}: {', '.join(only_b)}")
    print(f"unexplained >1.5x median-backed deltas: {candidates}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
