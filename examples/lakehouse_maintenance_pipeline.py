"""Runnable lakehouse-maintenance pipeline example.

Wires the layout / maintenance / observability operators into the
nightly table-maintenance workflow a 100 TB lakehouse runs per
partition: decide the clustering, plan the compaction, prove the
pruning, and watch cardinalities drift — all with hash-checked
catalog operators.

    clustering            Hilbert-curve layout (round 13) vs Z-order:
                          per-bucket bounding rectangles, measured
      -> compaction       bin-packed small-file grouping plan
      -> pruning proof    zonemap (footer min/max) skip statistics
      -> cardinality      HyperLogLog register tables per event type
                          + their union (the mergeable monitor state)
      -> skew watch       per-key hot-spot profile for shuffle health

Run:  python examples/lakehouse_maintenance_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("lakehouse-maintenance")
    reg = load_all()
    out: dict = {}

    # 1. clustering quality: Hilbert buckets vs Z-order buckets —
    #    tighter per-file rectangles = better min/max pruning
    hil = reg["maintenance_hilbert_order"].fn(spark, sf_dir).collect()
    zor = reg["maintenance_zorder"].fn(spark, sf_dir).collect()

    def avg_semi_perimeter(rows, xlo, xhi, ylo, yhi):
        sp = [
            (r[xhi] - r[xlo]) + (r[yhi] - r[ylo])
            for r in rows
            if r["n"] > 1
        ]
        return round(sum(sp) / max(len(sp), 1), 2)

    out["hilbert_buckets"] = len(hil)
    out["hilbert_avg_rect"] = avg_semi_perimeter(
        hil, "min_cust", "max_cust", "min_day", "max_day"
    )
    out["zorder_buckets"] = len(zor)

    # 2. compaction plan: which small files merge into which target?
    comp = reg["maintenance_compact_binpack"].fn(spark, sf_dir)
    out["compaction_bins"] = comp.select("bin_id").distinct().count()

    # 3. pruning proof: zonemap skip rate for the ship-date predicate
    zm = reg["maintenance_zonemap_prune"].fn(spark, sf_dir).collect()
    out["zonemap_rows"] = len(zm)

    # 4. cardinality monitoring: HLL registers + client-side estimate
    regs = reg["sketch_hll_registers"].fn(spark, sf_dir).collect()
    merged = {
        r["bucket"]: r["register"] for r in regs if r["grp"] == "__merged"
    }
    import math

    m = 64
    z = sum(2.0 ** -merged.get(b, 0) for b in range(m))
    est = 0.709 * m * m / z
    v = sum(1 for b in range(m) if merged.get(b, 0) == 0)
    if est <= 2.5 * m and v > 0:  # small-range (linear counting) regime
        est = m * math.log(m / v)
    out["hll_cells"] = len(regs)
    out["hll_estimate_users"] = round(est)

    # 5. shuffle health: the hottest keys by share
    skew = reg["skew_key_profile"].fn(spark, sf_dir).collect()
    out["skew_top_keys"] = len(skew)

    for key, val in out.items():
        print(f"{key}: {val}")
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
