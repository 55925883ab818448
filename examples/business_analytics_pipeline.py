"""Runnable business-analytics pipeline example.

Wires the round-8 analytics operators into the canonical BI workflow
a warehouse user of the reference family runs daily:

    revenue composites          TPC-H Q3/Q5 star shapes, exact cents
      -> customer journeys      Markov transition matrix + last-touch
                                attribution over the event stream
      -> finance downsampling   per-user-hour OHLC bars (struct
                                order statistics, no window)
      -> account simulation     clamped running balance (the
                                distributed clamp-monoid scan)
      -> experimentation        md5 hash-split A/B Welch t-test
      -> governance gates       k-anonymity + Benford screens

Run:  python examples/business_analytics_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.operators.balance import (  # noqa: E402
    clamped_balance_chunked,
)
from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402
from ctgov_ai_etl_spark.tables import load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("business-analytics")
    reg = load_all()
    out: dict = {}

    # 1. revenue composites: the Q3 top-10 and Q5 per-nation rollup
    q3 = reg["tpch_q3_priority"].fn(spark, sf_dir).collect()
    out["q3_top_orders"] = len(q3)
    out["q3_best_revenue"] = q3[0]["revenue"] if q3 else 0.0
    q5 = reg["tpch_q5_local_supplier"].fn(spark, sf_dir).collect()
    out["q5_nations"] = len(q5)

    # 2. customer journeys: where do purchases come from?
    trans = reg["seq_transition_matrix"].fn(spark, sf_dir)
    to_purchase = trans.filter(F.col("to_type") == "purchase")
    out["purchase_inbound_edges"] = to_purchase.count()
    attr = reg["attribution_last_touch"].fn(spark, sf_dir).collect()
    out["attribution_channels"] = len(attr)
    out["attributed_total"] = round(
        sum(r["attributed_value"] for r in attr), 2
    )

    # 3. OHLC bars for the busiest user-hour
    ohlc = reg["ts_downsample_ohlc"].fn(spark, sf_dir)
    out["ohlc_bars"] = ohlc.count()

    # 4. account balances under a $25 credit cap (chunked JVM scan)
    events = load_table(spark, sf_dir, "events")
    bal = clamped_balance_chunked(events, cap_cents=2500)
    hit_cap = bal.filter(F.col("balance_cents") == 2500).count()
    out["balance_rows"] = bal.count()
    out["cap_hits"] = hit_cap

    # 5. experimentation: is the A/B split balanced and null?
    t = reg["stat_ab_ttest"].fn(spark, sf_dir).collect()[0]
    out["ab_n"] = t["n_a"] + t["n_b"]
    out["ab_t_welch"] = t["t_welch"]

    # 6. governance: quasi-identifier risk + money-digit sanity
    k = reg["dq_k_anonymity"].fn(spark, sf_dir)
    out["k_anon_at_risk"] = k.filter(F.col("at_risk")).count()
    benford = reg["dq_benford"].fn(spark, sf_dir).collect()
    out["benford_digits"] = len(benford)

    for key, val in out.items():
        print(f"{key}: {val}")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
