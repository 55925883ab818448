"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line per the driver
contract.

Each query executes via the `noop` sink — full plan execution on all
partitions, no driver-side collect (collect would measure Arrow
transfer + driver memory, not the engine).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the scan/join/agg/window spine plus one of each
# LLM-pipeline operator family (dedup, similarity, text, classify,
# streaming-window) — the queries whose plans carry the 100 TB story.
HEADLINE = [
    "agg_pricing_summary",
    "join_broadcast_star",
    "join_inner_equi",
    "win_topk_per_group",
    "join_asof",
    "text_top_tokens",
    "text_langid_quality",
    "llm_classify_documents",
    "dedup_minhash_lsh",
    "dedup_jaccard_pairs",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "pipeline_curate",
    "stream_tumbling_window",
]


def main() -> None:
    registry = load_all()
    spark = get_spark("bench")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])

    # Warm the JVM/codegen/file-index caches so timings measure the
    # queries, not session startup (standard benchmark hygiene).
    registry["join_inner_equi"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
