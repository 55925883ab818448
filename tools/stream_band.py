"""Volatility band + state-store provider A/B for the stream-stream /
stateful family (VERDICT r15 #4).

Runs each named stream query N times with the default HDFS-backed
state store and (optionally) N times with RocksDB, interleaved
A/B/A/B so host-steal bursts hit both arms equally.  Prints one JSON
line per query with both arms' raw runs — the committed band table
for OPTIMIZATION_r16.md.

Usage:
    python tools/stream_band.py [--sf DIR] [--runs N] [--rocksdb] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _run_once(spark, registry, name: str, sf: str) -> float:
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"stream_band:{name}")
    t0 = time.time()
    df = registry[name].fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--rocksdb", action="store_true")
    args = ap.parse_args()

    registry = load_all()
    spark = get_spark("stream_band")
    default_provider = spark.conf.get(_PROVIDER_KEY)

    # Warm-up: one throwaway stream so the first timed run isn't
    # billed for the Structured Streaming machinery spawn.
    from ctgov_ai_etl_spark.streaming.events import scratch_dir
    import shutil

    warm_ckpt = scratch_dir("band_warm_ckpt_")
    q = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", warm_ckpt)
        .start()
    )
    q.awaitTermination(30)
    q.stop()
    shutil.rmtree(warm_ckpt, ignore_errors=True)

    for name in args.names:
        hdfs_runs, rocks_runs = [], []
        for _ in range(args.runs):
            spark.conf.set(_PROVIDER_KEY, default_provider)
            hdfs_runs.append(_run_once(spark, registry, name, args.sf))
            if args.rocksdb:
                spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
                try:
                    rocks_runs.append(
                        _run_once(spark, registry, name, args.sf)
                    )
                except Exception as exc:  # provider missing native lib etc.
                    rocks_runs.append(f"ERR:{type(exc).__name__}")
                finally:
                    spark.conf.set(_PROVIDER_KEY, default_provider)
        out = {"query": name, "hdfs": hdfs_runs}
        if args.rocksdb:
            out["rocksdb"] = rocks_runs
        print(json.dumps(out), flush=True)
    print("BAND_DONE", flush=True)


if __name__ == "__main__":
    main()
