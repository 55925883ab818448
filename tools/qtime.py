"""Isolated per-query timing: median-of-N noop-sink runs per query.

The full bench sweep takes ~30 min of wall on a noisy host; when
optimizing a specific query the tight loop here gives a steadier
estimate (median-of-5 by default, cache cleared per run, jobs
labeled).  Usage:

    python tools/qtime.py [--sf DIR] [--runs N] [--explain DIR] name ...

With ``--explain DIR`` each query's ``explain('formatted')`` is also
written to ``DIR/<name>.txt`` (the plan evidence the optimization
rounds commit under plans/r15/).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--explain", metavar="DIR")
    args = ap.parse_args()

    registry = load_all()
    spark = get_spark("qtime")
    # Warm the JVM + Python worker pools exactly like bench.py so the
    # first timed run isn't billed for session setup.
    registry["join_inner_equi"].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    if any(n.startswith("stream_") or n.startswith("ctgov_") for n in args.names):
        # same streaming warm-up as bench.py so the first stream query
        # isn't billed for the Structured Streaming machinery spawn
        import shutil

        from ctgov_ai_etl_spark.streaming.events import scratch_dir

        warm_ckpt = scratch_dir("qtime_warm_ckpt_")
        q = (
            spark.readStream.format("rate").option("rowsPerSecond", "1").load()
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", warm_ckpt)
            .start()
        )
        if not q.awaitTermination(30):
            q.stop()
        shutil.rmtree(warm_ckpt, ignore_errors=True)

    out: dict[str, dict] = {}
    for name in args.names:
        fn = registry[name].fn
        if args.explain:
            import contextlib
            import io

            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            # Public API with stdout capture (ADVICE r15): the private
            # JVM helper PythonSQLUtils.explainString has shifted
            # package/arity across Spark versions.
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        runs = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"qtime {name} #{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"median": sorted(runs)[len(runs) // 2], "min": min(runs), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTAL_MEDIAN", round(sum(v["median"] for v in out.values()), 3))
    print("TOTAL_MIN", round(sum(v["min"] for v in out.values()), 3))


if __name__ == "__main__":
    main()
