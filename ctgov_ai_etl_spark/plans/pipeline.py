"""End-to-end CTGov pipeline (reference R19; /root/reference/etl.py:472-518).

The reference runs EXTRACT → TRANSFORM → AI → LOAD as four eager,
fully-materialized driver stages.  Here the whole thing is ONE lazy
Spark plan built from the same config shape
(/root/reference/config.example.yaml): the REST source scans pages
(filters pushed as Essie), ``from_json`` applies the nested schema,
the flatten select and the llm_classify stage compose, and the action
happens at the sink.  Stage boundaries become shuffle/UDF boundaries
chosen by Catalyst, not ``list`` materializations.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.config import conjuncts_from_config
from ctgov_ai_etl_spark.operators.flatten import flatten_studies
from ctgov_ai_etl_spark.operators.llm import (
    PREGNANCY_RULES,
    llm_classify,
    resolve_client_factory,
)
from ctgov_ai_etl_spark.schemas import RAW_STUDY
from ctgov_ai_etl_spark.sources import rest
from ctgov_ai_etl_spark.sources.csv_sink import write_reference_csv


def read_studies(spark: SparkSession, cfg: dict[str, Any]) -> DataFrame:
    """EXTRACT: paginated REST scan → typed nested struct."""
    rest.register(spark)
    ctgov = cfg.get("ctgov", {})
    reader = (
        spark.read.format("ctgov_rest")
        .option("page_size", str(ctgov.get("page_size", rest.DEFAULT_PAGE_SIZE)))
        .option("url", ctgov.get("api_url", ""))
    )
    adv = conjuncts_from_config(cfg)
    if adv:
        reader = reader.option("filter_advanced", adv)
    for opt in ("transport_factory", "transport_args", "paging", "max_pages"):
        if opt in ctgov:
            reader = reader.option(opt, str(ctgov[opt]))
    raw = reader.load()
    return raw.select(F.from_json("raw_json", RAW_STUDY).alias("study"))


def run_pipeline(
    spark: SparkSession, cfg: dict[str, Any], csv_path: str | None = None
) -> DataFrame:
    """Full reference pipeline; returns the final DataFrame (and writes
    the parity CSV when ``csv_path`` is given)."""
    studies = read_studies(spark, cfg)
    flat = flatten_studies(studies)

    ai_cfg = cfg.get("ai_processing", {})
    gem = cfg.get("gemini", {})
    if ai_cfg.get("enabled", True):
        only_ids = None
        tuning = cfg.get("tuning_trials")
        if ai_cfg.get("debug_only_tuning_trials") and tuning:
            only_ids = ("nct_id", tuning)
        # Config-pluggable client (reference etl.py:236-273): resolve
        # gemini.client_factory as module:function — called with the
        # gemini config dict once per task — defaulting to the
        # deterministic mock so CI never needs a network.
        if "client_factory" in gem:
            factory_fn = resolve_client_factory(gem["client_factory"])
            gem_cfg = dict(gem)

            def client_factory():
                return factory_fn(gem_cfg)

        else:

            def client_factory():
                return PREGNANCY_RULES

        flat = llm_classify(
            flat,
            prompt_template=gem.get("row_prompt_template", "{criteria}"),
            out_col=ai_cfg.get("column_name", "ai_determined_value"),
            client_factory=client_factory,
            rate_per_sec=(1.0 / gem["api_delay"]) if gem.get("api_delay") else None,
            max_rows=ai_cfg.get("max_rows"),
            order_cols=["nct_id"] if ai_cfg.get("max_rows") else None,
            only_ids=only_ids,
        )

    if csv_path:
        write_reference_csv(
            flat, csv_path, ai_column=ai_cfg.get("column_name", "ai_determined_value")
        )
    return flat
