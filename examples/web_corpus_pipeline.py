"""Runnable web-corpus pipeline example.

Wires the round-9 wave-10+ operators into the crawl-to-training-rows
workflow a pretraining-data team runs per snapshot:

    frontier dedup          URL canonicalization + variant collapse
      -> extraction         HTML boilerplate strip (md5-pinned)
      -> curation           quality gate + 512-token packing
                            (the composed pipeline_web_corpus)
      -> tokenizer prep     distributed BPE merge-selection round
      -> class balance      md5 bottom-k per label over embeddings
      -> media dedup        perceptual dHash collisions (real codec)
      -> provenance         tamper-evident audit hash chain

Run:  python examples/web_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("web-corpus")
    reg = load_all()
    out: dict = {}

    # 1. frontier: how many raw variants collapse per canonical URL?
    canon = reg["text_url_canonicalize"].fn(spark, sf_dir)
    out["canonical_urls"] = canon.count()
    out["max_variants"] = canon.agg(F.max("n_variants")).first()[0]

    # 2. extraction: every page yields clean text
    extracted = reg["text_html_extract"].fn(spark, sf_dir)
    out["extracted_docs"] = extracted.count()
    out["min_chars"] = extracted.agg(F.min("n_chars")).first()[0]

    # 3. curation: dedup -> quality -> packed training sequences
    packed = reg["pipeline_web_corpus"].fn(spark, sf_dir)
    out["training_rows"] = packed.count()
    out["packed_sequences"] = packed.select(
        "source", "seq_id"
    ).distinct().count()

    # 4. tokenizer prep: the next BPE merge candidates
    merges = reg["text_bpe_merge_rank"].fn(spark, sf_dir).collect()
    out["top_merge_pair"] = merges[0]["pair"] if merges else None

    # 5. class balance for the classifier head
    balanced = reg["sample_balanced_classes"].fn(spark, sf_dir)
    kept = [r["n_kept"] for r in balanced.collect()]
    out["balanced_labels"] = len(kept)
    out["balanced_equal"] = len(set(kept)) <= 1

    # 6. media dedup: perceptual fingerprint collisions
    phash = reg["mm_dedup_phash"].fn(spark, sf_dir)
    out["phash_dupes"] = phash.filter(F.col("n_dupes") > 1).count()

    # 7. provenance: one digest certifies each user's event history
    chain = reg["gov_audit_chain"].fn(spark, sf_dir)
    out["audited_users"] = chain.count()
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    for k, v in main(sf).items():
        print(f"{k}: {v}")
