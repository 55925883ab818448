"""Multimodal columns: binary payloads with typed metadata
(SURVEY.md §2.3 'multimodal columns'; NS mandate).

Design: media travels as an opaque ``binary`` column plus a typed
metadata struct; per-modality ops (decode, feature-extract, resize,
frame-sample) are Arrow-batched ``mapInPandas`` stages so each task
amortizes codec init and the bytes never round-trip through Python
row objects.  The container image has no image/audio codecs, so the
decode kernels are deterministic fakes behind the real Spark plumbing
(schema, batching, partitioning) — swap ``_fake_decode`` for a PIL/
ffmpeg call and nothing else changes; ``decode_image_real`` raises
``NotImplementedError`` to mark the seam explicitly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def attach_blob(df: DataFrame, src_col: str, blob_col: str = "blob") -> DataFrame:
    """Real plumbing: pack a column into binary + typed metadata
    (mime, byte size, checksum) — the storage shape for media at
    scale (blob inline for small payloads; at 100 TB the blob column
    holds object-store references and the same ops stream bytes)."""
    blob = F.encode(F.col(src_col), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.octet_length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("sha256"),
    )
    return df.withColumn(blob_col, blob).withColumn("media_meta", meta)


def decode_image_real(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """The real-codec seam. Container lacks image libraries; a
    deployment installs PIL/turbojpeg on executors and implements the
    kernel inside decode_image_features' mapInPandas."""
    raise NotImplementedError(
        "no image codec in this environment — use decode_image_features "
        "(deterministic fake) or install a codec on the executors"
    )


def _fake_decode(data: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder: derives (width,
    height, mean_luma) from the payload's sha256 — stable across runs,
    engines, and partitionings, and SQL-mirrorable (DuckDB ships
    sha256 but not sha1), which is what lets mm_decode_features be a
    full hash-checked oracle query instead of rows-only."""
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def decode_image_features(
    df: DataFrame, id_col: str, blob_col: str = "blob"
) -> DataFrame:
    """Batch 'decode' producing per-image features. The mapInPandas
    iterator form initializes the (stub) codec once per task and
    processes Arrow record batches — the exact layout a real decoder
    needs."""
    from ctgov_ai_etl_spark.session import ship_package

    ship_package(df.sparkSession)
    src = df.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode  # codec init happens here, once per task
        for pdf in batches:
            feats = [decode(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                }
            )

    return src.mapInPandas(run, schema=f"{id_col} long, width int, height int, mean_luma double")


def frame_sample(
    df: DataFrame, id_col: str, blob_col: str = "blob", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling shape: one input blob → N frame rows
    (here: deterministic fake frames keyed by byte offsets). Output
    explodes inside mapInPandas so a 2-hour video never materializes
    as one row in memory."""
    from ctgov_ai_etl_spark.session import ship_package

    ship_package(df.sparkSession)
    src = df.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_hash = [], [], []
            for rid, data in zip(pdf[id_col], pdf[blob_col]):
                n = max(1, len(data) // every_n)
                for i in range(n):
                    chunk = bytes(data[i * every_n : (i + 1) * every_n])
                    out_ids.append(rid)
                    out_idx.append(i)
                    out_hash.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame(
                {id_col: out_ids, "frame_idx": out_idx, "frame_sig": out_hash}
            )

    return src.mapInPandas(run, schema=f"{id_col} long, frame_idx int, frame_sig string")
