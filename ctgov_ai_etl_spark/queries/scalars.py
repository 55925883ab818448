"""Scalar function families (SURVEY.md §2.3 'Scalar functions').

One query per family, each exercising the concrete functions the
reference uses (R6 split/format, R11 templating, E:SEARCH text
matching) plus the standard library the engine declares.  Everything
is a built-in `F.*` expression — JVM-side, inside whole-stage
codegen; no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.queries.registry import query
from ctgov_ai_etl_spark.tables import load_table


@query(
    "fn_string_family",
    oracle="""
    SELECT doc_id,
           upper(substring(text, 1, 12)) AS head_upper,
           CAST(length(text) AS INT) AS n_chars_fn,
           trim(concat_ws('|', lang, source)) AS lang_source,
           split_part(text, ' ', 1) AS first_token,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(substring(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled,
           CAST(instr(text, 'data') AS INT) AS data_pos,
           lower(reverse(substring(text, 1, 8))) AS rev_head,
           printf('doc %d [%s] %s', doc_id, lang, substring(text, 1, 10)) AS header,
           lpad(lang, 5, '.') AS lang_padded
    FROM documents
    """,
)
def fn_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: substring/upper/lower/trim/length/concat_ws/
    split/regexp_extract/regexp_replace/instr/reverse (reference R6
    splits strings, R11 formats templates)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.length("text").alias("n_chars_fn"),
        F.trim(F.concat_ws("|", "lang", "source")).alias("lang_source"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_token"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias("devoweled"),
        F.instr(F.col("text"), "data").alias("data_pos"),
        F.lower(F.reverse(F.substring("text", 1, 8))).alias("rev_head"),
        F.format_string(
            "doc %d [%s] %s", F.col("doc_id"), F.col("lang"), F.substring("text", 1, 10)
        ).alias("header"),
        F.lpad("lang", 5, ".").alias("lang_padded"),
    )


@query(
    "fn_datetime_family",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo,
           CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS unix_sec,
           round(CAST(date_diff('day', DATE '1994-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) / 30.4375, 4) AS months_since_94
    FROM orders
    """,
)
def fn_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: year/month/day, date_trunc, datediff,
    add_months, unix_timestamp (Essie date RANGE semantics need typed
    dates — SURVEY.md §2.2)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus3mo"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.round(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1994-01-01").cast("date"))
            .cast("double")
            / 30.4375,
            4,
        ).alias("months_since_94"),
    )


@query(
    "fn_partial_date_normalize",
    oracle="""
    SELECT d AS raw,
           CASE WHEN d IS NULL THEN NULL
                WHEN length(d) = 10 THEN CAST(d AS DATE)
                WHEN length(d) = 7  THEN CAST(d || '-01' AS DATE)
                WHEN length(d) = 4  THEN CAST(d || '-01-01' AS DATE)
                ELSE NULL END AS normalized,
           CASE WHEN d IS NOT NULL AND contains(d, '-')
                THEN split_part(d, '-', 1) ELSE 'N/A' END AS start_year
    FROM (VALUES ('2013-05-01'), ('2013-05'), ('2013'), ('bad-x'), (NULL)) t(d)
    """,
)
def fn_partial_date_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTGov partial-date normalization (SURVEY.md §7): '2013-05' →
    first-of-month, '2013' → first-of-year for the typed analytic
    path, PLUS the reference's exact start_year string rule
    (/root/reference/etl.py:199-201: dashed → prefix before first
    dash, undashed → 'N/A')."""
    d = spark.createDataFrame(
        [("2013-05-01",), ("2013-05",), ("2013",), ("bad-x",), (None,)], "d string"
    )
    col = F.col("d")
    normalized = (
        F.when(col.isNull(), F.lit(None).cast("date"))
        .when(F.length(col) == 10, F.to_date(col, "yyyy-MM-dd"))
        .when(F.length(col) == 7, F.to_date(F.concat(col, F.lit("-01")), "yyyy-MM-dd"))
        .when(F.length(col) == 4, F.to_date(F.concat(col, F.lit("-01-01")), "yyyy-MM-dd"))
        .otherwise(F.lit(None).cast("date"))
    )
    start_year = F.when(
        col.isNotNull() & col.contains("-"), F.split_part(col, F.lit("-"), F.lit(1))
    ).otherwise(F.lit("N/A"))
    return d.select(
        col.alias("raw"), normalized.alias("normalized"), start_year.alias("start_year")
    )


@query(
    "fn_math_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(pow(l_discount, 2), 10) AS disc_sq,
           round(ln(l_extendedprice), 6) AS log_price,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           CAST(round(sqrt(l_quantity) * 1e6) AS BIGINT) AS sqrt_qty_micro
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def fn_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: round/abs/ceil/floor/pow/log/greatest/least/sqrt
    (transcendentals rounded to 6-10 dp — libm last-bit differences
    across engines are below that)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.pow("l_discount", F.lit(2)), 10).alias("disc_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.round(F.sqrt("l_quantity") * 1e6).cast("long").alias("sqrt_qty_micro"),
    )


@query(
    "fn_array_family",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 6) AS vec_sum,
           round(list_aggregate(CAST(embedding[1:8] AS DOUBLE[]), 'sum'), 6) AS head_sum,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS vec_max,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.1)) AS INT) AS n_big,
           CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.25)) > 0
                THEN TRUE ELSE FALSE END AS any_very_big
    FROM embeddings
    """,
)
def fn_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: size/slice/element_at/aggregate/
    filter/exists over the embedding vectors (E:SEARCH[Location]
    exists-in-array semantics; NS embeddings)."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    fsum = lambda v: F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(fsum(vec), 6).alias("vec_sum"),
        F.round(fsum(F.slice(vec, 1, 8)), 6).alias("head_sum"),
        F.round(F.element_at(vec, 1), 6).alias("first_elem"),
        F.round(F.array_max(vec), 6).alias("vec_max"),
        F.size(F.filter(vec, lambda x: x > 0.1)).alias("n_big"),
        F.exists(vec, lambda x: x > 0.25).alias("any_very_big"),
    )


@query(
    "fn_json_map_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_json,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_map,
           CAST(len(json_keys(props)) AS INT) AS n_keys
    FROM events
    """,
)
def fn_json_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + map functions: get_json_object on the raw string, and
    from_json → MapType → element_at/map_keys (reference R5 parses raw
    JSON studies; events.props exercises it — FIXTURES.md)."""
    ev = load_table(spark, sf_dir, "events")
    as_map = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_json"),
        F.element_at(as_map, "k").alias("k_map"),
        F.size(F.map_keys(as_map)).alias("n_keys"),
    )


@query(
    "fn_null_family",
    oracle="""
    SELECT c_custkey,
           coalesce(NULLIF(c_mktsegment, 'MACHINERY'), 'N/A') AS seg_sentinel,
           NULLIF(coalesce(NULLIF(c_mktsegment, 'MACHINERY'), 'N/A'), 'N/A') AS seg_back,
           (c_acctbal IS NULL) AS bal_is_null,
           ifnull(NULLIF(c_mktsegment, 'MACHINERY'), 'machine!') AS seg_nvl
    FROM customer
    """,
)
def fn_null_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null handling: coalesce/nullif/nvl + the sentinel↔null round
    trip that keeps 'N/A' at the boundary and real NULLs inside the
    engine (SURVEY.md §1.2 mapping decision)."""
    c = load_table(spark, sf_dir, "customer")
    seg_sentinel = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("N/A"))
    return c.select(
        "c_custkey",
        seg_sentinel.alias("seg_sentinel"),
        F.nullif(seg_sentinel, F.lit("N/A")).alias("seg_back"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.nvl(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("machine!")).alias(
            "seg_nvl"
        ),
    )


@query(
    "essie_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
      AND (o_orderdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1996-12-31')
      AND o_totalprice >= 50000.0
      AND o_orderpriority IS NOT NULL
    """,
)
def essie_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Essie filter grammar (SURVEY.md §2.2) evaluated client-side
    through the engine's essie helper expressions: AREA[..]VALUE,
    AREA[..]RANGE[lo,hi], RANGE[..,MAX] with sentinel bound, MISSING
    negation — composed as one conjunction like the reference's
    AND-joined config list (/root/reference/etl.py:97-105)."""
    from ctgov_ai_etl_spark.functions.essie import area_eq, area_not_missing, area_range

    o = load_table(spark, sf_dir, "orders")
    pred = (
        area_eq("o_orderstatus", "F")
        & area_range("o_orderdate", "1994-01-01", "1996-12-31", typ="timestamp")
        & area_range("o_totalprice", 50000.0, None)  # RANGE[50000,MAX]
        & area_not_missing("o_orderpriority")
    )
    return o.filter(pred).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "essie_search_text",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE contains(lower(text), 'join') OR contains(lower(text), 'shuffle')
    """,
)
def essie_search_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Essie SEARCH[Study]term full-text baseline: case-folded
    containment across the record (SURVEY.md §2.2), OR-composed like
    the reference config's '(SEARCH[Study]pregnant OR ...)'."""
    from ctgov_ai_etl_spark.functions.essie import search_text

    d = load_table(spark, sf_dir, "documents")
    return d.filter(search_text("text", "join") | search_text("text", "shuffle")).select(
        "doc_id", "lang"
    )


@query(
    "fn_variant_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           CAST(NULL AS INT) AS missing_int,
           'OBJECT<k: BIGINT>' AS vschema
    FROM events
    """,
)
def fn_variant_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse_json → binary
    variant, typed path extraction with variant_get (missing path →
    NULL, not error), schema_of_variant introspection.  Variant is the
    100 TB answer to schema-drifting JSON columns: shredded binary
    beats per-query string re-parsing.  Oracle replays the same
    extractions with DuckDB JSON functions."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(parse_json(props), '$.missing', 'int')").alias(
            "missing_int"
        ),
        F.schema_of_variant(v).alias("vschema"),
    )


@query(
    "fn_try_family",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_custkey AS INT)
                ELSE NULL END AS prio_int,
           CASE WHEN o_custkey % 3 = 0 THEN NULL
                ELSE round(o_totalprice / (o_custkey % 3), 6) END AS per_bucket,
           CAST(NULL AS BIGINT) AS overflowed,
           CASE WHEN o_orderkey % 2 = 0 THEN 'x' ELSE NULL END AS maybe_elem
    FROM orders
    """,
)
def fn_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: under Spark 4's default ANSI mode,
    bad casts / division by zero / overflow THROW — the try_* family
    returns NULL instead, the right semantics for dirty data at scale
    (one malformed row must not kill a 100 TB job).  try_cast on a
    non-numeric string, try_divide by a sometimes-zero denominator,
    try_add at long-overflow, try_element_at past the array end; the
    oracle replays each NULL-producing branch explicitly."""
    o = load_table(spark, sf_dir, "orders")
    arr = F.array(F.lit("x"))
    return o.select(
        "o_orderkey",
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_custkey AS STRING) "
            "ELSE concat('p', o_orderpriority) END AS int)"
        ).alias("prio_int"),
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3), 6
        ).alias("per_bucket"),
        F.try_add(
            F.lit(9223372036854775807).cast("long"), F.col("o_orderkey") + 1
        ).alias("overflowed"),
        F.try_element_at(
            arr, ((F.col("o_orderkey") % 2) + 1).cast("int")
        ).alias("maybe_elem"),
    )


@query(
    "fn_hash_family",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           md5(CAST(doc_id AS VARCHAR) || ':' || lang) AS h_composite
    FROM documents
    """,
)
def fn_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable cryptographic hash family — the functions every
    fingerprint/bucket/split decision in this engine builds on,
    checked directly: md5 and sha-256 of the document text plus a
    composite key hash.  (xxhash64/crc32 are Spark-fast but
    engine-LOCAL — a replayable pipeline derives durable decisions
    only from portable digests; that convention is load-bearing for
    every oracle in the catalog.)  Pure map-side expressions."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang"))
        ).alias("h_composite"),
    )


@query(
    "fn_regex_family",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(
                      regexp_extract_all(substring(text, 1, 60), '[0-9]+'),
                      ','), '') AS all_numbers,
           CAST(len(regexp_extract_all(substring(text, 1, 120), '[A-Za-z]+'))
                AS INT) AS n_words,
           regexp_extract(text, '([a-z]+)([0-9]+)', 2) AS first_tail_digits,
           regexp_replace(substring(text, 1, 50), '[0-9]+', '#', 'g')
             AS numbers_masked,
           regexp_matches(text, '(data|model|train)') AS mentions_ml,
           CAST(CASE WHEN regexp_matches(substring(text, 1, 30), '^[A-Z]')
                     THEN 1 ELSE 0 END AS INT) AS starts_upper
    FROM documents
    """,
)
def fn_regex_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family beyond the single extract/replace in
    fn_string_family: extract-ALL (array, emitted as a ','-joined
    string — final schemas carry only scalar columns so every harness
    can sort/hash them; the join is positional, no reorder), match
    counting,
    group selection, global replacement, boolean matching, and an
    anchored class test — the text-wrangling surface every cleaning
    pipeline leans on.  Patterns stay inside the POSIX-class subset
    where Java (Spark) and RE2-style (DuckDB) dialects agree
    character-for-character; everything is map-side whole-stage
    codegen, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all(
                F.substring("text", 1, 60), F.lit("[0-9]+"), 0
            ),
            ",",
        ).alias("all_numbers"),
        F.size(
            F.regexp_extract_all(
                F.substring("text", 1, 120), F.lit("[A-Za-z]+"), 0
            )
        )
        .cast("int")
        .alias("n_words"),
        F.regexp_extract("text", r"([a-z]+)([0-9]+)", 2).alias(
            "first_tail_digits"
        ),
        F.regexp_replace(F.substring("text", 1, 50), "[0-9]+", "#").alias(
            "numbers_masked"
        ),
        F.col("text").rlike("(data|model|train)").alias("mentions_ml"),
        F.when(F.substring("text", 1, 30).rlike("^[A-Z]"), 1)
        .otherwise(0)
        .cast("int")
        .alias("starts_upper"),
    )


@query(
    "fn_url_family",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             (CASE doc_id % 3 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://'
                              ELSE 'HTTPS://' END)
             || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
             || source || '.Example.COM/a/B/'
             || CAST(doc_id % 7 AS VARCHAR)
             || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
             || (CASE WHEN doc_id % 4 = 0
                      THEN '?utm_source=feed&ref=rss' ELSE '' END)
               AS url
      FROM documents
    )
    SELECT doc_id,
           lower(regexp_extract(url, '^[A-Za-z]+://([^/]+)', 1)) AS host,
           regexp_extract(url, '^[A-Za-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param,
           CAST(length(regexp_extract(url, '^[A-Za-z]+://[^/]+(/[^?#]*)', 1))
                - length(replace(
                    regexp_extract(url, '^[A-Za-z]+://[^/]+(/[^?#]*)', 1),
                    '/', '')) AS INT) AS path_depth
    FROM raw
    """,
)
def fn_url_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar-extraction family — the parse side of
    text_url_canonicalize: host (lowercased authority), path (query/
    fragment stripped), a named query parameter, and path depth, all
    as portable regexp_extract expressions (Spark's parse_url is a
    Java-only builtin with no DuckDB mirror, so the contract is the
    regex, which both engines evaluate identically on these
    patterns).  Pure map-side codegen over the same deterministic
    messy-URL synthesis both engines share."""
    d = load_table(spark, sf_dir, "documents")
    scheme = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("http://"))
        .when(F.col("doc_id") % 3 == 1, F.lit("https://"))
        .otherwise(F.lit("HTTPS://"))
    )
    url = F.concat(
        scheme,
        F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example.COM/a/B/"),
        (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("?utm_source=feed&ref=rss"))
        .otherwise(F.lit("")),
    )
    path = F.regexp_extract(url, "^[A-Za-z]+://[^/]+(/[^?#]*)", 1)
    return d.select(
        "doc_id",
        F.lower(F.regexp_extract(url, "^[A-Za-z]+://([^/]+)", 1)).alias(
            "host"
        ),
        path.alias("path"),
        F.regexp_extract(url, "[?&]ref=([^&#]*)", 1).alias("ref_param"),
        (F.length(path) - F.length(F.regexp_replace(path, "/", "")))
        .cast("int")
        .alias("path_depth"),
    )


# ------------------------------------- deterministic content UUIDs


@query(
    "fn_uuid_deterministic",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5('ctgov:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    )
    SELECT doc_id,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-3'
             || substr(hx, 14, 3) || '-'
             || substr('89ab',
                       CAST(CAST(('0x' || substr(hx, 17, 1)) AS INT) % 4
                            AS INT) + 1, 1)
             || substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS uuid3
    FROM h
    """,
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed UUIDs (RFC 4122 version 3:
    md5 of namespace+name with the version nibble forced to '3' and
    the variant nibble to 8/9/a/b) — the stable record identity every
    multi-source ingestion pipeline needs: re-ingesting the same
    document yields the same id on any engine, any partitioning, any
    day.  Pure map-side string algebra over md5 (the portable-hash
    convention), zero shuffle, zero UDF — at 100 TB this is free
    inside whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("ctgov:"), F.col("doc_id").cast("string")))
    h = d.select("doc_id", hx.alias("hx"))
    variant = F.substring(
        F.lit("89ab"),
        (
            F.conv(F.substring("hx", 17, 1), 16, 10).cast("int") % 4 + 1
        ).cast("int"),
        1,
    )
    return h.select(
        "doc_id",
        F.concat(
            F.substring("hx", 1, 8),
            F.lit("-"),
            F.substring("hx", 9, 4),
            F.lit("-3"),
            F.substring("hx", 14, 3),
            F.lit("-"),
            variant,
            F.substring("hx", 18, 3),
            F.lit("-"),
            F.substring("hx", 21, 12),
        ).alias("uuid3"),
    )
