"""Scalar-function surface (SURVEY.md §2.7) as column expressions.

The reference applies these transformations in driver-side Python
(path splitting, f-string concat, JSON parsing, timestamp formatting —
dataIngestionUtils.py:40,210,235,245,261); here they are JVM-side
column functions inside whole-stage codegen, vectorized over the data
path instead of one Python object at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import T
from .registry import query


@query(
    "fn_string_ops",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_u,
           CAST(length(text) AS INT) AS n_len,
           split_part(text, ' ', 1) AS first_tok,
           concat_ws('-', lang, source) AS tag,
           substr(text, 1, 10) AS prefix
    FROM documents
    """,
    tags=("function",),
)
def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/concat/substr/case ops (reference §2.7: path splitting
    `source_path.split('/')[5]`, f-string concat)."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.length("text").cast("int").alias("n_len"),
        F.element_at(F.split("text", " "), 1).alias("first_tok"),
        F.concat_ws("-", "lang", "source").alias("tag"),
        F.substring("text", 1, 10).alias("prefix"),
    )


@query(
    "fn_regex_ops",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels,
           regexp_extract(text, '(table|index|query)', 1) AS first_kw
    FROM documents
    """,
    tags=("function",),
)
def fn_regex_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_replace / regexp_extract (reference does string.replace
    surgery at dataIngestionUtils.py:261)."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (F.length("text") - F.length(F.regexp_replace("text", "[aeiou]", "")))
        .cast("int")
        .alias("n_vowels"),
        F.regexp_extract("text", "(table|index|query)", 1).alias("first_kw"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    tags=("function", "json"),
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (reference parses JSON driver-side,
    dataIngestion.py:15, dataIngestionUtils.py:110)."""
    return T(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "fn_timestamp_ops",
    oracle="""
    SELECT event_id,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_hour,
           CAST(year(CAST(ts AS TIMESTAMP)) AS INT) AS y,
           CAST(month(CAST(ts AS TIMESTAMP)) AS INT) AS m,
           CAST(dayofmonth(CAST(ts AS TIMESTAMP)) AS INT) AS d,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d_str
    FROM events
    """,
    tags=("function", "timestamp"),
)
def fn_timestamp_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp truncation/extraction/formatting (reference §2.7:
    strftime/strptime at dataIngestionUtils.py:235,245)."""
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("ts_hour"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        F.date_format("ts", "yyyy-MM-dd").alias("d_str"),
    )


@query(
    "fn_math_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_d,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
           sqrt(l_quantity) AS sqrt_q,
           l_extendedprice / l_quantity AS unit_price
    FROM lineitem
    """,
    tags=("function", "math"),
)
def fn_math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions (absent from the reference — §2.7 'no
    math beyond none'); all codegen'd JVM intrinsics."""
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceil_p"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_p"),
        F.sqrt("l_quantity").alias("sqrt_q"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )


@query(
    "fn_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
    """,
    tags=("function",),
)
def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregate."""
    o = T(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(F.count(F.lit(1)).alias("n"))


@query(
    "fn_null_handling",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS st_closed_only,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st
    FROM orders
    """,
    tags=("function", "null"),
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif / coalesce (reference's null-coalesce branches,
    dataIngestionUtils.py:126-129,189-192)."""
    o = T(spark, sf_dir, "orders")
    st_closed = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        st_closed.alias("st_closed_only"),
        F.coalesce(st_closed, F.lit("OPEN")).alias("st"),
    )


@query(
    "fn_base64_roundtrip",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 48))) AS b64,
           decode(from_base64(to_base64(encode(substr(text, 1, 48))))) AS roundtrip
    FROM documents
    """,
    tags=("function", "binary"),
)
def fn_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 encode/decode (reference decodes base64 secrets,
    dataIngestionUtils.py:114)."""
    d = T(spark, sf_dir, "documents")
    payload = F.encode(F.substring("text", 1, 48), "UTF-8")
    return d.select(
        "doc_id",
        F.base64(payload).alias("b64"),
        F.decode(F.unbase64(F.base64(payload)), "UTF-8").alias("roundtrip"),
    )


@query(
    "fn_array_map_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS max_val,
           list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS sum_vals,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
    tags=("function", "array"),
)
def fn_array_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over ArrayType(Float) — size /
    element_at / transform+aggregate / filter, all JVM-side.  The
    per-row sequential fold matches DuckDB's list_sum evaluation
    order, so even the float sum is exact."""
    e = T(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_max(dbl).cast("double").alias("max_val"),
        F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x).alias("sum_vals"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("int").alias(
            "n_positive"
        ),
    )


@query(
    "fn_bitwise_ops",
    oracle="""
    SELECT event_id,
           xor(event_id, user_id) AS x,
           event_id & 255 AS lo_byte,
           event_id | 4096 AS with_flag,
           CAST(event_id << 3 AS BIGINT) AS shifted,
           CAST(bit_count(event_id) AS INT) AS popcount
    FROM events WHERE event_id < 2000
    """,
    tags=("fn",),
)
def fn_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: xor / and / or / shift / popcount —
    the flag-mask and hash-mix primitives (the LSH family builds on
    exactly these).  Pure codegen projection."""
    ev = T(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("x"),
        F.col("event_id").bitwiseAND(F.lit(255)).alias("lo_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.shiftleft(F.col("event_id"), 3).cast("long").alias("shifted"),
        F.bit_count(F.col("event_id")).cast("int").alias("popcount"),
    )


@query(
    "fn_url_ops",
    oracle="""
    SELECT doc_id,
           source || '.example.org' AS host,
           '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
           CAST(n_chars AS BIGINT) AS chars_param,
           substr(replace(text, ' ', '+'), 1, 30) AS enc_head,
           TRUE AS roundtrip_ok
    FROM documents
    """,
    tags=("function", "string"),
)
def fn_url_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar surface: synthesize a deterministic URL per document
    (https://{source}.example.org/docs/{lang}/{doc_id}?chars={n}&
    lang={lang}), then parse it back with parse_url (HOST, PATH, and
    typed QUERY-parameter extraction) and roundtrip the document text
    through url_encode/url_decode.  The corpus text is strictly
    [a-z0-9 ] (asserted by the oracle's own encoding), so the
    form-encoded text equals the space→'+' rewrite and the oracle can
    reproduce the ENCODED BYTES, not just a boolean — parse_url and
    the codec are value-hash-pinned.  All expressions are codegen'd
    scalar functions over one projection — no shuffle."""
    d = T(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?chars="),
        F.col("n_chars").cast("string"),
        F.lit("&lang="),
        F.col("lang"),
    )
    enc = F.url_encode(F.col("text"))
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("chars"))
        .cast("bigint")
        .alias("chars_param"),
        F.substring(enc, 1, 30).alias("enc_head"),
        (F.url_decode(enc) == F.col("text")).alias("roundtrip_ok"),
    )
