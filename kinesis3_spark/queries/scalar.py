"""Scalar-function surface (SURVEY.md §2b rows "Scalar: string" through
"conditional"): string ops, URL codec, cookie/map parsing, date/time, math,
array/map HOFs, JSON — each family exercised by one oracle-checked query.

Reference parity: these generalize the reference's row-level transforms
(src/kinesis3/utils.clj F5-F18, src/kinesis3/db.clj:136-173). Everything
stays a JVM-side Column expression — the whole module is scan-stage compute
with zero shuffles beyond what the query itself needs, so at 100 TB these
run at full codegen throughput inside the Parquet scan stage.

Float discipline: never ROUND an
interpolated/averaged 2-decimal value; transcendentals (sqrt/ln) round at
4-6 dp where boundary collisions are measure-zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import parse_cookies
from ..functions.text import tokenize
from .relational import _t
from . import query


# --------------------------------------------------------------------------
# Strings: substring/split/trim/case/pad/regexp/concat_ws/format_string
# (reference F5, F13, F18 — core.clj:153, utils.clj:17-19, db.clj:143).
# --------------------------------------------------------------------------
@query(
    "scalar_string_suite",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                   AS up,
           LOWER(p_type)                                   AS low,
           SUBSTRING(p_name, 1, 4)                         AS sub4,
           string_split(p_name, ' ')[1]                    AS first_word,
           regexp_extract(p_brand, '#(\\d+)', 1)           AS brand_num,
           regexp_replace(p_name, 'widget', 'gizmo')       AS repl,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')           AS padded,
           CONCAT_WS('|', p_brand, p_type)                 AS joined,
           printf('%s-%03d', p_type, p_size)               AS formatted,
           LENGTH(p_name)                                  AS name_len,
           TRIM('  ' || p_name || ' ')                     AS trimmed
    FROM part
    WHERE p_partkey % 7 = 0
    """,
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("low"),
        F.substring("p_name", 1, 4).alias("sub4"),
        F.get(F.split("p_name", " "), 0).alias("first_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "widget", "gizmo").alias("repl"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.format_string("%s-%03d", F.col("p_type"), F.col("p_size")).alias("formatted"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
    )


# --------------------------------------------------------------------------
# URL codec (reference F6 `<urlsafe-str`/`>urlsafe-str`, utils.clj:79-85).
# DuckDB 1.0 has no url_encode, so the oracle hand-encodes the known charset
# of p_brand||' '||p_type (letters, digits, '#', ' '): '#'→%23, ' '→'+'.
# --------------------------------------------------------------------------
@query(
    "scalar_url_codec",
    oracle="""
    SELECT p_partkey,
           replace(replace(p_brand || ' ' || p_type, '#', '%23'), ' ', '+') AS enc,
           p_brand || ' ' || p_type                                         AS roundtrip
    FROM part
    WHERE p_partkey % 5 = 0
    """,
)
def scalar_url_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") % 5 == 0)
    raw = F.concat_ws(" ", "p_brand", "p_type")
    return p.select(
        "p_partkey",
        F.url_encode(raw).alias("enc"),
        F.url_decode(F.url_encode(raw)).alias("roundtrip"),
    )


# --------------------------------------------------------------------------
# Cookie-string → map parsing (reference F5 parse-cookies, db.clj:136-144)
# + map_keys/element_at surface. The cookie is built from row data with a
# URL-encoded value ('#'→%23), so the parse must both split and decode.
# --------------------------------------------------------------------------
@query(
    "scalar_cookie_map",
    oracle="""
    SELECT c_custkey,
           c_mktsegment                   AS seg_val,
           CAST(c_custkey AS VARCHAR)     AS cust_val,
           c_name                         AS name_val,
           3                              AS n_keys,
           'cust,name,seg'                AS keys_sorted
    FROM customer
    WHERE c_custkey % 11 = 0
    """,
)
def scalar_cookie_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 11 == 0)
    cookie = F.concat(
        F.lit("seg="), F.col("c_mktsegment"),
        F.lit(";cust="), F.col("c_custkey").cast("string"),
        F.lit("; name="), F.replace(F.col("c_name"), F.lit("#"), F.lit("%23")),
    )
    m = parse_cookies(cookie)
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg_val"),
        F.element_at(m, "cust").alias("cust_val"),
        F.element_at(m, "name").alias("name_val"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


# --------------------------------------------------------------------------
# Date/time scalars (reference F7-F12, utils.clj:21-63, core.clj:109-111):
# component extraction, truncation, formatting, epoch round-trips, date
# arithmetic. Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday.
# --------------------------------------------------------------------------
@query(
    "scalar_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                    AS y,
           month(o_orderdate)                                   AS mo,
           day(o_orderdate)                                     AS d,
           quarter(o_orderdate)                                 AS q,
           dayofweek(o_orderdate) + 1                           AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate, '%Y/%m/%d %H:%M')              AS fmt,
           CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)            AS epoch_s,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')  AS plus30,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
    FROM orders
    WHERE o_orderkey % 13 = 0
    """,
)
def scalar_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 13 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("y"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("d"),
        F.quarter(d).cast("bigint").alias("q"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(d, "yyyy/MM/dd HH:mm").alias("fmt"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date")).cast("bigint").alias("days_to_98"),
    )


# --------------------------------------------------------------------------
# Math scalars (reference ms→s scaling core.clj:78-80, Math/floor
# utils.clj:61). Transcendentals rounded at 4 dp (measure-zero boundary
# risk); exact ops (abs/mod/floor/ceil/sign) compared as integers.
# --------------------------------------------------------------------------
@query(
    "scalar_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_orderkey - 3000)                      AS iabs,
           CAST(FLOOR(l_extendedprice) AS BIGINT)      AS fl,
           CAST(CEIL(l_extendedprice) AS BIGINT)       AS ce,
           l_orderkey % 7                              AS md,
           ROUND(POW(l_quantity, 2), 4)                AS pw,
           ROUND(SQRT(l_extendedprice), 4)             AS sq,
           ROUND(LN(1 + l_extendedprice), 4)           AS lg,
           CAST(SIGN(l_discount - 0.05) AS BIGINT)     AS sg,
           GREATEST(l_tax, l_discount)                 AS gr,
           LEAST(l_tax, l_discount)                    AS ls
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 97 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_orderkey") - 3000).alias("iabs"),
        F.floor("l_extendedprice").cast("bigint").alias("fl"),
        F.ceil("l_extendedprice").cast("bigint").alias("ce"),
        (F.col("l_orderkey") % 7).alias("md"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("pw"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
        F.round(F.log(F.lit(1) + F.col("l_extendedprice")), 4).alias("lg"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("sg"),
        F.greatest("l_tax", "l_discount").alias("gr"),
        F.least("l_tax", "l_discount").alias("ls"),
    )


# --------------------------------------------------------------------------
# Array HOFs over tokenized documents (reference F15-F17, utils.clj:73-108):
# size/element_at/contains/distinct/sort/slice/transform/filter/join.
# --------------------------------------------------------------------------
@query(
    "scalar_array_suite",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'),
                                '\\s+') AS toks
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           len(toks)                                               AS n_toks,
           toks[1]                                                 AS first_tok,
           toks[-1]                                                AS last_tok,
           CAST(list_contains(toks, 'spark') AS INT)               AS has_spark,
           len(list_distinct(toks))                                AS n_uniq,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS top3_sorted,
           len(list_filter(toks, t -> length(t) > 4))              AS n_long,
           array_to_string(list_transform(toks[1:3], t -> upper(t)), '-') AS upper3
    FROM t
    """,
)
def scalar_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",").alias("top3_sorted"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("bigint").alias("n_long"),
        F.array_join(F.transform(F.slice(toks, 1, 3), F.upper), "-").alias("upper3"),
    )


# --------------------------------------------------------------------------
# JSON scalars over events.props (reference F1-F4, db.clj:148-172,
# utils.clj:65-71): path extraction, typed parse, re-serialization, and
# NULL on missing path (reference nil-propagation).
# --------------------------------------------------------------------------
@query(
    "scalar_json_suite",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER)  AS k_int,
           CAST(to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INTEGER))) AS VARCHAR) AS rebuilt,
           json_extract_string(props, '$.missing')      AS missing
    FROM events
    WHERE event_id % 3 = 0
    """,
)
def scalar_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").where(F.col("event_id") % 3 == 0)
    k_int = F.from_json("props", "k INT").getField("k")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.to_json(F.struct(k_int.alias("k"))).alias("rebuilt"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@query(
    "scalar_try_error_safe",
    oracle="""
    SELECT count(*)::BIGINT AS n,
           count(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                      ELSE floor(o_orderkey * 100.0 / (o_orderkey % 7)) END
                )::BIGINT AS n_div_ok,
           CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                         ELSE floor(o_orderkey * 100.0 / (o_orderkey % 7)) END)
                AS BIGINT) AS div_sum,
           count(TRY_CAST(o_orderstatus AS INTEGER))::BIGINT AS n_cast_ok,
           count(TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INTEGER))::BIGINT
             AS n_cast_num
    FROM orders
    """,
)
def scalar_try_error_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-safe scalar tier (Spark try_divide / try_cast — ANSI-mode
    pipelines keep running on bad rows instead of failing the job, the
    behavior a 100 TB ingest needs when one record in a billion is
    malformed): division by zero and non-numeric casts become NULLs and
    are counted, never raised. The oracle spells the same semantics with
    CASE/TRY_CAST. div outputs are floor-quantized integers (exact parity;
    quotient's distance from integer boundaries >= 1/6)."""
    o = _t(spark, sf_dir, "orders")
    div = F.floor(
        F.try_divide(F.col("o_orderkey") * 100.0, F.col("o_orderkey") % 7)
    )
    return o.agg(
        F.count("*").cast("bigint").alias("n"),
        F.count(div).cast("bigint").alias("n_div_ok"),
        F.sum(div).cast("bigint").alias("div_sum"),
        F.count(F.col("o_orderstatus").try_cast("int")).cast("bigint").alias("n_cast_ok"),
        F.count(F.col("o_orderkey").cast("string").try_cast("int"))
        .cast("bigint")
        .alias("n_cast_num"),
    )


@query(
    "scalar_timezone_daily_counts",
    oracle="""
    -- interpret the naive wall-clock as UTC EXPLICITLY (never via the
    -- session TimeZone, which the harness does not pin on the DuckDB
    -- side), then convert to New_York local
    SELECT strftime(timezone('America/New_York', timezone('UTC', ts)),
                    '%Y-%m-%d') AS ny_day,
           event_type, count(*)::BIGINT AS n
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def scalar_timezone_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-aware daily rollup: events counted by their
    America/New_York LOCAL date (the "business day in the customer's
    timezone" semantics every UTC-stored warehouse must re-derive —
    UTC evenings land on the previous NY day, which this corpus
    exercises at every -05:00 day boundary). Spark's from_utc_timestamp
    against DuckDB's ICU timezone(): both resolve the same IANA zone,
    and the corpus' January window sits entirely in EST so the offset is
    constant — no DST-transition edge is sampled (a DST-boundary corpus
    would additionally pin the tzdb agreement)."""
    ev = _t(spark, sf_dir, "events")
    ny = F.from_utc_timestamp(F.col("ts"), "America/New_York")
    return (
        ev.groupBy(
            F.date_format(ny, "yyyy-MM-dd").alias("ny_day"), "event_type"
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("ny_day", "event_type")
    )
