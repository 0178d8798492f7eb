"""Scalar function battery (SURVEY.md §2b, generalizing O6's string
pipeline — the reference's only scalar ops are lower/translate/split in
w7/src/python/map.py:9-18; here they are JVM built-ins inside
whole-stage codegen, plus the date/math/array/map/json/hash families its
typed successor needs).

Determinism: cross-engine hash functions differ (Spark Murmur3/xxhash64
are engine-specific), so the oracle-checked hash query uses standard
digests (md5/sha2) and identity-modulo bucketing; the engine-native
fast-hash path lives in operators/hash_partition.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


@register(
    "scalar_string",
    oracle="""
SELECT
  p_partkey,
  lower(p_name) AS name_lower,
  upper(p_brand) AS brand_upper,
  trim('  ' || p_name || ' ') AS name_trimmed,
  substring(p_name, 1, 5) AS name_prefix,
  concat_ws('|', p_brand, p_type) AS brand_type,
  translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
  length(p_name) AS name_len,
  replace(p_name, ' ', '_') AS name_snake,
  left(p_type, 3) AS type3,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
""".strip(),
    tags=("scalar", "string"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery on part.p_name — the vectorized versions
    of the reference mapper's per-line ops."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.left(F.col("p_type"), F.lit(3)).alias("type3"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@register(
    "scalar_date",
    oracle="""
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(month(o_orderdate) AS INTEGER) AS o_month,
  CAST(dayofmonth(o_orderdate) AS INTEGER) AS o_day,
  CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
  CAST(o_orderdate AS DATE) + 30 AS due_date,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_epoch_end,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  last_day(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
WHERE o_orderkey % 10 = 0
""".strip(),
    tags=("scalar", "date"),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery on orders.o_orderdate."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("o_day"),
        F.quarter("o_orderdate").cast("int").alias("o_quarter"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long").alias(
            "days_to_epoch_end"
        ),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
    )


@register(
    "scalar_math",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  round(l_extendedprice) AS price_rounded,
  abs(l_extendedprice - 1000) AS dist_1000,
  ceil(l_quantity / 7) AS qty_ceil,
  floor(l_quantity / 7) AS qty_floor,
  pow(l_discount, 2) AS disc_sq,
  sqrt(l_extendedprice) AS price_sqrt,
  l_orderkey % 32 AS bucket,
  greatest(l_quantity, 25.0) AS qty_hi,
  least(l_quantity, 25.0) AS qty_lo,
  CAST(sign(l_extendedprice - 5000) AS BIGINT) AS above_5k
FROM lineitem
WHERE l_orderkey % 7 = 0
""".strip(),
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery.  sqrt/pow(x,2) are correctly-rounded IEEE ops, so
    exact cross-engine; transcendental libm calls (log/exp) are excluded
    from the hash-checked surface (last-ulp variance across libms)."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 7 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice")).alias("price_rounded"),
        F.abs(F.col("l_extendedprice") - 1000).alias("dist_1000"),
        F.ceil(F.col("l_quantity") / 7).cast("double").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).cast("double").alias("qty_floor"),
        F.pow(F.col("l_discount"), 2).alias("disc_sq"),
        F.sqrt(F.col("l_extendedprice")).alias("price_sqrt"),
        (F.col("l_orderkey") % 32).alias("bucket"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
        F.signum(F.col("l_extendedprice") - 5000).cast("bigint").alias("above_5k"),
    )


@register(
    "scalar_array_map",
    oracle="""
SELECT
  p_partkey,
  string_split(p_name, ' ') AS words,
  len(string_split(p_name, ' ')) AS n_words,
  list_contains(string_split(p_name, ' '), 'red') AS has_red,
  list_sort(string_split(p_name, ' ')) AS words_sorted,
  string_split(p_name, ' ')[1] AS first_word,
  string_split(p_name, ' ')[-1] AS last_word,
  list_aggregate(string_split(p_name, ' '), 'string_agg', '-') AS rejoined
FROM part
""".strip(),
    tags=("scalar", "array"),
)
def scalar_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface: split/size/contains/sort/element_at/join.
    (Map-typed values stay internal — cross-engine map wire formats
    differ — so the check compares arrays and scalars.)"""
    p = table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        words.alias("words"),
        F.size(words).alias("n_words"),
        F.array_contains(words, "red").alias("has_red"),
        F.sort_array(words).alias("words_sorted"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_join(words, "-").alias("rejoined"),
    )


@register(
    "scalar_json",
    oracle="""
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  json_extract_string(props, '$.missing') AS missing_field,
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
FROM events
""".strip(),
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (semi-structured column — the
    typed escape hatch the reference's string-only model lacked)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        (k % 10).alias("k_bucket"),
    )


@register(
    "scalar_variant",
    oracle="""
SELECT
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
  count(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_sum,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_max
FROM events
GROUP BY 1
""".strip(),
    tags=("scalar", "json", "variant"),
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingest + typed shredding (Spark 4): ``parse_json`` turns
    events.props into the binary semi-structured type ONCE, then every
    downstream access is a ``variant_get`` typed path read — the scale
    contrast to scalar_json above, whose ``get_json_object`` re-parses
    the JSON STRING at every extraction (at 100 TB a hot semi-
    structured column is parsed once at ingest and shredded, not
    N times per row per query).  The aggregate runs on the extracted
    bigints, so the oracle is the plain JSON-string arithmetic — a
    hash match proves the binary encode/decode is value-faithful.
    DuckDB has no VARIANT; its JSON lane is the semantic oracle."""
    e = table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        e.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.max("k").cast("bigint").alias("k_max"),
        )
    )


@register(
    "scalar_hash",
    oracle="""
SELECT
  o_orderkey,
  md5(CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus) AS row_md5,
  sha256(o_orderpriority) AS prio_sha,
  o_orderkey % 16 AS shard
FROM orders
WHERE o_orderkey % 5 = 0
""".strip(),
    tags=("scalar", "hash"),
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard digests + modulo sharding — the observable generalization
    of the reference's ``std::hash(key) % R`` shuffle routing
    (workerimpl.cc:254).  Engine-native fast hashes (xxhash64/Murmur3)
    are used internally (operators/hash_partition.py) but are not
    cross-engine comparable."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    return o.select(
        "o_orderkey",
        F.md5(
            F.concat(F.col("o_orderkey").cast("string"), F.lit(":"), F.col("o_orderstatus"))
        ).alias("row_md5"),
        F.sha2(F.col("o_orderpriority"), 256).alias("prio_sha"),
        (F.col("o_orderkey") % 16).alias("shard"),
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT p_partkey,
       coalesce(nullif(p_brand, 'Brand#11'), 'OTHER') AS brand_or_other,
       greatest(p_retailprice, 1000.0) AS floor_price,
       least(p_size, 25) AS capped_size,
       CASE WHEN p_size IS NULL THEN -1
            WHEN p_size < 10 THEN 0
            ELSE 1 END AS size_band,
       nullif(p_size, 0) AS size_nz
FROM part
""".strip(),
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-plumbing battery: nullif/coalesce/greatest/least and a
    null-aware CASE.  These are the expressions that make three-valued
    logic explicit in a pipeline — all evaluate inside whole-stage
    codegen, so null handling costs nothing over the raw column."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#11")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.greatest(F.col("p_retailprice"), F.lit(1000.0)).alias("floor_price"),
        F.least(F.col("p_size"), F.lit(25)).alias("capped_size"),
        F.when(F.col("p_size").isNull(), -1)
        .when(F.col("p_size") < 10, 0)
        .otherwise(1)
        .alias("size_band"),
        F.nullif(F.col("p_size"), F.lit(0)).alias("size_nz"),
    )


@register(
    "scalar_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey << 3 AS shl3,
       o_orderkey >> 2 AS shr2,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 255) AS xored,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount,
       ~o_orderkey AS inverted
FROM orders
""".strip(),
    tags=("scalar", "bitwise"),
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery on int64 keys: shifts, and/or/xor, population
    count, complement — the primitives under bitmap indexes, bloom
    filters, and the reference's own hash routing (std::hash(key) % R,
    workerimpl.cc:254).  All whole-stage-codegen JVM expressions; both
    engines use arithmetic (sign-propagating) right shift on signed
    64-bit values, which the oracle equality proves."""
    k = F.col("o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(255)).alias("xored"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("inverted"),
    )


@register(
    "scalar_datetime_parts",
    oracle="""
SELECT event_id,
       CAST(quarter(ts) AS INTEGER) AS q,
       CAST(weekofyear(ts) AS INTEGER) AS iso_week,
       CAST(dayofyear(ts) AS INTEGER) AS doy,
       CAST(dayofweek(ts) AS INTEGER) AS dow0,
       CAST(hour(ts) AS INTEGER) AS h,
       CAST(minute(ts) AS INTEGER) AS m,
       ts + INTERVAL 90 MINUTE AS ts_plus_90m,
       CAST(date_trunc('day', ts) AS DATE) AS day
FROM events
""".strip(),
    tags=("scalar", "datetime"),
)
def scalar_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-part extraction + interval arithmetic battery on
    microsecond event timestamps.  The one cross-engine convention trap
    is day-of-week numbering — Spark's dayofweek is 1=Sunday, DuckDB's
    is 0=Sunday — normalized here to the 0-based convention; ISO week
    and day-of-year agree natively.  Interval addition stays in
    whole-stage codegen (no Python), and month addition (scalar_date's
    add_months) clamps to month-end identically in both engines."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("iso_week"),
        F.dayofyear("ts").alias("doy"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow0"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("m"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("ts_plus_90m"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    )


@register(
    "scalar_regex",
    # Patterns restricted to the Java-regex ∩ RE2 common subset
    # (character classes + bounded repetition; no backrefs/lookarounds,
    # which RE2 lacks) so both engines match identically.  DuckDB's
    # regexp_replace needs the 'g' flag to match Spark's replace-all
    # semantics — the classic cross-engine regex trap, pinned here.
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]{6,}')) AS n_long_words,
       regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word,
       len(regexp_extract_all(text, '[aeiou][aeiou]')) AS n_vowel_pairs,
       length(regexp_replace(text, '[aeiou]', '*', 'g')) AS replaced_len,
       len(string_split_regex(text, '[ ]+')) AS n_ws_tokens
FROM documents
""".strip(),
    tags=("scalar", "regex"),
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar battery over document text: count / extract /
    replace-all / split, all JVM codegen (never a Python UDF).  Scale
    note: regex evaluation is scan-side and embarrassingly parallel —
    the cost model is bytes scanned × pattern complexity, no shuffle at
    all (this query's plan is a bare Project over the file scan)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[a-z]{6,}")).alias("n_long_words"),
        F.regexp_extract("text", "([a-z]{6,})", 1).alias("first_long_word"),
        F.regexp_count("text", F.lit("[aeiou][aeiou]")).alias("n_vowel_pairs"),
        F.length(F.regexp_replace("text", "[aeiou]", "*")).alias("replaced_len"),
        F.size(F.split("text", "[ ]+")).alias("n_ws_tokens"),
    )
