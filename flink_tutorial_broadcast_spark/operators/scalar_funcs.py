"""Scalar function surface (SURVEY.md §2.I).

The reference's "functions" are arbitrary Scala bodies inside
``MapFunction``/``FilterFunction``; the engine's equivalent is the built-in
``pyspark.sql.functions`` families — JVM-side, codegen'd, never Python.
Each query exercises one family end-to-end against the fixtures with a
DuckDB-parity formulation (dialect deltas noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_u,
           lower(p_brand) AS brand_l,
           length(p_name) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           substr(p_name, 1, 6) AS name_pfx,
           trim(p_name) AS name_trim,
           regexp_extract(p_name, '^[a-z]+', 0) AS first_word,
           len(string_split(p_name, ' ')) AS n_words,
           replace(p_name, ' ', '_') AS name_snake,
           CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS is_red
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 string family: case/length/concat/substr/trim/regex/split/replace."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.lower("p_brand").alias("brand_l"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 6).alias("name_pfx"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).alias("is_red"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           year(l_shipdate) AS ship_year,
           month(l_shipdate) AS ship_month,
           day(l_shipdate) AS ship_day,
           dayofweek(l_shipdate) + 1 AS ship_dow,
           date_trunc('day', l_shipdate) AS ship_day_ts,
           datediff('day', CAST(l_shipdate AS DATE), DATE '1998-12-31')
               AS days_to_eoy,
           CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 date/time family. Dialect deltas handled oracle-side: DuckDB
    dayofweek is 0=Sunday (Spark 1=Sunday → +1); epoch() vs unix_timestamp
    (both UTC because the session timezone is pinned)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        F.dayofmonth("l_shipdate").alias("ship_day"),
        F.dayofweek("l_shipdate").alias("ship_dow"),
        F.date_trunc("day", "l_shipdate").alias("ship_day_ts"),
        F.datediff(F.lit("1998-12-31").cast("date"),
                   F.col("l_shipdate").cast("date")).alias("days_to_eoy"),
        F.unix_timestamp("l_shipdate").alias("ship_epoch"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT s_suppkey,
           ROUND(abs(s_acctbal), 2) AS abs_bal,
           CAST(floor(s_acctbal) AS BIGINT) AS floor_bal,
           CAST(ceil(s_acctbal) AS BIGINT) AS ceil_bal,
           ROUND(sqrt(abs(s_acctbal)), 6) AS sqrt_bal,
           ROUND(ln(abs(s_acctbal) + 1.0), 6) AS ln_bal,
           ROUND(log10(abs(s_acctbal) + 1.0), 6) AS log10_bal,
           ROUND(pow(s_acctbal / 1000.0, 2), 6) AS pow_bal,
           s_suppkey % 7 AS key_mod,
           CAST(sign(s_acctbal) AS BIGINT) AS bal_sign
    FROM supplier
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 math family (round/floor/ceil/sqrt/ln/log10/pow/mod/sign).

    pmod == % for the non-negative key domain; both engines' libm-backed
    sqrt/ln/log10 are correctly-rounded doubles, so ROUND(…,6) is safe.
    """
    s = load(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.round(F.abs(bal), 2).alias("abs_bal"),
        F.floor(bal).alias("floor_bal"),
        F.ceil(bal).alias("ceil_bal"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1.0), 6).alias("ln_bal"),
        F.round(F.log10(F.abs(bal) + 1.0), 6).alias("log10_bal"),
        F.round(F.pow(bal / 1000.0, 2), 6).alias("pow_bal"),
        F.pmod("s_suppkey", F.lit(7)).alias("key_mod"),
        F.signum(bal).cast("bigint").alias("bal_sign"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 100.0 THEN 'high'
                WHEN value >= 30.0 THEN 'mid'
                ELSE 'low' END AS tier,
           coalesce(nullif(event_type, 'view'), 'filtered') AS type_or_flag,
           ROUND(greatest(value, 50.0), 2) AS val_floor50,
           ROUND(least(value, 200.0), 2) AS val_cap200
    FROM events
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4 conditional/null family: CASE, coalesce∘nullif, greatest/least."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.when(v >= 100.0, "high").when(v >= 30.0, "mid").otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("view")),
                   F.lit("filtered")).alias("type_or_flag"),
        F.round(F.greatest(v, F.lit(50.0)), 2).alias("val_floor50"),
        F.round(F.least(v, F.lit(200.0)), 2).alias("val_cap200"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS n_dims,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 array family over the 64-dim embedding column: size/index/minmax/
    filter/transform/aggregate. float32 elements are cast to double BEFORE
    arithmetic on both sides so the products are bit-identical."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(emb).alias("n_dims"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max(emb).cast("double"), 6).alias("max_val"),
        F.round(F.array_min(emb).cast("double"), 6).alias("min_val"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           map(['type', 'tier'],
               [event_type, CASE WHEN value > 50.0 THEN 'hi' ELSE 'lo' END]
              )['type'][1] AS m_type,
           2 AS n_keys
    FROM events WHERE event_id < 1000
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6 map family: construct a map column, then extract scalars from it
    (raw map output is avoided — engines serialize maps differently, so the
    oracle compares the element_at/size results instead)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("tier"), F.when(F.col("value") > 50.0, "hi").otherwise("lo"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.k') AS k_str,
           CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                THEN 1 ELSE 0 END AS has_k,
           CAST(json_extract_string(props, '$.missing') AS INTEGER)
               AS missing_val
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7 JSON family over events.props (verified JSON strings):
    get_json_object / from_json / existence / missing-path null."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_val"),
        k.alias("k_str"),
        F.when(k.isNotNull(), 1).otherwise(0).alias("has_k"),
        F.get_json_object("props", "$.missing").cast("int")
        .alias("missing_val"),
    )


@query(
    "q_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           length(md5(text)) AS md5_len
    FROM documents
    """,
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I8 hash family with cross-engine-stable digests (md5/sha256).

    Engine-specific hashes (xxhash64, hash, monotonically_increasing_id)
    are exercised in the minhash/simhash operators (rows-only checks) —
    their values are Spark-internal by definition.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length(F.md5("text")).alias("md5_len"),
    )


@query(
    "q_null_semantics",
    oracle="""
    WITH nulled AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS et,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events WHERE event_id < 2000
    )
    SELECT et,
           COUNT(*) AS n_rows,
           COUNT(v) AS n_nonnull_v,
           ROUND(coalesce(SUM(v), 0), 2) AS sum_v,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_v,
           CAST(SUM(CASE WHEN et IS NOT DISTINCT FROM 'click'
                         THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_click
    FROM nulled GROUP BY et
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4/B4 null discipline, pinned cross-engine: NULL group keys form
    their own group, COUNT(col) skips nulls while COUNT(*) doesn't,
    SUM over all-null is NULL (coalesced), and null-safe equality
    (`eqNullSafe` ≡ IS NOT DISTINCT FROM) treats NULL as a value. These
    are exactly the semantics a 100 TB pipeline silently corrupts when an
    engine disagrees."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.when(F.col("event_id") % 7 == 0, None)
            .otherwise(F.col("event_type")).alias("et"),
            F.when(F.col("event_id") % 5 == 0, None)
            .otherwise(F.col("value")).alias("v"),
        )
    )
    return (
        ev.groupBy("et")
        .agg(F.count("*").alias("n_rows"),
             F.count("v").alias("n_nonnull_v"),
             F.round(F.coalesce(F.sum("v"), F.lit(0.0)), 2).alias("sum_v"),
             F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
             .alias("n_null_v"),
             F.sum(F.when(F.col("et").eqNullSafe("click"), 1).otherwise(0))
             .alias("nullsafe_click"))
    )


@query(
    "q_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(json_extract(props, '$.k')) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: `parse_json` once
    into the binary variant encoding, then typed `try_variant_get`
    extractions — the modern alternative to per-path string re-parsing
    (`get_json_object`, q_json_extract).

    At 100 TB the difference is material: variant parses each JSON
    document ONCE into a binary tree that all downstream extractions
    share, while N `get_json_object` calls re-parse the string N times.
    Shredded variant columns also participate in column pruning.
    """
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q_try_arith",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(value / NULLIF(CAST(json_extract_string(props, '$.k')
                                          AS INTEGER) - 87, 0) * 10000)
                AS BIGINT) AS safe_ratio_x1e4,
           value / 0.0 IS NULL AS div_zero_is_null
    FROM events
    """,
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (`try_divide`): NULL instead of exceptions
    or ±Inf on bad denominators — the ANSI-safe pipeline idiom so one
    poisoned record cannot kill a 100 TB job.

    Spark's try_divide ≡ portable `x / NULLIF(y, 0)`; the oracle also
    pins the float x/0.0 case (DuckDB errors on integer ÷0 but yields
    NULL-comparable Inf guards via division result checks — both sides
    emit the boolean through their own NULL semantics).
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        F.floor(F.try_divide(F.col("value"), k - F.lit(87)) * 10000)
         .cast("long").alias("safe_ratio_x1e4"),
        F.try_divide(F.col("value"), F.lit(0.0)).isNull()
         .alias("div_zero_is_null"),
    )


@query(
    "q_xml_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_back,
           event_id AS id_back
    FROM events
    """,
)
def q_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (`from_xml`, Spark 4 built-in): each event's
    payload is rendered to an XML envelope and parsed back with a typed
    schema — the synthesis+parse round-trip makes the oracle exact (the
    parsed values must equal the originals) without needing an XML
    engine on the DuckDB side.

    The same `from_xml(col, schema)` call is the ingestion path for
    feed-style XML corpora; schema-pinned like every other connector.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    xml = F.concat(
        F.lit("<e><id>"), F.col("event_id").cast("string"),
        F.lit("</id><k>"), F.coalesce(k.cast("string"), F.lit("")),
        F.lit("</k></e>"),
    )
    parsed = F.from_xml(xml, "id BIGINT, k INT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_back"),
        parsed.getField("id").alias("id_back"),
    )


@query(
    "q_array_setops",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id, COUNT(*) AS n_inter
      FROM tok a JOIN tok b ON b.doc_id = a.doc_id + 1 AND b.tok = a.tok
      GROUP BY a.doc_id
    )
    SELECT a.doc_id,
           COALESCE(i.n_inter, 0) AS n_inter,
           sa.n + sb.n - COALESCE(i.n_inter, 0) AS n_union,
           sa.n - COALESCE(i.n_inter, 0) AS n_except
    FROM documents a
    JOIN documents b ON b.doc_id = a.doc_id + 1
    JOIN sizes sa ON sa.doc_id = a.doc_id
    JOIN sizes sb ON sb.doc_id = b.doc_id
    LEFT JOIN inter i ON i.doc_id = a.doc_id
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 completion: array set algebra (`array_intersect` /
    `array_union` / `array_except`) proven against a fully relational
    oracle — consecutive documents compared as token SETS, reporting
    intersection/union/difference cardinalities (the building block of
    Jaccard similarity, here as exact array kernels instead of
    explode+join).

    The Spark side stays in array land (one self-join carrying two
    ~50-element arrays); the oracle recomputes the same cardinalities
    via DISTINCT unnest + equi-joins. Both sides dedupe tokens first,
    so bag-vs-set drift can't creep in.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    pairs = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
    return pairs.select(
        F.col("a.doc_id").alias("doc_id"),
        F.size(F.array_intersect("a.toks", "b.toks")).alias("n_inter"),
        F.size(F.array_union("a.toks", "b.toks")).alias("n_union"),
        F.size(F.array_except("a.toks", "b.toks")).alias("n_except"),
    )


@query(
    "q_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]{6,}')) AS n_long,
           COALESCE(regexp_extract_all(text, '[a-z]{6,}')[1], '')
             AS first_long
    FROM documents
    """,
)
def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 completion: `regexp_extract_all` — all matches, not just the
    first. Counts 6+-letter tokens per document and carries the first
    match (empty string when none — COALESCE'd identically on both
    engines). Pattern uses only portable character-class syntax, so the
    Java and RE2 engines agree. Pure map-side."""
    docs = load(spark, sf_dir, "documents")
    matches = F.regexp_extract_all("text", F.lit("[a-z]{6,}"), 0)
    return docs.select(
        "doc_id",
        F.size(matches).alias("n_long"),
        # F.get (0-based) returns NULL past the end; ANSI element_at throws
        F.coalesce(F.get(matches, 0), F.lit("")).alias("first_long"),
    )
