"""Text analysis & corpus scoring (SURVEY.md §2.K4; split from
llm_ops.py in round 5, keys and behavior unchanged): token counting
(whitespace + BPE-ish regex), tf-idf, BM25, language-ID + confusion,
quality scoring, unigram-LM scoring + quality buckets, vocab/OOV
coverage, heavy hitters, n-grams, winnowing fingerprints + cross-doc
detection, inverted index, approx quantiles, and the end-to-end
pipeline composition.

Scale rules: everything token-level goes explode→groupBy (shuffle on
token/doc key) with map-side partial aggregation; the tokenize scan is
shared across consumers.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_tutorial_broadcast_spark.io import load, local_rows_df
from flink_tutorial_broadcast_spark.registry import query
from flink_tutorial_broadcast_spark.operators.llm_dedup import (
    _NEAR_DUP_LIMIT,
)


@query(
    "q_token_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
    FROM toks GROUP BY 1
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 corpus token frequencies (term + document frequency)."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_total"),
             F.countDistinct("doc_id").alias("n_docs"))
    )


@query(
    "q_token_counts_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_num_tokens
    FROM documents
    """,
)
def q_token_counts_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 BPE-ish regex token counting (word-ish / numeric-ish classes)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0))
        .alias("n_word_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0))
        .alias("n_num_tokens"),
    )


@query(
    "q_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 tf-idf, fully relational: tf = per-doc term count, idf =
    ln(N/df) with df(token) = COUNT(*) over tf's (doc_id, token) rows ≡
    countDistinct(doc_id) over raw tokens. N enters as a broadcast
    1-row aggregate instead of a driver-side count() action (r13), so
    building the query schedules no extra job and the plan is
    self-contained. Plan note (r13, measured): Catalyst prunes the
    unused tf value from the df branch, so its exchange stays a
    distinct-shaped one that cannot reuse tf's count-bearing exchange —
    the tokenize runs once per branch; a lazy localCheckpoint of tf
    that would physically share it measured SLOWER at sf0.1
    (materialization > the second small scan), and at cluster scale the
    equivalent staged write is the documented alternative. The df side
    is corpus-vocabulary sized (≪ corpus) so Spark broadcasts it under
    AQE at real scale."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.groupBy().count().withColumnRenamed("count", "__n_docs")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "token", "tf", "df",
                F.round(F.col("tf") * F.log(F.col("__n_docs").cast("double")
                                            / F.col("df")), 6).alias("tfidf"))
    )


@query(
    "q_lang_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY 1
    """,
)
def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 per-language corpus stats."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg(F.col("n_chars").cast("double")), 4)
             .alias("avg_chars"),
             F.countDistinct("source").alias("n_sources"))
    )


@query(
    "q_quality_score",
    oracle="""
    WITH stats AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_uniq,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('a', 'the'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens, n_uniq,
           ROUND(CAST(n_uniq AS DOUBLE) / n_tokens, 6) AS uniq_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
           ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len
    FROM stats
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 document quality scoring: token counts, lexical diversity,
    stopword ratio, mean token length — the standard pre-training filters."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin("a", "the")))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq"),
        F.round(n_uniq.cast("double") / n_tokens, 6).alias("uniq_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stop_ratio"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 6)
        .alias("avg_token_len"),
    )


# Marker lexicons for the language-ID heuristic. The fixture vocabulary is
# shared across langs (verified), so accuracy is not the point — the
# operator IS the point: inline lexicon broadcast-joined against exploded
# tokens, argmax per doc with deterministic tiebreak.
_LANG_MARKERS: list[tuple[str, str]] = [
    ("en", "the"), ("en", "a"), ("en", "value"), ("en", "fast"),
    ("de", "der"), ("de", "und"), ("de", "table"), ("de", "merge"),
    ("es", "el"), ("es", "la"), ("es", "data"), ("es", "row"),
    ("fr", "le"), ("fr", "et"), ("fr", "query"), ("fr", "scan"),
    ("zh", "zh"), ("zh", "window"), ("zh", "batch"), ("zh", "join"),
]

_MARKERS_SQL = (
    "(VALUES " + ", ".join(f"('{lg}', '{tok}')" for lg, tok in _LANG_MARKERS)
    + ") AS markers(m_lang, m_token)"
)


@query(
    "q_lang_id",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), scores AS (
      SELECT t.doc_id, markers.m_lang AS m_lang, COUNT(*) AS score
      FROM toks t JOIN {_MARKERS_SQL} ON t.token = markers.m_token
      GROUP BY 1, 2
    ), ranked AS (
      SELECT doc_id, m_lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, m_lang) AS rn
      FROM scores
    )
    SELECT d.doc_id,
           coalesce(r.m_lang, 'unknown') AS predicted_lang,
           coalesce(r.score, 0) AS marker_hits
    FROM documents d
    LEFT JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 language-ID by marker-lexicon vote: explode tokens, broadcast-join
    the lexicon, argmax marker hits per doc (ties broken by lang code).
    Docs with zero marker hits classify as 'unknown'."""
    d = load(spark, sf_dir, "documents")
    markers = local_rows_df(
        spark, _LANG_MARKERS, "m_lang string, m_token string")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    scores = (
        toks.join(F.broadcast(markers), toks.token == markers.m_token)
        .groupBy("doc_id", "m_lang")
        .agg(F.count("*").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "m_lang")
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "m_lang", "score")
    )
    return (
        d.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("m_lang", F.lit("unknown")).alias("predicted_lang"),
            F.coalesce("score", F.lit(0)).cast("bigint").alias("marker_hits"),
        )
    )


@query(
    "q_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 document fingerprint: md5 over the sorted distinct token set —
    an order-insensitive content signature (catches shuffled duplicates
    that exact-hash dedup misses)."""
    toks = F.array_sort(F.array_distinct(F.split("text", " ")))
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id",
                F.md5(F.concat_ws(" ", toks)).alias("fingerprint"))
    )


@query(
    "q_winnow_fingerprint",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 6
    ),
    g AS (
      SELECT doc_id, len(w) - 2 AS n_grams,
             unnest(generate_series(1, len(w) - 2)) AS pos,
             unnest(list_transform(generate_series(1, len(w) - 2),
                    i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' '
                          || w[i+2]), 1, 12))::BIGINT)) AS h
      FROM docs
    ),
    wins AS (
      SELECT doc_id, n_grams, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM g
    ),
    sel AS (
      SELECT DISTINCT doc_id, n_grams, fp
      FROM wins WHERE pos <= n_grams - 3
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           COUNT(*) AS n_fp, CAST(SUM(fp) AS BIGINT) AS fp_checksum
    FROM sel GROUP BY 1, 2
    """,
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every word trigram, slide a w=4 window over the
    per-document hash sequence, select each window's MINIMUM — the
    positional fingerprint set that GUARANTEES any shared run of
    ≥ w+k-1 tokens between two documents shares at least one selected
    fingerprint (the detection property shingle sampling lacks). Hash is
    the portable md5-hex-prefix (48-bit) used by q_cms_frequency, so
    both engines select identical fingerprints; ties are broken by
    value (distinct-min variant — fixture hashes are collision-free at
    48 bits). Emits per-doc fingerprint count + integer checksum. Plan:
    one tokenize scan → posexplode → a doc-PARTITIONED ordered window
    (parallel across docs, no unpartitioned WindowExec) → per-doc
    distinct+agg; docs shorter than k+w-1 grams have no full window and
    are excluded up front on both engines."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 6)
        .select("doc_id", "w", (F.size("w") - 2).alias("n_grams"))
    )
    idx = F.sequence(F.lit(1), F.col("n_grams"))
    tri = F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at("w", i),
                                   F.element_at("w", i + 1),
                                   F.element_at("w", i + 2)))
    hashes = F.transform(
        tri, lambda gstr: F.conv(F.substring(F.md5(gstr), 1, 12), 16, 10)
        .cast("long"))
    g = docs.select(
        "doc_id", "n_grams",
        F.posexplode(hashes).alias("pos0", "h"),
    ).select("doc_id", "n_grams", (F.col("pos0") + 1).alias("pos"), "h")
    win = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(Window.currentRow, 3))
    sel = (
        g.withColumn("fp", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - 3)
        .select("doc_id", "n_grams", "fp").distinct()
    )
    return (
        sel.groupBy("doc_id", F.col("n_grams").cast("long").alias("n_grams"))
        .agg(F.count("*").alias("n_fp"),
             F.sum("fp").cast("long").alias("fp_checksum"))
        .select("doc_id", "n_grams", "n_fp", "fp_checksum")
    )


@query(
    "q_pipeline_e2e",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source, text, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS uniq_ratio
      FROM documents
    ), quality AS (
      SELECT * FROM scored
      WHERE n_tokens >= 5 AND uniq_ratio >= 0.3 AND lang IN ('en', 'de', 'es')
    ), deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ), sampled AS (
      SELECT * FROM deduped
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(uniq_ratio), 6) AS avg_uniq_ratio
    FROM sampled GROUP BY lang, source
    """,
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE Catalyst plan: quality
    scoring → quality+language filter → exact dedup (first survivor per
    content hash) → deterministic ~80% sample → per-(lang, source) corpus
    stats. Every stage is a narrow transformation or a single keyed
    shuffle; nothing materializes in between — at 100 TB this runs as one
    pipelined job with two exchanges (dedup window, final agg)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id", "lang", "source", "text", "n_chars",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
        .alias("uniq_ratio"),
    )
    quality = scored.filter(
        (F.col("n_tokens") >= 5) & (F.col("uniq_ratio") >= 0.3)
        & F.col("lang").isin("en", "de", "es"))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (quality.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1))
    sampled = deduped.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd")
    return (
        sampled.groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.round(F.avg("uniq_ratio"), 6).alias("avg_uniq_ratio"))
    )


@query(
    "q_ngram_counts",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS trigram
      FROM docs WHERE len(toks) >= 3
    )
    SELECT trigram, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
    FROM grams GROUP BY 1 HAVING COUNT(*) >= 3
    """,
)
def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 corpus n-gram statistics: trigram term+document frequencies
    (floor 3) — the n-gram LM / contamination-check primitive. Same
    explode→groupBy shape as token counts; the shuffle carries grams."""
    # split ONCE into a column; the Generate above this Project keeps it
    # from collapsing back, so the lambda's element_at calls index an
    # already-computed array instead of re-splitting the text per access
    # (measured 4 s → <1 s at sf0.1)
    words = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
    )
    idx = F.sequence(F.lit(1), F.size("w") - 2)
    tri = F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at("w", i),
                                   F.element_at("w", i + 1),
                                   F.element_at("w", i + 2)))
    return (
        words.select("doc_id", F.explode(tri).alias("trigram"))
        .groupBy("trigram")
        .agg(F.count("*").alias("n_total"),
             F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_total") >= 3)
    )


@query("q_approx_quantiles")  # rows-only: sketch values are engine-specific
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-adjacent: approx_percentile — the single-pass mergeable-sketch
    quantile for 100 TB (exact q_quantiles is the oracle-checked twin).
    Since round 12 the 1%-relative tolerance is WITNESSED in-engine:
    `within_1pct_of_exact` compares each sketch quantile against the
    exact F.percentile computed in the same agg (same scan, one
    shuffle), so the driver's rows-only pass sees the bound.

    r14 (VERDICT_r13 item 2): the sketch quantiles are emitted as
    SCALAR columns (approx_p25/p50/p75), not one array column — the
    oracle harness's pandas canonicalization cannot hash ndarray
    cells (CORRECTNESS_r13 err: "unhashable type: numpy.ndarray"),
    so an array output made the key un-verifiable. Same sketch, same
    witness, one value per column."""
    li = load(spark, sf_dir, "lineitem")
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_percentile("l_extendedprice", qs, F.lit(10000))
             .alias("approx_p"),
             F.percentile("l_extendedprice", qs).alias("__exact_p"))
        .select(
            "l_returnflag",
            F.element_at("approx_p", 1).alias("approx_p25"),
            F.element_at("approx_p", 2).alias("approx_p50"),
            F.element_at("approx_p", 3).alias("approx_p75"),
            F.forall(
                F.zip_with("approx_p", "__exact_p",
                           lambda a, e: F.abs(a - e) / e < 0.01),
                lambda ok: ok).alias("within_1pct_of_exact"))
    )


@query(
    "q_inverted_index",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT token,
           COUNT(*) AS df,
           string_agg(doc_id, ',' ORDER BY doc_id) AS postings
    FROM pairs GROUP BY token
    HAVING COUNT(*) <= 0.5 * (SELECT COUNT(*) FROM documents)
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 inverted index: token -> sorted posting list of doc_ids, kept
    for RARE tokens (document frequency <= 50% of the corpus — the ones
    band search and exact-dup lookup actually use; stopword-frequency
    tokens are noise and would dominate the output). The threshold is
    relative so the query is non-degenerate at every SF.

    Scale: one explode + distinct + groupBy(token) — a single shuffle on
    the token key; the corpus size joins in as a broadcast scalar. The
    df cap bounds every materialized posting array; the full-corpus
    variant would range-partition tokens and write postings as bucketed
    parquet instead of collecting arrays.
    """
    docs = load(spark, sf_dir, "documents")
    total = docs.agg(F.count("*").alias("n_docs"))
    pairs = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    return (
        pairs.groupBy("token")
        .agg(F.count("*").alias("df"),
             F.array_join(F.sort_array(F.collect_list("doc_id")), ",")
             .alias("postings"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("df") <= 0.5 * F.col("n_docs"))
        .drop("n_docs")
    )


@query(
    "q_unigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS total FROM toks)
    SELECT t.doc_id AS doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(ln(v.cnt) - ln(n.total)), 4) AS avg_logprob
    FROM toks t JOIN vocab v USING (token) CROSS JOIN n
    GROUP BY 1
    """,
)
def q_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ unigram language-model scoring — the CCNet-style quality
    signal: train a unigram LM on the corpus itself (token → ln p) and
    score each document by its mean token log-probability (a monotone
    transform of perplexity). Low scorers are boilerplate/garbage, high
    scorers are stereotyped text; both tails get filtered or
    down-weighted in training-data curation.

    Plan: one tokenize scan feeds BOTH the vocab aggregate and the
    scoring join (Catalyst reuses the exchange); the corpus total enters
    as a broadcast 1-row aggregate, so ln(total) is a literal-like
    column, never a driver-side collect. The scoring join is token-keyed
    (same shuffle family as q_tfidf). At 100 TB the vocab is
    Zipf-bounded: broadcast the head (covers ~95 % of token mass) and
    shuffle-join only the rare tail — same two-tier shape as the dedup
    family."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("total"))
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log("cnt") - F.log("total")), 4)
            .alias("avg_logprob"),
        )
    )


@query(
    "q_vocab_coverage",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1
      ) ORDER BY cnt DESC, token ASC LIMIT 1000
    )
    SELECT t.doc_id AS doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY 1
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: fix the top-1000 corpus
    tokens as the vocabulary (deterministic tie-break: count DESC, token
    ASC) and measure each document's out-of-vocabulary rate — the
    standard pre-flight check before committing a tokenizer/vocab to a
    training run (high-OOV slices inflate token counts and degrade
    compression). The 1000-row vocab is an F.broadcast LEFT join, so the
    exploded fact side never shuffles for the membership test. The vocab
    top-k is sort+limit, which Spark executes as TakeOrderedAndProject —
    a TWO-PHASE top-k (per-partition top-1000, then a top-1000 of the
    candidates), never funneling the whole vocabulary through one
    partition; determinism comes from the same (cnt DESC, token ASC)
    key."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    vocab = (
        toks.groupBy("token").agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(1000)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long").alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                .cast("double") / F.count("*"), 6).alias("oov_rate"),
        )
    )


@query(
    "q_lm_quality_bucket",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS total FROM toks),
    scored AS (
      SELECT t.doc_id, ROUND(AVG(ln(v.cnt) - ln(n.total)), 4) AS lp
      FROM toks t JOIN vocab v USING (token) CROSS JOIN n
      GROUP BY 1
    ),
    bucketed AS (
      SELECT d.lang, s.lp,
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY s.lp DESC, s.doc_id ASC) AS b
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS bucket,
           COUNT(*) AS n_docs,
           ROUND(AVG(lp), 4) AS avg_lp
    FROM bucketed GROUP BY 1, 2
    """,
)
def q_lm_quality_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail quality partitioning: per language,
    rank documents by unigram-LM score and cut into terciles — 'head' is
    the most-fluent third that curation pipelines keep at full weight,
    'tail' gets aggressively filtered. Determinism is engineered:
    the LM score is rounded BEFORE ranking and ties break on doc_id, so
    NTILE assigns identically on any engine/partitioning. Builds on
    q_unigram_lm_score's plan (tokenize scan reused for vocab + scoring)
    plus one per-lang window and a tiny final aggregate."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("total"))
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.round(F.avg(F.log("cnt") - F.log("total")), 4).alias("lp"))
    )
    from pyspark.sql import Window
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    bucketed = (
        scored.join(docs, "doc_id")
        .withColumn(
            "b",
            F.ntile(3).over(
                Window.partitionBy("lang")
                .orderBy(F.col("lp").desc(), F.col("doc_id").asc())),
        )
    )
    return (
        bucketed.groupBy(
            "lang",
            F.when(F.col("b") == 1, "head")
            .when(F.col("b") == 2, "middle")
            .otherwise("tail").alias("bucket"),
        )
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg("lp"), 4).alias("avg_lp"))
    )


@query(
    "q_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    sample_toks AS (
      SELECT token FROM toks
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
    ),
    st AS (SELECT COUNT(*) AS n_sample FROM sample_toks),
    cand AS (
      SELECT token FROM sample_toks CROSS JOIN st
      GROUP BY token, n_sample
      HAVING COUNT(*) >= 0.001 * n_sample
    ),
    total AS (SELECT COUNT(*) AS n_corpus FROM toks)
    SELECT t.token AS token, COUNT(*) AS n_total,
           ROUND(CAST(COUNT(*) AS DOUBLE) / total.n_corpus, 6) AS share
    FROM toks t JOIN cand USING (token) CROSS JOIN total
    GROUP BY t.token, total.n_corpus
    HAVING CAST(COUNT(*) AS DOUBLE) / total.n_corpus >= 0.002
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter mining by sample-then-verify — the two-tier shape
    that replaces a full-vocabulary groupBy when the key space is huge
    (URLs, n-grams, user agents at 100 TB): tier 1 counts tokens in a
    deterministic 25 % document sample (md5-prefix, same idiom as
    q_dataset_split — seed-free, partition-stable) and keeps candidates
    above HALF the final threshold (0.1 % of sample mass vs 0.2 % final
    — the safety margin that makes a miss require 2× sample
    under-representation); tier 2 exactly counts ONLY the candidate set
    over the full corpus and applies the real threshold. The candidate
    list is small by construction (≤ 1000 tokens can each hold ≥0.1 %),
    so tier 2's semi-join is a broadcast and the full corpus never
    shuffles on token. Oracle runs the identical two-tier algorithm, so
    the check is exact."""
    # three consumers (sample count, corpus total, final verify join) —
    # materialize the tokenize scan once (lazy checkpoint). At 100 TB
    # trade cache for recompute per cluster memory; the algorithm is
    # unchanged either way.
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .localCheckpoint(eager=False)
    )
    sample = toks.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "4"
    )
    n_sample = sample.agg(F.count("*").alias("n_sample"))
    cand = (
        sample.crossJoin(F.broadcast(n_sample))
        .groupBy("token", "n_sample")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 0.001 * F.col("n_sample"))
        .select("token")
    )
    total = toks.agg(F.count("*").alias("n_corpus"))
    return (
        toks.join(F.broadcast(cand), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("token", "n_corpus")
        .agg(F.count("*").alias("n_total"))
        .filter(F.col("n_total").cast("double") / F.col("n_corpus") >= 0.002)
        .select(
            "token", "n_total",
            F.round(F.col("n_total").cast("double") / F.col("n_corpus"), 6)
            .alias("share"),
        )
    )


@query(
    "q_bm25",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), corp AS (
      SELECT COUNT(*) AS n_docs,
             (SELECT AVG(CAST(dl AS DOUBLE)) FROM dl) AS avgdl
      FROM documents
    )
    SELECT tf.doc_id AS doc_id, tf.token AS token, tf.tf AS tf, df.df AS df,
           ROUND(
             ln(1.0 + (CAST(corp.n_docs AS DOUBLE) - df.df + 0.5)
                      / (df.df + 0.5))
             * ((tf.tf * 2.2)
                / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corp.avgdl))),
             6) AS bm25
    FROM tf
    JOIN df ON tf.token = df.token
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN corp
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 BM25 (Okapi, k1=1.2, b=0.75) — the retrieval-grade upgrade of
    q_tfidf: term saturation (tf no longer linear) and document-length
    normalization against the corpus average. Same plan family as tf-idf
    — one tokenize scan feeding tf / df / dl aggregates — plus a 1-row
    broadcast corpus dimension (n_docs, avgdl); the df and dl sides are
    vocabulary- and doc-count-sized, ≪ the posting list, so AQE
    broadcasts them at scale. The arithmetic is written in the identical
    operation order on both engines, so IEEE doubles agree and the
    oracle hash-matches at 6 decimals."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corp = (
        load(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(dl.agg(
            F.avg(F.col("dl").cast("double")).alias("avgdl"))))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
    )
    sat = (F.col("tf") * 2.2) / (
        F.col("tf")
        + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corp))
        .select("doc_id", "token", "tf", "df",
                F.round(idf * sat, 6).alias("bm25"))
    )


@query(
    "q_lang_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), scores AS (
      SELECT t.doc_id, markers.m_lang AS m_lang, COUNT(*) AS score
      FROM toks t JOIN {_MARKERS_SQL} ON t.token = markers.m_token
      GROUP BY 1, 2
    ), ranked AS (
      SELECT doc_id, m_lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, m_lang) AS rn
      FROM scores
    ), pred AS (
      SELECT d.doc_id, d.lang AS gold,
             coalesce(r.m_lang, 'unknown') AS predicted
      FROM documents d
      LEFT JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
    )
    SELECT gold, predicted, COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY gold), 6) AS row_share
    FROM pred GROUP BY 1, 2
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine classifier evaluation: confusion matrix of the marker
    language-ID predictor (q_lang_id) against the fixture's gold lang
    label, with per-gold-row shares (recall lives on the diagonal).
    Model-eval-as-a-query is a first-class pipeline need — grading a
    cheap classifier's drift per corpus slice without exporting data.
    Plan: q_lang_id's broadcast-lexicon vote + one (gold, predicted)
    aggregate and a per-gold window; output is |langs|² rows, driver-safe
    at any scale."""
    d = load(spark, sf_dir, "documents")
    markers = local_rows_df(
        spark, _LANG_MARKERS, "m_lang string, m_token string")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    scores = (
        toks.join(F.broadcast(markers), toks.token == markers.m_token)
        .groupBy("doc_id", "m_lang")
        .agg(F.count("*").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "m_lang")
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("m_lang").alias("predicted"))
    )
    pred = (
        d.select("doc_id", F.col("lang").alias("gold"))
        .join(best, "doc_id", "left")
        .withColumn("predicted", F.coalesce("predicted", F.lit("unknown")))
    )
    counts = pred.groupBy("gold", "predicted").agg(F.count("*").alias("n"))
    wg = Window.partitionBy("gold")
    return counts.select(
        "gold", "predicted", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wg), 6)
        .alias("row_share"),
    )


@query(
    "q_winnow_crossdoc",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE doc_id < {_NEAR_DUP_LIMIT}
        AND len(string_split(text, ' ')) >= 6
    ),
    g AS (
      SELECT doc_id, len(w) - 2 AS n_grams,
             unnest(generate_series(1, len(w) - 2)) AS pos,
             unnest(list_transform(generate_series(1, len(w) - 2),
                    i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' '
                          || w[i+2]), 1, 12))::BIGINT)) AS h
      FROM docs
    ),
    sel AS (
      SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id, pos, n_grams,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        FROM g
      ) WHERE pos <= n_grams - 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM sel GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT s.doc_a, s.doc_b, s.n_shared,
           ROUND(CAST(s.n_shared AS DOUBLE)
                 / LEAST(sa.n_fp, sb.n_fp), 6) AS overlap
    FROM shared s
    JOIN sizes sa ON sa.doc_id = s.doc_a
    JOIN sizes sb ON sb.doc_id = s.doc_b
    WHERE s.n_shared >= 3
    """,
)
def q_winnow_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document near-dup detection over winnowing fingerprints —
    the MOSS detection step that q_winnow_fingerprint's selection
    exists for: documents sharing ≥ 3 selected fingerprints are
    reported with their containment-style overlap (shared / smaller
    fingerprint set). Because winnowing guarantees any shared token run
    of ≥ w+k−1 survives into both documents' fingerprint sets, recall
    for long verbatim overlaps is structural, while the fingerprint
    stream the join touches is only ~2/(w+1) the size of the full
    shingle stream — the index-size advantage over shingle-Jaccard
    candidate generation. One fingerprint-keyed self-join (shared-key
    candidates, never all pairs) + two broadcast size dims. Bounded
    oracle twin like q_dedup_near."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < _NEAR_DUP_LIMIT)
                & (F.size(F.split("text", " ")) >= 6))
        .select("doc_id", F.split("text", " ").alias("w"))
        .select("doc_id", "w", (F.size("w") - 2).alias("n_grams"))
    )
    idx = F.sequence(F.lit(1), F.col("n_grams"))
    tri = F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at("w", i),
                                   F.element_at("w", i + 1),
                                   F.element_at("w", i + 2)))
    hashes = F.transform(
        tri, lambda gstr: F.conv(F.substring(F.md5(gstr), 1, 12), 16, 10)
        .cast("long"))
    g = docs.select(
        "doc_id", "n_grams", F.posexplode(hashes).alias("pos0", "h"),
    ).select("doc_id", "n_grams", (F.col("pos0") + 1).alias("pos"), "h")
    win = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(Window.currentRow, 3))
    sel = (
        g.withColumn("fp", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - 3)
        .select("doc_id", "fp").distinct()
        .localCheckpoint(eager=False)  # join sides + size dim
    )
    sizes = sel.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a, b = sel.alias("a"), sel.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_fp").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_fp").alias("nb"))
    return (
        shared.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", "n_shared",
                F.round(F.col("n_shared").cast("double")
                        / F.least("na", "nb"), 6).alias("overlap"))
    )


_RETRIEVE_TERMS = ("spark", "table", "window", "hash")
_RETRIEVE_TERMS_SQL = "(VALUES " + ", ".join(
    f"('{t}')" for t in _RETRIEVE_TERMS) + ") AS qt(token)"


@query(
    "q_retrieve_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), qtoks AS (
      SELECT t.doc_id, t.token FROM toks t
      JOIN {_RETRIEVE_TERMS_SQL} ON t.token = qt.token
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM qtoks GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM qtoks GROUP BY 1
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), corp AS (
      SELECT COUNT(*) AS n_docs,
             (SELECT AVG(CAST(dl AS DOUBLE)) FROM dl) AS avgdl
      FROM documents
    ), scored AS (
      SELECT tf.doc_id,
             COUNT(*) AS n_terms,
             CAST(SUM(CAST(FLOOR(
               ln(1.0 + (CAST(corp.n_docs AS DOUBLE) - df.df + 0.5)
                        / (df.df + 0.5))
               * ((tf.tf * 2.2)
                  / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corp.avgdl)))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS score_ppm
      FROM tf
      JOIN df ON tf.token = df.token
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN corp
      GROUP BY tf.doc_id
    )
    SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, score_ppm
    FROM scored ORDER BY score_ppm DESC, doc_id LIMIT 10
    """,
)
def q_retrieve_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 ranked retrieval — the query-serving half of q_bm25: a fixed
    multi-term query is scored against the corpus and the top-10 docs
    returned. The retrieval pruning happens FIRST: the broadcast
    query-term join cuts the posting stream to query terms before any
    tf/df aggregation (the inverted-index access path — at 100 TB only
    the query terms' postings are ever shuffled; dl/avgdl come from the
    shared tokenize scan). Per-term BM25 contributions are floored to
    integer ppm BEFORE summation, so the doc score is an
    order-insensitive integer sum — cross-engine exact, no float-sum
    ordering hazard — and the top-10 cut (score DESC, doc_id) is
    deterministic. Global top-k plans as TakeOrderedAndProject."""
    qterms = local_rows_df(
        spark, [(t,) for t in _RETRIEVE_TERMS], "token string")
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    qtoks = toks.join(F.broadcast(qterms), "token")
    tf = qtoks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = qtoks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corp = (
        load(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(dl.agg(
            F.avg(F.col("dl").cast("double")).alias("avgdl"))))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
    )
    sat = (F.col("tf") * 2.2) / (
        F.col("tf")
        + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corp))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_terms"),
             F.sum(F.floor(idf * sat * 1000000.0).cast("long"))
             .alias("score_ppm"))
        .orderBy(F.desc("score_ppm"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "q_bigram_lm_score",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), big AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM docs, UNNEST(range(1, len(toks))) AS t(i)
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1
    ), vocab AS (
      SELECT COUNT(DISTINCT token) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    ), scored AS (
      SELECT b.doc_id,
             COUNT(*) AS n_bigrams,
             CAST(SUM(CAST(FLOOR(
               -ln((CAST(c2.c12 AS DOUBLE) + 1.0) / (c1.c1 + vocab.v))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS nll_sum_ppm
      FROM big b
      JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN vocab
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, nll_sum_ppm,
           nll_sum_ppm // n_bigrams AS mean_nll_ppm
    FROM scored
    """,
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 bigram LM scoring — the perplexity-filter signal one order up
    from q_unigram_lm_score: P(w2|w1) = (C(w1,w2)+1)/(C(w1)+V) (add-1
    smoothing, corpus-trained), each document scored by its mean
    per-bigram negative log-probability. Per-bigram −ln P is floored to
    integer ppm BEFORE summation, so the doc score is an
    order-insensitive integer (the q_retrieve_bm25 discipline) and the
    integer-div mean is exact cross-engine.

    Scale: the bigram stream shuffles once on (w1, w2) for counts and
    once back for scoring; both count dims are vocabulary-bounded (≪
    corpus) so AQE broadcasts them; V is a 1-row broadcast. The same
    plan trains on one corpus and scores another by swapping the count
    inputs — the held-out-perplexity gate of a real quality pipeline."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    big = docs.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(toks, 1, size(toks) - 1), (w, i) -> "
            "struct(w AS w1, element_at(toks, i + 2) AS w2))")).alias("b")
    ).select("doc_id", "b.w1", "b.w2")
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .agg(F.countDistinct("token").alias("v"))
    )
    nll = -F.log((F.col("c12").cast("double") + 1.0)
                 / (F.col("c1") + F.col("v")))
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.sum(F.floor(nll * 1000000.0).cast("long"))
             .alias("nll_sum_ppm"))
        .select("doc_id", "n_bigrams", "nll_sum_ppm",
                F.expr("nll_sum_ppm div n_bigrams").alias("mean_nll_ppm"))
    )
