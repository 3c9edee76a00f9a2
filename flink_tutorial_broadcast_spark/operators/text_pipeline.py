"""Training-data text pipeline, stage 2: chunking, benchmark
decontamination, and corpus readability profiling over the `documents`
fixture — the preprocessing steps between raw ingestion (scans) and
dedup/quality filtering (llm_ops) in an LLM data pipeline.

All three are pure built-in-function plans (split / slice / sequence /
explode — JVM-side, whole-stage-codegen) with DuckDB oracles; no Python
UDFs anywhere in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load, local_rows_df
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_chunk_documents",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
      SELECT doc_id, w,
             unnest(generate_series(
               0, CAST(floor((len(w) - 1) / 30) AS INT))) AS chunk_no
      FROM words
    )
    SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
           array_to_string(w[chunk_no*30 + 1 : chunk_no*30 + 40], ' ')
             AS chunk_text,
           CAST(len(w[chunk_no*30 + 1 : chunk_no*30 + 40]) AS BIGINT)
             AS n_words
    FROM chunks
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 40-word chunks on a 30-word
    stride (10-word overlap), the standard shape for slicing long
    documents into training/context windows. Every word lands in ≥1
    chunk; the final chunk may be short (kept, like real pipelines
    keep tail chunks).

    Scale: embarrassingly parallel — split + sequence + posexplode are
    narrow per-row ops inside one codegen stage, no shuffle at all. The
    ~1.8× row/byte amplification (overlap) happens AFTER the scan, so
    input IO stays 1×; at 100 TB the only knob is output partition
    sizing (maxRecordsPerFile on the write)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w"))
    n_chunks = F.floor((F.size("w") - 1) / 30)
    chunk = F.expr("slice(w, chunk_no*30 + 1, 40)")
    return (
        docs.select(
            "doc_id", "w",
            F.explode(F.sequence(F.lit(0), n_chunks)).alias("chunk_no"))
        .select("doc_id",
                F.col("chunk_no").cast("bigint").alias("chunk_no"),
                F.array_join(chunk, " ").alias("chunk_text"),
                F.size(chunk).cast("bigint").alias("n_words"))
    )


@query(
    "q_decontaminate",
    oracle="""
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 4
    ),
    grams AS (
      SELECT doc_id, source,
             array_to_string(
               w[i : i + 3], ' ') AS g
      FROM (SELECT doc_id, source, w,
                   unnest(generate_series(1, len(w) - 3)) AS i
            FROM words)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
    SELECT doc_id, COUNT(DISTINCT g) AS n_shared_grams
    FROM grams
    WHERE source <> 'src0' AND g IN (SELECT g FROM bench)
    GROUP BY 1
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by n-gram overlap: treat source `src0`
    as the held-out benchmark and flag every other document sharing at
    least one 4-gram with it, with the count of distinct shared grams
    (the downstream pipeline drops or audits these). 4-grams because the
    fixture's 31-token vocabulary makes longer shingles near-unique to
    exact duplicates; real corpora use 8–13.

    Scale: gram explosion is a narrow in-stage op; the benchmark gram
    set aggregates to DISTINCT and (being a tiny fraction of the corpus)
    BROADCASTs into the candidate gram stream — the big side never
    shuffles. The final per-doc COUNT(DISTINCT) groups on doc_id. For a
    benchmark too large to broadcast, the same plan degrades gracefully
    to a shuffled semi-join on the gram hash."""
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "source", F.split("text", " ").alias("w"))
            .filter(F.size("w") >= 4))
    grams = docs.select(
        "doc_id", "source",
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 3),"
            " i -> array_join(slice(w, i, 4), ' '))")).alias("g"))
    bench = (grams.filter(F.col("source") == "src0")
             .select("g").distinct())
    return (
        grams.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )


@query(
    "q_readability",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_unique,
             (len(text) - (len(string_split(text, ' ')) - 1))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS awl
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(CAST(n_unique AS DOUBLE) / n_words), 4) AS avg_ttr,
           ROUND(AVG(awl), 4) AS avg_word_len
    FROM per_doc GROUP BY 1
    """,
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus readability profile per source: average type-token ratio
    (vocabulary richness) and average word length. Word length is
    derived arithmetically — (chars − spaces) / words — exact on the
    single-space-joined fixture, so both engines divide identical
    integers (no per-word explode needed).

    Scale: one narrow projection per doc + a 20-group aggregate; the
    map-side partial collapses everything before the exchange. This is
    the cheap full-corpus statistics pass that runs before expensive
    dedup stages."""
    docs = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_words = F.size(w)
    n_unique = F.size(F.array_distinct(w))
    awl = (F.length("text") - (n_words - 1)) / n_words.cast("double")
    per_doc = docs.select(
        "source", n_words.alias("n_words"), n_unique.alias("n_unique"),
        awl.alias("awl"))
    return (
        per_doc.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg(F.col("n_unique").cast("double")
                           / F.col("n_words")), 4).alias("avg_ttr"),
             F.round(F.avg("awl"), 4).alias("avg_word_len"))
    )


@query(
    "q_pack_sequences",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_words
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_words,
             SUM(n_words) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_end
      FROM w
    )
    SELECT doc_id, lang, n_words,
           CAST(cum_end - n_words AS BIGINT) AS tok_start,
           CAST((cum_end - n_words) // 256 AS BIGINT) AS seq_start,
           CAST((cum_end - 1) // 256 AS BIGINT) AS seq_end,
           CAST((cum_end - 1) // 256 - (cum_end - n_words) // 256 + 1
                AS BIGINT) AS n_seqs_spanned
    FROM c
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (concat-and-chunk): concatenate each
    language shard's token stream in doc_id order and cut it into
    fixed 256-token sequences; emit, per document, its token offset and
    the sequence range it lands in. This is the GPT-style packing step
    that turns a deduped corpus into fixed-length training rows —
    documents spanning a boundary continue into the next sequence
    (no padding waste).

    Per-lang partitioning keeps the running-sum window fully parallel
    (one shuffle on lang; production shards are exactly this: pack
    within a shard, never globally). All offsets are integer-exact, so
    the assignment is reproducible on any engine — the property a
    resumable data pipeline needs.
    """
    from pyspark.sql import Window
    w = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_words"))
    )
    win = (Window.partitionBy("lang").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = w.withColumn("cum_end", F.sum("n_words").over(win))
    return c.select(
        "doc_id", "lang", "n_words",
        (F.col("cum_end") - F.col("n_words")).alias("tok_start"),
        F.expr("(cum_end - n_words) div 256").alias("seq_start"),
        F.expr("(cum_end - 1) div 256").alias("seq_end"),
        F.expr("(cum_end - 1) div 256 - (cum_end - n_words) div 256 + 1")
        .alias("n_seqs_spanned"),
    )


@query(
    "q_repetition_profile",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), idx AS (
      SELECT doc_id, w,
             unnest(generate_series(1, len(w) - 1)) AS i
      FROM toks
    ), bg AS (
      SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram FROM idx
    ), bc AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2
    ), prof AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             COUNT(*) AS n_distinct,
             MAX(c) AS top_count
      FROM bc GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, n_distinct,
           CAST((1000000 * (n_bigrams - n_distinct)) // n_bigrams
                AS BIGINT) AS dup_ppm,
           CAST((1000000 * top_count) // n_bigrams AS BIGINT) AS top_ppm,
           CASE WHEN (1000000 * (n_bigrams - n_distinct)) // n_bigrams
                     < 200000
                 AND (1000000 * top_count) // n_bigrams < 100000
                THEN 1 ELSE 0 END AS keep
    FROM prof
    """,
)
def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition profile (Gopher-style quality rule):
    per-doc duplicate-bigram fraction and the share of the single most
    frequent bigram, plus the keep/drop gate (dup < 20%, top < 10%).
    Complements q_quality_score's unigram diversity — n-gram repetition
    catches boilerplate and degenerate loops that unigram stats miss.

    Bigrams are built in one narrow codegen pass (indexed `transform`
    over the split array — no self-join); the two-level aggregate
    (doc_id,bigram) → doc_id shuffles on doc_id once with map-side
    partials. Integer-ppm arithmetic keeps the gate engine-exact.
    Documents under two words have no bigrams and are excluded on both
    engines (nothing to score).
    """
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(slice(w, 1, size(w) - 1),"
                   " (x, i) -> concat(x, ' ', w[i + 1]))")
        ).alias("bigram"),
    )
    prof = (
        bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"),
             F.count("*").alias("n_distinct"),
             F.max("c").alias("top_count"))
    )
    dup_ppm = F.expr("(1000000 * (n_bigrams - n_distinct)) div n_bigrams")
    top_ppm = F.expr("(1000000 * top_count) div n_bigrams")
    return prof.select(
        "doc_id", "n_bigrams", "n_distinct",
        dup_ppm.alias("dup_ppm"),
        top_ppm.alias("top_ppm"),
        F.when((dup_ppm < 200_000) & (top_ppm < 100_000), 1)
        .otherwise(0).alias("keep"),
    )


@query(
    "q_text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')) AS norm_text,
           length(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g'))) AS n_chars_norm
    FROM documents
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization before exact/near dedup: casefold,
    strip non-alphanumerics to spaces, collapse whitespace runs, trim.
    Running this BEFORE q_dedup_exact/minhash is what turns
    byte-identical dedup into semantically-identical dedup — the first
    stage of every corpus pipeline.

    Pure map-side regex rewrites (portable character-class syntax; the
    DuckDB side needs the 'g' flag where Spark's regexp_replace is
    global by default). Zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +", " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("n_chars_norm"),
    )


@query(
    "q_split_leakage",
    oracle="""
    WITH tagged AS (
      SELECT md5(text) AS fp,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ), fps AS (
      SELECT fp, COUNT(DISTINCT split) AS n_splits, COUNT(*) AS n_docs
      FROM tagged GROUP BY fp
    )
    SELECT CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaked_fps,
           CAST(SUM(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END)
                AS BIGINT) AS n_leaked_docs,
           COUNT(*) AS n_distinct_texts
    FROM fps
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: count content fingerprints that appear
    in MORE THAN ONE split of q_dataset_split — the check that catches
    exact-duplicate contamination across train/val/test before a single
    GPU-hour is spent. Composes the deterministic split with md5 content
    fingerprinting; one (fp) aggregate, result is three numbers.

    At 100 TB: the same two-level aggregate, with the fingerprint
    shuffle being the only big exchange — and it's the SAME shuffle the
    exact-dedup pass already runs, so production pipelines fuse the two.
    """
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    tagged = docs.select(
        F.md5("text").alias("fp"),
        F.when(bucket < "cc", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )
    fps = tagged.groupBy("fp").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count("*").alias("n_docs"),
    )
    return fps.agg(
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("long").alias("n_leaked_fps"),
        F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs")).otherwise(0))
        .cast("long").alias("n_leaked_docs"),
        F.count("*").alias("n_distinct_texts"),
    )


@query(
    "q_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
      SELECT lang, tok, COUNT(*) AS f FROM tok GROUP BY lang, tok
    ), ranked AS (
      SELECT lang, f,
             row_number() OVER (PARTITION BY lang
                                ORDER BY f DESC, tok) AS r
      FROM freq
    )
    SELECT lang,
           ROUND(regr_slope(ln(f), ln(r)), 4) AS zipf_slope,
           COUNT(*) AS n_types
    FROM ranked GROUP BY lang
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: slope of log(frequency) vs log(rank)
    over the token vocabulary (natural corpora sit near −1; synthetic or
    deduplicated text drifts) — the corpus-health diagnostic that catches
    template spam and boilerplate floods at a glance.

    token count → rank (unique tiebreak on the token string) →
    regression moments; two keyed shuffles and a per-lang sort of the
    VOCABULARY (types, not tokens — bounded by distinct words). ln() can
    differ by 1 ulp across libm implementations; the regression
    aggregates over thousands of terms wash that out well below the
    4-dp rounding."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    freq = tok.groupBy("lang", "tok").agg(F.count("*").alias("f"))
    w = Window.partitionBy("lang").orderBy(F.col("f").desc(), "tok")
    ranked = freq.withColumn("r", F.row_number().over(w))
    return ranked.groupBy("lang").agg(
        F.round(F.regr_slope(F.log("f"), F.log("r")), 4)
        .alias("zipf_slope"),
        F.count("*").alias("n_types"),
    )


@query(
    "q_text_pipeline_e2e",
    oracle="""
    WITH norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
      FROM documents
    ), deduped AS (
      SELECT lang, md5(norm_text) AS fp,
             MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      FROM norm GROUP BY lang, md5(norm_text)
    ), tagged AS (
      SELECT lang,
             CASE WHEN substr(md5(CAST(keeper_id AS VARCHAR)), 1, 2) < 'cc'
                    THEN 'train'
                  WHEN substr(md5(CAST(keeper_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split,
             n_copies
      FROM deduped
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_dropped_dups
    FROM tagged GROUP BY lang, split
    """,
)
def q_text_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end text corpus pipeline in ONE Catalyst plan:
    normalize (casefold/punct/whitespace) → content-fingerprint dedup
    (survivor = smallest doc_id per normalized text) → deterministic
    split assignment → per-(lang, split) corpus accounting, including
    how many duplicates each cell dropped. The composition proof that
    the individual stages (q_text_normalize, q_dedup_exact,
    q_dataset_split) fuse without materialization barriers: one scan,
    one fingerprint shuffle, one tiny final aggregate — the whole
    corpus pipeline is two exchanges at any scale."""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +", " ",
        )
    )
    deduped = (
        docs.select("doc_id", "lang", F.md5(norm).alias("fp"))
        .groupBy("lang", "fp")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )
    bucket = F.substring(F.md5(F.col("keeper_id").cast("string")), 1, 2)
    tagged = deduped.select(
        "lang",
        F.when(bucket < "cc", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
        .alias("split"),
        "n_copies",
    )
    return tagged.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_copies") - 1).cast("long").alias("n_dropped_dups"),
    )


@query(
    "q_ngram_novelty",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
               AS g
      FROM docs WHERE len(toks) >= 3
    ), firsts AS (
      SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY 1
    )
    SELECT gr.doc_id AS doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN f.first_doc = gr.doc_id
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM grams gr JOIN firsts f ON gr.g = f.g
    GROUP BY 1
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty scoring — the curation signal for repetitive or
    template-generated content: a document's novelty is the fraction of
    its distinct trigrams whose FIRST corpus occurrence (min doc_id, a
    stand-in for ingestion order) is the document itself. Boilerplate
    re-ingests score near 0, fresh text near 1; the same statistic run
    incrementally gates what a crawl round adds to the training pool.
    Plan: one tokenize scan → distinct per-doc trigrams → the 'first
    seen' index as a gram-PARTITIONED unordered window MIN — ONE shuffle
    on the gram key computes first_doc in place (3.3× the agg+re-join
    form it replaced: no second shuffle of the gram stream, no join),
    then the per-doc rollup shuffles on doc_id. Both shuffles
    partial-aggregate map-side; per-gram groups are corpus-bounded
    (every doc holding the gram), the same cardinality the join form
    shuffled anyway."""
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
    grams = words.select(
        "doc_id", F.explode(F.array_distinct(tri)).alias("g"))
    return (
        grams.withColumn(
            "first_doc",
            F.min("doc_id").over(Window.partitionBy("g")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                  .otherwise(0)).cast("long").alias("n_novel"),
            F.round(
                F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                      .otherwise(0)).cast("double") / F.count("*"), 6)
            .alias("novelty"),
        )
    )


@query(
    "q_filter_funnel",
    oracle="""
    WITH staged AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             lang,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS uniq_ratio
      FROM documents
    ),
    flags AS (
      SELECT doc_id,
             (n_tokens >= 10)                          AS pass_len,
             (n_tokens >= 10 AND lang <> 'unknown')    AS pass_lang,
             (n_tokens >= 10 AND lang <> 'unknown'
              AND uniq_ratio >= 0.3)                   AS pass_quality
      FROM staged
    )
    SELECT stage, n_docs FROM (
      SELECT 'stage0_ingested' AS stage, COUNT(*) AS n_docs, 0 AS ord
      FROM flags
      UNION ALL
      SELECT 'stage1_length', CAST(SUM(CASE WHEN pass_len THEN 1 ELSE 0 END)
                                   AS BIGINT), 1
      FROM flags
      UNION ALL
      SELECT 'stage2_lang', CAST(SUM(CASE WHEN pass_lang THEN 1 ELSE 0 END)
                                 AS BIGINT), 2
      FROM flags
      UNION ALL
      SELECT 'stage3_quality',
             CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT), 3
      FROM flags
    ) ORDER BY ord
    """,
)
def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation filter funnel — the waterfall report every training-data
    pipeline publishes: how many documents survive each successive gate
    (length ≥ 10 tokens → known language → lexical-diversity ≥ 0.3).
    Gates are CUMULATIVE (a doc must pass all earlier stages), so the
    counts are monotone non-increasing and each step's drop is
    attributable to exactly one predicate. ONE scan computes every flag
    as a column; the funnel is a 4-row conditional aggregate — no
    per-stage rescans, which is the difference between one pass and K
    passes over 100 TB. Stage predicates are pure column expressions, so
    swapping in production gates (perplexity bands, PII hits, dedup
    survivors) keeps the plan shape identical."""
    toks = F.split("text", " ")
    staged = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        "lang",
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks)).alias("uniq_ratio"),
    )
    flags = staged.select(
        (F.col("n_tokens") >= 10).alias("pass_len"),
        ((F.col("n_tokens") >= 10) & (F.col("lang") != "unknown"))
        .alias("pass_lang"),
        ((F.col("n_tokens") >= 10) & (F.col("lang") != "unknown")
         & (F.col("uniq_ratio") >= 0.3)).alias("pass_quality"),
    )
    agg = flags.agg(
        F.count("*").alias("stage0_ingested"),
        F.sum(F.col("pass_len").cast("long")).alias("stage1_length"),
        F.sum(F.col("pass_lang").cast("long")).alias("stage2_lang"),
        F.sum(F.col("pass_quality").cast("long")).alias("stage3_quality"),
    )
    unpivoted = agg.unpivot(
        [], ["stage0_ingested", "stage1_length", "stage2_lang",
             "stage3_quality"],
        "stage", "n_docs")
    return unpivoted.orderBy("stage")


# ---------------------------------------------------------------------------
# BPE tokenizer training (round 5): the map-reduce BPE layout.
#
# Flink parity: the reference's text pipeline stops at whitespace/regex
# tokenization [FLINK-API: DataSet/DataStream flatMap tokenizers]; training a
# subword vocabulary is the natural next stage of an LLM ingest pipeline, so
# it is included in the §2.L extension surface. The implementation is the
# standard distributed-BPE shape (the one used by map-reduce subword
# trainers): the corpus is read ONCE into a (word, count) vocabulary table,
# and each merge round is (a) a pair-count shuffle over the VOCABULARY (not
# the corpus), partial-aggregated map-side, (b) a 1-row argmax collect to the
# driver (bounded — this is the merge rule, the only driver-side state), and
# (c) a broadcast-literal merge fold applied map-side with zero shuffle.
# k merge rounds cost k vocabulary passes; the 100-TB corpus is touched once.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3

# Shared oracle prefix: unrolled merge rounds as CTEs. Each sN is the
# vocabulary after N merges; each bN is the N-th learned rule. list_reduce
# seeds the accumulator with the first symbol, so the Spark fold's '' seed
# plus acc='' branch produces identical output; the '|' delimiter cannot
# collide because the word filter admits only ^[a-z]+$.
_BPE_CTES = """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    w0 AS (
      SELECT word, COUNT(*) AS cnt FROM toks
      WHERE regexp_matches(word, '^[a-z]+$') GROUP BY 1
    ),
    s0 AS (
      SELECT word, cnt,
             list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
      FROM w0
    ),
    p1 AS (
      SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
             CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM s0, UNNEST(range(1, len(syms))) AS t(i)
      GROUP BY 1, 2
    ),
    b1 AS (SELECT lhs, rhs, pair_count FROM p1
           ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    s1 AS (
      SELECT word, cnt,
             string_split(list_reduce(syms, (acc, x) -> CASE
               WHEN (acc = lhs OR acc LIKE '%|' || lhs) AND x = rhs
               THEN substr(acc, 1, length(acc) - length(lhs)) || lhs || rhs
               ELSE acc || '|' || x END), '|') AS syms
      FROM s0, b1
    ),
    p2 AS (
      SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
             CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM s1, UNNEST(range(1, len(syms))) AS t(i)
      GROUP BY 1, 2
    ),
    b2 AS (SELECT lhs, rhs, pair_count FROM p2
           ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    s2 AS (
      SELECT word, cnt,
             string_split(list_reduce(syms, (acc, x) -> CASE
               WHEN (acc = lhs OR acc LIKE '%|' || lhs) AND x = rhs
               THEN substr(acc, 1, length(acc) - length(lhs)) || lhs || rhs
               ELSE acc || '|' || x END), '|') AS syms
      FROM s1, b2
    ),
    p3 AS (
      SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
             CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM s2, UNNEST(range(1, len(syms))) AS t(i)
      GROUP BY 1, 2
    ),
    b3 AS (SELECT lhs, rhs, pair_count FROM p3
           ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    s3 AS (
      SELECT word, cnt,
             string_split(list_reduce(syms, (acc, x) -> CASE
               WHEN (acc = lhs OR acc LIKE '%|' || lhs) AND x = rhs
               THEN substr(acc, 1, length(acc) - length(lhs)) || lhs || rhs
               ELSE acc || '|' || x END), '|') AS syms
      FROM s2, b3
    )
"""


def _bpe_word_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → (word, cnt, syms) vocabulary table. The one corpus pass."""
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("syms", F.expr("filter(split(word, ''), c -> c <> '')"))
    )


def _bpe_pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies, weighted by word count.

    One shuffle on (lhs, rhs) with map-side partial aggregation — the
    reduce step of each BPE round.
    """
    return (
        words.select(
            F.explode(F.expr(
                "transform(slice(syms, 1, size(syms) - 1), (c, i) -> "
                "struct(c AS lhs, element_at(syms, i + 2) AS rhs))"
            )).alias("p"),
            "cnt",
        )
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _bpe_apply(words: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Apply one merge rule map-side via a left-fold over the symbol array.

    Greedy left-to-right non-overlapping — reference BPE semantics (the
    merged token does not re-serve as the fold's right element). The rule
    arrives as broadcast literals, so this is a pure projection: no
    shuffle, no Python. localCheckpoint truncates the per-round lineage
    (same rule as iterative.py's rounds) — LAZY since r14 (guide §5):
    the next round's pair-count argmax materializes it anyway, so the
    eager variant's extra job per round bought nothing (A/B 1.16 →
    1.00 s on q_bpe_merges, identical rules).
    """
    fold = (
        "filter(split(aggregate(syms, '', (acc, x) -> CASE "
        "WHEN acc = '' THEN x "
        f"WHEN (acc = '{lhs}' OR acc LIKE '%|{lhs}') AND x = '{rhs}' "
        f"THEN concat(substr(acc, 1, length(acc) - {len(lhs)}), "
        f"'{lhs}{rhs}') "
        "ELSE concat(acc, '|', x) END), '[|]'), c -> c <> '')"
    )
    return (words.withColumn("syms", F.expr(fold))
            .localCheckpoint(eager=False))


def _bpe_train(spark: SparkSession, sf_dir: str,
               rounds: int = _BPE_ROUNDS,
               apply_last: bool = False) -> tuple[list, DataFrame]:
    """Run `rounds` merge rounds; return (rules, vocabulary-after)."""
    # Materialize the vocabulary once: every subsequent round operates on
    # the checkpointed (word, cnt, syms) table, so the corpus itself is
    # scanned exactly once regardless of the number of merge rounds.
    words = _bpe_word_table(spark, sf_dir).localCheckpoint()
    rules = []
    for step in range(1, rounds + 1):
        top = (
            _bpe_pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()  # bounded: at most ONE row — the learned merge rule
        )
        if not top:
            # Vocabulary exhausted (only single-symbol words remain): no
            # adjacent pair exists, so there is nothing left to merge.
            break
        best = top[0]
        rules.append((step, best["lhs"], best["rhs"],
                      best["lhs"] + best["rhs"], best["pair_count"]))
        if step < rounds or apply_last:
            words = _bpe_apply(words, best["lhs"], best["rhs"])
    return rules, words


@query(
    "q_bpe_merges",
    oracle=_BPE_CTES + """
    SELECT CAST(1 AS INT) AS step, lhs, rhs, lhs || rhs AS merged,
           pair_count FROM b1
    UNION ALL SELECT 2, lhs, rhs, lhs || rhs, pair_count FROM b2
    UNION ALL SELECT 3, lhs, rhs, lhs || rhs, pair_count FROM b3
    """,
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.L: BPE merge-table training — 3 rounds of (pair-count shuffle →
    1-row argmax → broadcast merge fold) over the vocabulary table.

    Ties break (count DESC, lhs ASC, rhs ASC) identically on both
    engines, so the learned rules are deterministic and hash-comparable.
    """
    rules, _ = _bpe_train(spark, sf_dir)
    return local_rows_df(
        spark, rules,
        "step INT, lhs STRING, rhs STRING, merged STRING, pair_count LONG",
    )


@query(
    "q_bpe_tokenize",
    oracle=_BPE_CTES + """
    SELECT token, CAST(SUM(cnt) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest(syms) AS token, cnt FROM s3)
    GROUP BY 1
    """,
)
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.L: corpus subword frequencies under the 3 learned BPE merges —
    the apply side of the trainer, weighted back by word frequency."""
    _, words = _bpe_train(spark, sf_dir, apply_last=True)
    return (
        words.select(F.explode("syms").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("n_occurrences"))
    )
