"""Text-analysis queries over the documents table — driver north-star
operators (token counting, language ID, quality scoring,
fingerprinting, membership) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators import text as text_ops
from nfl_data_pipeline_spark.operators.hashing import duck_rolling_hash
from nfl_data_pipeline_spark.queries import register

_STOP_SQL = ", ".join(f"'{s}'" for s in text_ops.STOPWORDS)
_TOKS = "string_split(text, ' ')"


@register(
    "token_stats",
    f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           len(list_distinct({_TOKS})) AS n_distinct_tokens,
           len(list_distinct({_TOKS})) / CAST(len({_TOKS}) AS DOUBLE)
             AS distinct_ratio,
           CAST(length(text) - (len({_TOKS}) - 1) AS DOUBLE)
             / CAST(len({_TOKS}) AS DOUBLE) AS mean_token_len
    FROM documents
    """,
    survey_ids=("NS-text",),
    doc="Token counting (whitespace tokenizer): totals, distinct, "
    "diversity ratio, mean token length — all narrow JVM-side array ops.",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.token_stats(load(spark, sf_dir, "documents"))


@register(
    "lang_id_heuristic",
    f"""
    SELECT doc_id, lang,
           len(list_filter({_TOKS}, x -> x IN ({_STOP_SQL})))
             / CAST(len({_TOKS}) AS DOUBLE) AS stopword_ratio,
           CASE WHEN len(list_filter({_TOKS}, x -> x IN ({_STOP_SQL})))
                     / CAST(len({_TOKS}) AS DOUBLE) >= 0.05
                THEN 'en' ELSE 'unknown' END AS pred_lang
    FROM documents
    """,
    survey_ids=("NS-text",),
    doc="Language-ID heuristic: English function-word ratio, "
    "thresholded. The contract is a deterministic per-row score from "
    "token evidence (a production system swaps in a model via "
    "pandas_udf with the same shape).",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.language_id(load(spark, sf_dir, "documents"))


@register(
    "quality_score",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({_TOKS}) AS DOUBLE) AS n,
             len(list_distinct({_TOKS})) AS n_distinct,
             len(list_filter({_TOKS}, x -> x IN ({_STOP_SQL}))) AS n_stop
      FROM documents
    )
    SELECT doc_id, source,
           ROUND(0.4 * (CASE WHEN n >= 20 AND n <= 400 THEN 1.0 ELSE 0.0 END)
                 + 0.4 * (n_distinct / n)
                 + 0.2 * ((n_stop / n) * 5.0), 9) AS quality,
           CASE WHEN 0.4 * (CASE WHEN n >= 20 AND n <= 400 THEN 1.0 ELSE 0.0 END)
                 + 0.4 * (n_distinct / n)
                 + 0.2 * ((n_stop / n) * 5.0) >= 0.5
                THEN 1 ELSE 0 END AS is_quality
    FROM t
    """,
    survey_ids=("NS-text",),
    doc="Composite quality score (length band, vocabulary diversity, "
    "stopword presence) — the C4/Gopher-style corpus filter shape.",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.quality_score(load(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id,
           {duck_rolling_hash('text')} AS fp_rolling,
           md5(text) AS fp_md5
    FROM documents
    """,
    survey_ids=("NS-text",),
    doc="Document fingerprinting: 31-polynomial rolling hash over code "
    "points mod 1e9+7 (partition-parallel, cross-engine exact) + md5.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.fingerprint(load(spark, sf_dir, "documents"))


@register(
    "word_membership",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN list_contains({_TOKS}, 'spark')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_spark,
           CAST(SUM(CASE WHEN text LIKE '%window%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_like_window
    FROM documents
    GROUP BY source
    """,
    survey_ids=("P8",),
    doc="Delimited-list membership — the offense_players ';'-list "
    "pattern of R/on_off_nflreadr.R:9,30-34: exact token membership "
    "via array_contains (split first — substring matching gives false "
    "positives, which is the reference's latent bug) plus the "
    "reference's own str_detect/LIKE form for comparison.",
)
def word_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.array_contains(toks, "spark"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_spark"),
        F.sum(F.when(F.col("text").contains("window"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_like_window"),
    )


# GPT-2-style pre-tokenizer shape, ASCII-safe so Java regex (Spark)
# and RE2 (DuckDB) agree: letter runs, digit runs, punctuation runs,
# each optionally space-prefixed.
_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


@register(
    "subword_token_stats",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS INTEGER)
             AS n_subwords,
           CAST(len({_TOKS}) AS INTEGER) AS n_words,
           len(regexp_extract_all(text, '{_BPE_PAT}'))
             / CAST(len({_TOKS}) AS DOUBLE) AS subwords_per_word
    FROM documents
    """,
    survey_ids=("NS-text",),
    doc="BPE-ish token counting: the GPT-2 pre-tokenizer regex "
    "(letter/digit/punct runs, optional leading space) counts the "
    "units a byte-pair encoder would merge from — the corpus-budget "
    "estimate (tokens-per-word) every training pipeline reports. One "
    "narrow regexp_extract_all, no UDF.",
)
def subword_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sub = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(sub).cast("int").alias("n_subwords"),
        F.size(words).cast("int").alias("n_words"),
        (F.size(sub) / F.size(words).cast("double")).alias(
            "subwords_per_word"
        ),
    )


@register(
    "top_tokens",
    f"""
    SELECT token, n FROM (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rk
      FROM (SELECT unnest({_TOKS}) AS token FROM documents) t
      GROUP BY token
    ) ranked WHERE rk <= 25
    """,
    survey_ids=("NS-text", "A1", "O3"),
    doc="Vocabulary head: exact top-25 most frequent tokens (explode "
    "→ count → top-k with token tiebreak). The explode shuffles only "
    "(token, partial count) thanks to map-side combine; the top-k is "
    "a TakeOrdered over the aggregated vocabulary, never the corpus.",
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 25)
        .select("token", "n")
    )


# ---------------------------------------------------------------------------
# TF-IDF — the classic term-weighting stage of a text-training pipeline.
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS term_freq
        FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.term_freq, df.doc_freq,
               tf.term_freq * ln(CAST(n.n_docs AS DOUBLE) / df.doc_freq)
                   AS tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.term_freq DESC, df.doc_freq ASC, tf.term ASC
               ) AS rn
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, term_freq, doc_freq, tfidf
    FROM scored WHERE rn <= 3
    """,
    survey_ids=("NS-text", "W3", "A9"),
    doc="Top-3 TF-IDF terms per document. Term frequency is a "
    "two-key hash-agg; document frequency falls out of the SAME "
    "aggregate (one row per doc-term already) — no COUNT DISTINCT "
    "pass; the vocabulary is a small dimension broadcast back onto "
    "the doc-term facts. Ranking is over exact integers "
    "(term_freq DESC, doc_freq ASC, term) with the float tfidf as a "
    "reported value only — a float sort key could flip rank between "
    "engines on exact-score ties (SURVEY §7 hard-part 1), integer "
    "keys cannot.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("term_freq"))
    df = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n = docs.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("term_freq").desc(), F.col("doc_freq").asc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("term_freq")
            * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "term_freq", "doc_freq", "tfidf")
    )
