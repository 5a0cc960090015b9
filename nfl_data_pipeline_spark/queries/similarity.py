"""Similarity-search queries over the embeddings table — brute-force
cosine top-k (exact baseline) and IVF-bucketed ANN (scale path), one
tagged result so both legs are oracle-gated together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators import similarity as sim
from nfl_data_pipeline_spark.operators.hashing import duck_dot
from nfl_data_pipeline_spark.queries import register

_N_QUERIES = 10  # vec_id < 10 are the query vectors


def _knn_oracle(k: int) -> str:
    return f"""
    WITH v0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ),
    v AS (
      SELECT vec_id, vec, SQRT({duck_dot('vec', 'vec')}) AS norm FROM v0
    ),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             {duck_dot('q.vec', 'c.vec')} / (q.norm * c.norm) AS cosine
      FROM v q JOIN v c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT q_id, rank, c_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
      FROM scored
    ) t WHERE rank <= {k}
    """


def _knn_ivf_oracle(k: int, n_bits: int = 3) -> str:
    bucket = " + ".join(
        f"(CASE WHEN vec[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"""
    WITH v0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ),
    v AS (
      SELECT vec_id, vec, SQRT({duck_dot('vec', 'vec')}) AS norm FROM v0
    ),
    b AS (SELECT vec_id, vec, norm, CAST({bucket} AS INTEGER) AS bucket FROM v),
    scored AS (
      SELECT q.vec_id AS q_id, q.bucket AS bucket, c.vec_id AS c_id,
             {duck_dot('q.vec', 'c.vec')} / (q.norm * c.norm) AS cosine
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT q_id, bucket, rank, c_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
      FROM scored
    ) t WHERE rank <= {k}
    """


# Each leg's oracle is a complete statement (with its own WITH clause);
# DuckDB accepts nested WITH inside a derived table.
_KNN_SEARCH_ORACLE = f"""
    SELECT 'brute' AS method, q_id, rank, c_id, cosine
    FROM ({_knn_oracle(5)}) b
    UNION ALL
    SELECT 'ivf' AS method, q_id, rank, c_id, cosine
    FROM ({_knn_ivf_oracle(3)}) i
    """


@register(
    "knn_search",
    _KNN_SEARCH_ORACLE,
    survey_ids=("NS-sim",),
    doc="KNN over the embedding column, exact baseline + ANN scale "
    "path in one tagged result. 'brute': brute-force cosine top-k "
    "(k=5, query set broadcast, per-query window with id tiebreak) — "
    "the exact baseline. 'ivf': IVF-style bucketed ANN (sign-bit "
    "coarse quantizer, k=3) — each query scans only its bucket; the "
    "join key replaces the all-pairs fan-out, recall < 1 by design "
    "(the standard ANN trade; trained-centroid kmeans_ivf_topk and "
    "pq_topk in operators/similarity.py are the production variants). "
    "Folded dot products are bit-identical across engines, so ranks "
    "can't flip.",
)
def knn_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(e.vec_id < _N_QUERIES)
    brute = sim.cosine_topk(q, e, k=5).select(
        F.lit("brute").alias("method"), "q_id", "rank", "c_id", "cosine"
    )
    ivf = sim.cosine_topk_ivf(q, e, k=3).select(
        F.lit("ivf").alias("method"), "q_id", "rank", "c_id", "cosine"
    )
    return brute.unionByName(ivf)


# ---- fuzzy string join (edit-distance ≤ k) -------------------------------
# Entity-resolution fixture both engines derive identically: the
# distinct part-name vocabulary plus one deterministic typo per name
# (substitution / deletion / insertion cycling on the name's rank, at
# a rank-derived position) — so planted pairs at distance 1 coexist
# with the vocabulary's natural near-collisions ("small ring" vs
# "small wing"). All arithmetic is 1-based substring + concat,
# expressible verbatim in both SQL dialects.

_FUZZY_K = 2
_FUZZY_VARIANT_CASE = """
    CASE CAST(rid % 3 AS INT)
      WHEN 0 THEN concat(substring(s, 1, p - 1), 'q', substring(s, p + 1))
      WHEN 1 THEN concat(substring(s, 1, p - 1), substring(s, p + 1))
      ELSE concat(substring(s, 1, p - 1), 'x', substring(s, p))
    END
"""

_FUZZY_ORACLE = f"""
    WITH names AS (SELECT DISTINCT p_name AS s FROM part),
    ranked AS (
      SELECT s, length(s) AS n, ROW_NUMBER() OVER (ORDER BY s) AS rid
      FROM names
    ),
    positioned AS (
      SELECT s, n, rid, 1 + ((rid * 7) % n) AS p FROM ranked
    ),
    variants AS (SELECT {_FUZZY_VARIANT_CASE} AS s FROM positioned),
    corpus AS (SELECT s FROM names UNION SELECT s FROM variants)
    SELECT a.s AS s_a, b.s AS s_b,
           CAST(levenshtein(a.s, b.s) AS INTEGER) AS edit_dist
    FROM corpus a JOIN corpus b
      ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= {_FUZZY_K}
    WHERE levenshtein(a.s, b.s) <= {_FUZZY_K}
    """


@register(
    "fuzzy_join_names",
    _FUZZY_ORACLE,
    survey_ids=("NS-dedup",),
    doc="Exact fuzzy self-join (Levenshtein ≤ 2) over a name "
    "vocabulary with planted typos — q-gram blocking (shared-gram "
    "equi-join, Gravano-style count bound as the existence guarantee) "
    "plus 1-gram and tiny-length fallback legs for short strings, "
    "then JVM levenshtein verify; the oracle brute-forces the same "
    "corpus, so blocking provably changed cost, not the answer. "
    "operators/fuzzy.py; exactness property-tested against a Spark "
    "cross-join in tests/test_fuzzy.py.",
)
def fuzzy_join_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nfl_data_pipeline_spark.operators.fuzzy import edit_distance_pairs
    from pyspark.sql import Window

    part = load(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("s")).distinct()
    ranked = (
        names.withColumn("n", F.length("s"))
        .withColumn("rid", F.row_number().over(Window.orderBy("s")))
        .withColumn("p", F.expr("1 + ((rid * 7) % n)"))
    )
    variants = ranked.select(F.expr(_FUZZY_VARIANT_CASE).alias("s"))
    corpus = names.select("s").unionByName(variants).distinct()
    return edit_distance_pairs(corpus, "s", k=_FUZZY_K, q=3)
