"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline. All math in JVM higher-order
  functions (zip_with/aggregate) on doubles — no Python in the loop. Output is
  (query_id, neighbor_id, rank): rank-only, because the two engines' cosine
  differs in final ulps and value-hashing raw cosines would be flaky.

- IVF top-k: the scale path. Coarse "centroids" partition the corpus into
  buckets; a query probes only its nprobe nearest buckets, so the candidate set
  is corpus/|centroids|·nprobe instead of the whole corpus. Here centroids are a
  deterministic sample (vec_id % stride == 0) so the oracle can replicate them;
  on a real 100 TB corpus you'd fit k-means centroids (MLlib KMeans) and
  broadcast them — the plan shape (broadcast centroids → bucket assign →
  per-bucket rerank) is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_ml_spark.plans.relational import QuerySpec
from duckdb_ml_spark.tables import load

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
CENTROID_STRIDE = 25  # vec_id % 25 == 0 → corpus/25 coarse centroids
N_PROBE = 3


def cosine(a: Column, b: Column) -> Column:
    """Sequential-fold cosine in doubles (deterministic order on both engines)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    nb = F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v)
    return dot / (F.sqrt(na) * F.sqrt(nb))


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = TOP_K, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k neighbors per query vector (cosine), rank-windowed.

    The corpus side streams; queries are broadcast (small by construction). At
    100 TB this is one map-side join + per-query top-k — no corpus shuffle.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double("embedding").alias("qe")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), _as_double("embedding").alias("ce"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("ce")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _brute_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.where(F.col("vec_id") < N_QUERIES))


_BRUTE_ORACLE = f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
    FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    stride: int = CENTROID_STRIDE,
    nprobe: int = N_PROBE,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: assign corpus to nearest coarse centroid, probe the
    query's nprobe nearest buckets, exact-rerank only those candidates."""
    cent = emb.where(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("c_id"), _as_double("embedding").alias("c_e")
    )
    corpus = emb.select(F.col(id_col).alias("neighbor_id"), _as_double("embedding").alias("ce"))
    # bucket assignment: nearest centroid per corpus vector (broadcast centroids)
    w_assign = Window.partitionBy("neighbor_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
    assigned = (
        corpus.crossJoin(F.broadcast(cent))
        .select(
            "neighbor_id", "ce", "c_id", cosine(F.col("ce"), F.col("c_e")).alias("c_cos")
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("neighbor_id", "ce", F.col("c_id").alias("bucket"))
    )
    # query probe lists: nprobe nearest centroids per query
    q = queries.select(F.col(id_col).alias("query_id"), _as_double("embedding").alias("qe"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qe", "c_id", cosine(F.col("qe"), F.col("c_e")).alias("c_cos"))
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qe", F.col("c_id").alias("bucket"))
    )
    # rerank within probed buckets only
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        assigned.join(F.broadcast(probes), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("ce")).alias("cos"))
        .withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.where(F.col("vec_id") < N_QUERIES))


_IVF_ORACLE = f"""
WITH cent AS (
    SELECT vec_id AS c_id, embedding FROM embeddings WHERE vec_id % {CENTROID_STRIDE} = 0
),
assigned AS (
    SELECT e.vec_id AS neighbor_id, e.embedding AS ce, c.c_id AS bucket,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.c_id ASC
           ) AS rn
    FROM embeddings e, cent c
    QUALIFY rn = 1
),
probes AS (
    SELECT q.vec_id AS query_id, q.embedding AS qe, c.c_id AS bucket,
           row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.c_id ASC
           ) AS rn
    FROM embeddings q, cent c
    WHERE q.vec_id < {N_QUERIES}
    QUALIFY rn <= {N_PROBE}
)
SELECT query_id, neighbor_id,
       row_number() OVER (
           PARTITION BY query_id
           ORDER BY list_cosine_similarity(qe::DOUBLE[], ce::DOUBLE[]) DESC, neighbor_id ASC
       ) AS rank
FROM assigned JOIN probes USING (bucket)
WHERE query_id != neighbor_id
QUALIFY rank <= {TOP_K}
"""


QUERIES: dict[str, QuerySpec] = {
    "sim_topk_bruteforce": QuerySpec(
        name="sim_topk_bruteforce",
        builder=_brute_topk_q,
        oracle=_BRUTE_ORACLE,
        doc="Exact cosine top-5 neighbors for 10 query vectors (rank output).",
        tags=("similarity", "ann"),
    ),
    "sim_topk_ivf": QuerySpec(
        name="sim_topk_ivf",
        builder=_ivf_topk_q,
        oracle=_IVF_ORACLE,
        doc="IVF-bucketed approximate top-5 (probe 3 of N/25 coarse buckets).",
        tags=("similarity", "ann", "ivf"),
    ),
}
