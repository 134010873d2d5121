"""Real IVF index for similarity search: KMeans coarse quantizer.

ext/similarity.topk_ivf uses the precomputed ``label`` column as the
coarse bucket (which the oracle can check); this module builds the
bucket assignment itself with pyspark.ml KMeans — the production path:

1. fit k centroids on (a sample of) the corpus (seeded → deterministic);
2. assign every vector to its nearest centroid (one model.transform);
3. serve queries by probing the ``nprobe`` nearest centroid buckets.

At 100 TB: fitting runs on a sample, assignment is one scan, and the
assignment column becomes a partition/bucket key for the stored index —
query cost is nprobe/k of the corpus.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_prepped, prep_vectors


def fit_ivf(corpus: DataFrame, k: int = 16, seed: int = 42) -> KMeansModel:
    vecs = corpus.select(
        array_to_vector(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("features")
    )
    return KMeans(k=k, seed=seed, maxIter=10).fit(vecs)


def assign_buckets(corpus: DataFrame, model: KMeansModel) -> DataFrame:
    withvec = corpus.withColumn(
        "features",
        array_to_vector(F.transform(F.col("embedding"), lambda x: x.cast("double"))),
    )
    return (
        model.transform(withvec)
        .withColumnRenamed("prediction", "ivf_bucket")
        .drop("features")
    )


def ivf_topk(
    indexed: DataFrame,
    model: KMeansModel,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k by cosine among the nprobe nearest centroid buckets of each
    query. indexed = assign_buckets output; queries carry vec_id +
    embedding."""
    import numpy as np
    from pyspark.sql import Window

    centers = [c for c in model.clusterCenters()]

    def nearest_buckets(vec) -> list[int]:
        arr = np.array(vec, dtype="float64")
        dists = [float(np.linalg.norm(arr - c)) for c in centers]
        return [int(i) for i in np.argsort(dists)[:nprobe]]

    q_rows = queries.select("vec_id", "embedding").collect()
    probe_rows = [
        (int(r["vec_id"]), list(r["embedding"]), b)
        for r in q_rows
        for b in nearest_buckets(r["embedding"])
    ]
    q_df = queries.sparkSession.createDataFrame(
        probe_rows, "query_id BIGINT, q_emb ARRAY<FLOAT>, ivf_bucket INT"
    )
    q_prepped = prep_vectors(q_df, "q_emb").withColumnsRenamed(
        {"emb_r": "q_r", "emb_norm": "q_norm"}
    )
    c_prepped = prep_vectors(indexed)
    scored = (
        c_prepped.join(F.broadcast(q_prepped), on="ivf_bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_prepped(
                F.col("q_r"), F.col("q_norm"), F.col("emb_r"), F.col("emb_norm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )
