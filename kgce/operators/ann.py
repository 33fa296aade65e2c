"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the correctness baseline; dot products via
  JVM-side ``aggregate``/``zip_with`` (no Python in the loop).
* LSH-bucketed (signed-random-projection) variant — the scale path: a
  deterministic hyperplane family hashes vectors into 2^b buckets;
  queries probe only their own bucket (+ optional multi-probe), turning
  the all-pairs scan into a bucket-local one.  Hyperplanes are derived
  from xxhash64(dim, plane) so every executor materializes the same
  family with no broadcast of random state.
* embedding-cosine near-duplicate pairs — same SRP blocking, pairwise
  verify inside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> "F.Column":
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def md5_planes(n_planes: int, dim: int, seed: int = 13) -> list[list[int]]:
    """Deterministic integer-lattice hyperplanes from md5 — reproducible
    bit-for-bit in DuckDB (``('0x'||substr(md5(j||':'||p||':'||seed),1,8))
    ::BIGINT % 1000001 - 500000``), which makes every SRP-LSH query
    oracle-checkable.  Component (p, j) = md5("j:p:seed")[:8] as u32,
    mod-folded onto [-500000, 500000]."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{j}:{p}:{seed}".encode()).hexdigest()[:8], 16) % 1000001
            - 500000
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_bucket(
    vec_col, n_planes: int = 8, dim: int = 32, seed: int = 13, plane_hash: str = "xx"
) -> "F.Column":
    """Signed-random-projection bucket id (0 .. 2^n_planes - 1).

    Plane p component j = (hash(j, p, seed) % 1000001) - 500000 — a
    deterministic integer lattice approximation of a Gaussian plane,
    identical on every executor with zero broadcast.  ``plane_hash``:
    ``xx`` evaluates xxhash64 JVM-side (production); ``md5`` inlines the
    md5_planes literals so DuckDB can reproduce the buckets exactly.
    """
    if plane_hash == "md5":
        lattice = md5_planes(n_planes, dim, seed)

        def _plane(p: int):
            return F.array(*[F.lit(float(v)) for v in lattice[p]])

    else:

        def _plane(p: int):
            # closure over the plane index (a defaulted lambda param would
            # bind the array index); component j = lattice pseudo-gaussian
            return F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: (
                    F.pmod(F.xxhash64(j, F.lit(p), F.lit(seed)), F.lit(1000001)) - 500000
                ).cast("double"),
            )

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec_col, _plane(p), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_hash: str = "xx",
) -> DataFrame:
    """SRP-bucketed top-k: scan only vectors in the query's bucket.

    Recall < 1.0 by construction; callers trade n_planes for recall.
    The multi-probe extension (flip one bit) is a union of 1+n_planes
    bucket filters.
    """
    dim = len(query_vec)
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], f"{vec_col} array<float>")
    qbucket = qdf.select(
        srp_bucket(F.col(vec_col), n_planes, dim, plane_hash=plane_hash).alias("b")
    ).collect()[0].b
    bucketed = embeddings.withColumn(
        "_bucket", srp_bucket(F.col(vec_col), n_planes, dim, plane_hash=plane_hash)
    )
    # multi-probe: query bucket plus all single-bit flips
    probes = [qbucket] + [qbucket ^ (1 << p) for p in range(n_planes)]
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_hash: str = "xx",
) -> DataFrame:
    """Near-duplicate vector pairs: SRP block -> in-bucket pairwise verify.

    ``dim`` defaults to the actual vector width (1-row probe).  Passing a
    dim SMALLER than the vectors would null out every projection via
    zip_with padding and collapse all vectors into bucket 0 — silently
    turning the blocked join into an all-pairs scan.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    bucketed = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        srp_bucket(F.col(vec_col), n_planes, dim, plane_hash=plane_hash).alias("bucket"),
    )
    a = bucketed.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
    b = bucketed.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        .distinct()
    )
