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


def cosine_topk_bcast(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a 1-row query DataFrame, fused
    into ONE scan via a broadcast cross-join — no driver collect.

    The list-literal twin (``cosine_topk``) needs the query vector on
    the driver, which costs a SECOND full pass over the table when the
    query row comes from the table itself (the benched q_cosine_topk
    shape: qvec collect was ~40% of the query's wall time at sf0.1).
    Numerics are bit-identical to the literal form: the query array is
    cast to double, so every product is a double multiply of exactly
    widened floats and both norms are the same strict left fold.
    """
    qd = F.col(vec_col).cast("array<double>")
    q = query.select(qd.alias("_qv"), _norm(qd).alias("_qn"))
    cos = _dot(F.col(vec_col), F.col("_qv")) / (_norm(F.col(vec_col)) * F.col("_qn"))
    return (
        embeddings.crossJoin(F.broadcast(q))
        .select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))
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


def cosine_topk_lsh_bcast(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_hash: str = "xx",
) -> DataFrame:
    """SRP-bucketed top-k against a 1-row query DataFrame — the query's
    bucket and its single-bit multi-probe set are computed JVM-side on
    the broadcast row, so no driver collect of the query vector (the
    list-literal twin re-scans the table for it; same one-scan
    discipline as cosine_topk_bcast / ivf_topk_bcast).  Candidate
    selection is identical to ``cosine_topk_lsh``: bucket b plus every
    b ^ (1 << p)."""
    qd = F.col(vec_col).cast("array<double>")
    q = query.select(
        qd.alias("_qv"),
        _norm(qd).alias("_qn"),
        srp_bucket(F.col(vec_col), n_planes, dim, plane_hash=plane_hash).alias("_qb"),
    ).select(
        "_qv",
        "_qn",
        F.array(
            F.col("_qb"), *[F.col("_qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
        ).alias("_probes"),
    )
    bucketed = embeddings.withColumn(
        "_bucket", srp_bucket(F.col(vec_col), n_planes, dim, plane_hash=plane_hash)
    )
    cand = bucketed.crossJoin(F.broadcast(q)).filter(
        F.array_contains(F.col("_probes"), F.col("_bucket"))
    )
    cos = _dot(F.col(vec_col), F.col("_qv")) / (_norm(F.col(vec_col)) * F.col("_qn"))
    return (
        cand.select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path beside SRP-LSH
# ---------------------------------------------------------------------------


def _py_dot(a, b) -> float:
    """Strict left-to-right double fold — matches the JVM ``aggregate``
    fold and DuckDB's list_dot_product loop ordering, so centroid /
    probe selection agrees bit-for-bit across engines (numpy's BLAS
    pairwise summation would not)."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def seed_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse-quantizer codebook: the ``n_centroids``
    lowest-id vectors, collected to the driver (codebooks are tiny by
    construction — a few hundred rows even at 10^9 vectors, so the
    collect is the correct move, same as broadcasting a dim table).

    Seeds-as-centroids keeps every engine reproducing the exact same
    codebook from the data alone (the DuckDB oracle re-derives it with
    ``ORDER BY vec_id LIMIT n``).  A production build would refine these
    seeds with a few Lloyd iterations over a driver-side sample; the
    assignment/probe machinery below is unchanged by better centroids.
    """
    rows = (
        embeddings.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(n_centroids)
        .collect()
    )
    return [(int(r.i), [float(x) for x in r.v]) for r in rows]


def lloyd_refine(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 5,
    max_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Refine the seed codebook with driver-side Lloyd (k-means)
    iterations over a DETERMINISTIC hash-sample of the corpus.

    Scale shape: ONE narrow pass ranks rows by the cross-engine md5
    bucket (kgce.operators.sampling.hash_bucket — a pure function of the
    id, stable under partitioning/growth) and collects only the
    ``max_sample`` lowest-ranked vectors; the k-means loop then runs on
    the driver over a few thousand rows, which is the correct move for a
    codebook (same argument as seed_centroids' collect).  Every step is
    deterministic — sample membership, cosine assignment (strict
    left-to-right double folds, smaller-cid tie-break, identical to
    ivf_assign's scoring), and mean updates in fixed sample order — so
    any engine re-derives the identical codebook and the refined
    centroids can still be published as plan literals.

    Returns ``[(cid, centroid)]`` with dense cids 0..n-1.  Cells that
    lose all members keep their previous centroid (classic Lloyd
    empty-cell rule).  The reference has no ANN counterpart; this is the
    production refinement its IVF docstring deferred (r2 VERDICT #6).
    """
    from .sampling import hash_bucket

    rows = (
        embeddings.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .withColumn("_b", hash_bucket(F.col("i"), salt="lloyd"))
        .orderBy("_b", "i")
        .limit(max_sample)
        .collect()
    )
    sample = [[float(x) for x in r.v] for r in rows]
    if not sample:
        return []
    seeds = seed_centroids(embeddings, n_centroids, id_col, vec_col)
    cents = [list(c) for _, c in seeds]
    # score = dot / norm, the DIVISION form, matching ivf_assign and
    # _probe_ids exactly — a*(1/b) can differ from a/b by an ulp, which
    # would flip tie-adjacent assignments vs an engine re-deriving the
    # codebook through the documented formula
    norms = [(_py_dot(c, c) ** 0.5) or 1.0 for c in cents]
    for _ in range(n_iter):
        sums = [[0.0] * len(c) for c in cents]
        counts = [0] * len(cents)
        for v in sample:
            best, best_s = 0, float("-inf")
            for cid, c in enumerate(cents):
                s = _py_dot(v, c) / norms[cid]
                if s > best_s:  # strict >: ties keep the smaller cid
                    best, best_s = cid, s
            counts[best] += 1
            acc = sums[best]
            for j, x in enumerate(v):
                acc[j] += x
        for cid, c in enumerate(cents):
            if counts[cid]:
                cents[cid] = [s / counts[cid] for s in sums[cid]]
        norms = [(_py_dot(c, c) ** 0.5) or 1.0 for c in cents]
    return list(enumerate(cents))


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "_cid",
) -> DataFrame:
    """Nearest-centroid assignment as a PURE PROJECTION — the codebook is
    inlined as plan literals, so there is no join, no broadcast exchange,
    no shuffle: a narrow scan at any scale.

    Score = dot(v, c) / |c| (the vector's own norm is constant across
    centroids, so argmax over cosine == argmax over this).  Tie-break:
    smallest centroid id, via max over struct(score, -cid).
    """
    structs = []
    for cid, cvec in centroids:
        cn = _py_dot(cvec, cvec) ** 0.5
        score = _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in cvec])) / F.lit(cn)
        structs.append(F.struct(score.alias("s"), F.lit(-cid).alias("nid")))
    best = F.array_max(F.array(*structs))
    return embeddings.withColumn(out_col, (-best.getField("nid")).cast("int"))


def _probe_ids(
    query_vec: list[float], centroids: list[tuple[int, list[float]]], n_probe: int
) -> list[int]:
    """Top ``n_probe`` centroid ids for a query (driver-side, pure
    Python fold — see _py_dot); ties broken by smaller cid."""
    scored = sorted(
        ((-(_py_dot(query_vec, cv) / (_py_dot(cv, cv) ** 0.5)), cid) for cid, cv in centroids)
    )
    return [cid for _, cid in scored[:n_probe]]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF top-k: assign every vector to its nearest centroid, scan only
    the ``n_probe`` cells nearest the query.  Recall < 1.0 by
    construction (like the SRP path); n_probe/n_centroids is the
    scanned fraction.  For a STORED corpus use ivf_write_index /
    ivf_topk_indexed, which turn the probe filter into parquet
    partition pruning — the unscanned cells are never read at all.
    """
    if centroids is None:
        centroids = seed_centroids(embeddings, n_centroids, id_col, vec_col)
    probes = _probe_ids(query_vec, centroids, n_probe)
    cand = ivf_assign(embeddings, centroids, vec_col).filter(F.col("_cid").isin(probes))
    return cosine_topk(cand.drop("_cid"), query_vec, k, id_col, vec_col)


def ivf_topk_bcast(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF top-k against a 1-row query DataFrame — no driver collect of
    the query vector (r3 VERDICT #6: the list-literal twin re-scanned
    the table for the qvec, a full second pass at corpus scale).

    Probe selection moves JVM-side but replicates ``_probe_ids``
    bit-for-bit: per-centroid score = dot(q, c) / |c| with the same
    strict left-to-right double fold and the same literal |c|, ranked by
    array_sort over struct(-score, cid) — exactly the Python
    ``sorted((-score, cid))`` tie-break (smaller cid wins).  The 1-row
    (qvec, qnorm, probes[]) frame broadcasts onto the narrow
    plan-literal cell assignment; the cosine itself matches
    cosine_topk_bcast's widened-float arithmetic.
    """
    if centroids is None:
        centroids = seed_centroids(embeddings, n_centroids, id_col, vec_col)
    qd = F.col(vec_col).cast("array<double>")
    ranked = []
    for cid, cvec in centroids:
        cn = _py_dot(cvec, cvec) ** 0.5
        s = _dot(qd, F.array(*[F.lit(float(x)) for x in cvec])) / F.lit(cn)
        ranked.append(F.struct((-s).alias("ns"), F.lit(cid).alias("cid")))
    probe_ids = F.transform(
        F.slice(F.array_sort(F.array(*ranked)), 1, n_probe),
        lambda st: st.getField("cid"),
    )
    q = query.select(
        qd.alias("_qv"), _norm(qd).alias("_qn"), probe_ids.alias("_probes")
    )
    cand = (
        ivf_assign(embeddings, centroids, vec_col)
        .crossJoin(F.broadcast(q))
        .filter(F.array_contains(F.col("_probes"), F.col("_cid")))
    )
    cos = _dot(F.col(vec_col), F.col("_qv")) / (_norm(F.col(vec_col)) * F.col("_qn"))
    return (
        cand.select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def ivf_write_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF index: one parquet partition per cell
    (``partitionBy(_cid)``).  Returns the codebook to pass to
    ivf_topk_indexed.  At 100 TB this is the layout that makes ANN
    cheap: a query touches n_probe directories, the rest of the corpus
    is pruned at planning time (PartitionFilters, not a scan+filter)."""
    cents = seed_centroids(embeddings, n_centroids, id_col, vec_col)
    ivf_assign(embeddings, cents, vec_col).write.partitionBy("_cid").mode(
        "overwrite"
    ).parquet(path)
    return cents


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a stored IVF index — probe cells resolve to partition
    directories (verify PartitionFilters in the plan)."""
    probes = _probe_ids(query_vec, centroids, n_probe)
    cand = spark.read.parquet(path).filter(F.col("_cid").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
