"""Similarity search over embedding columns (SURVEY.md §2 B.10):
brute-force cosine top-k (the exact baseline) and an LSH-bucketed
approximate variant (the scale path).

Embeddings are ``array<float>`` columns; all math is done in double
via SQL higher-order functions (transform / zip_with / aggregate) —
JVM-side, no Python boundary, deterministic IEEE arithmetic.

Scale design: brute force is O(|Q|·|N|) — fine when |Q| is small
(broadcast the queries) or as the verify step after blocking. The
hyperplane-LSH variant buckets vectors by the sign pattern of r
random projections; a query probes only its bucket (recall traded
for r). At 100 TB: partition by bucket, broadcast the (tiny) query
set, per-partition top-k then global top-k merge — no global sort.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"


def _as_double(col: str):
    return F.expr(f"transform({col}, x -> cast(x as double))")


def with_norm(df: DataFrame, vec_col: str, out: str = "v") -> DataFrame:
    """Project the float vector to double + attach its L2 norm."""
    return df.withColumn(out, _as_double(vec_col)).withColumn(
        f"{out}_norm",
        F.sqrt(F.expr(f"aggregate({out}, cast(0.0 as double), (acc, x) -> acc + x * x)")),
    )


def unrolled_dot(a: str, b: str, dim: int) -> str:
    """Fixed-dimension dot product as a flat left-associated sum of
    per-element double products. MEASURED NEGATIVE for dim=64 at
    sf10 (19.3 s vs the HOF fold's 3.5 s on llm_similarity_topk):
    the ~320-term generated method exceeds HotSpot's JIT method-size
    limit (-XX:-DontCompileHugeMethods default ~8k bytecode), so the
    'codegen' runs bytecode-INTERPRETED — slower than the
    CodegenFallback fold whose evaluator loop is itself JIT-hot.
    Kept for small dims (≤~16 terms compile fine, e.g. the seeded
    hyperplane projections); for big fixed dims the fold or an
    Arrow-batched kernel is the right path. Bit-equality with the
    fold: both sum the in-order element products left-associated in
    double (the fold's 0.0+x0 start is exact), so results are
    identical IEEE doubles."""
    return (
        "("
        + " + ".join(
            f"(cast({a}[{i}] as double) * cast({b}[{i}] as double))"
            for i in range(dim)
        )
        + ")"
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    query_id_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    corpus vectors (excluding itself when ids collide). Queries are
    broadcast — the corpus never shuffles; per-group top-k via
    row_number with (cosine desc, id) tiebreak.

    ``dim``: when the (fixed) vector dimension is known, the dot and
    norms unroll into flat codegen expressions (see `unrolled_dot`) —
    measured 2.3× faster than the HOF fold on the 64-dim corpus at
    sf10, identical doubles out."""
    qid = query_id_col or id_col
    if dim is not None:
        nrm = f"sqrt({unrolled_dot(vec_col, vec_col, dim)})"
        c = corpus.select(
            F.col(id_col).alias("corpus_id"),
            F.col(vec_col).alias("__cvec"),
            F.expr(nrm).alias("cv_norm"),
        )
        q = queries.select(
            F.col(qid).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            F.expr(nrm).alias("qv_norm"),
        )
        dot = F.expr(unrolled_dot("__qvec", "__cvec", dim))
    else:
        c = with_norm(corpus, vec_col, "cv").select(
            F.col(id_col).alias("corpus_id"), "cv", "cv_norm"
        )
        q = with_norm(queries, vec_col, "qv").select(
            F.col(qid).alias("query_id"), "qv", "qv_norm"
        )
        dot = F.expr(DOT.format(a="qv", b="cv"))
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            (dot / (F.col("qv_norm") * F.col("cv_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def cosine_topk_kernel(
    corpus: DataFrame,
    query_rows: list,
    id_col: str,
    vec_col: str,
    k: int = 3,
) -> DataFrame:
    """Brute-force cosine top-k via an Arrow-batched numpy kernel —
    the dense-linear-algebra case where the vectorized Python path
    BEATS Catalyst expressions. The HOF fold evaluates ~3.5 µs per
    64-dim dot (CodegenFallback, per-element interpretation) and the
    fully-unrolled expression is a JIT bailout (see `unrolled_dot`);
    a numpy batch kernel does the same million dots in milliseconds.
    Measured sf10 (200k vectors x 5 queries): 3.5 s fold → ~0.4 s.

    ``query_rows``: the bounded query set as [(query_id, vector)]
    python pairs — query INGESTION, not data movement (an ANN service
    receives its queries as literals; collecting |Q| bounded rows is
    the analogue). The corpus never leaves the JVM except as Arrow
    batches of the single embedding column; scoring is map-only and
    partition-parallel, the only exchange is the final per-query
    top-k window over |Q| groups.

    Bit-equality with the SQL fold / DuckDB list_sum oracle: the
    kernel accumulates dot and norm PER DIMENSION IN ORDER across
    the whole batch (``acc += a[:,i] * q[i]``), reproducing the
    fold's left-associated double sum exactly (0.0 + x0 is exact),
    and divides in the same expression order — identical IEEE
    doubles, hash-matched at every tested sf."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qids = [int(r[0]) for r in query_rows]
    qmat = np.array([list(r[1]) for r in query_rows], dtype=np.float64)
    dim = qmat.shape[1]
    # ordered per-dim accumulation for the query norms too
    qacc = np.zeros(len(qids))
    for i in range(dim):
        qacc += qmat[:, i] * qmat[:, i]
    if np.any(qacc == 0.0):
        bad = [qids[i] for i in np.flatnonzero(qacc == 0.0)[:3]]
        raise ValueError(
            f"cosine_topk_kernel: zero-norm query vector(s), ids {bad} "
            "— cosine is undefined; filter them out"
        )
    qnorm = np.sqrt(qacc)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("corpus_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def part_topk(batches):
        # Per-BATCH partial top-k: any global top-k member is in its
        # own batch's top-k, so emitting ≤ |Q|·k rows per Arrow batch
        # is lossless — the final window then ranks a few dozen rows
        # instead of |corpus|·|Q| (a 1M-row explode+window measured
        # 2.4 s of the 3.9 s total before this).
        for pdf in batches:
            ids = pdf["__cid"].to_numpy()
            # vstack keeps the per-row float32 buffers C-side;
            # tolist() would detour 64 python floats per row
            a = np.vstack(pdf["__vec"].to_numpy()).astype(np.float64)
            n = a.shape[0]
            dots = np.zeros((n, len(qids)))
            nacc = np.zeros(n)
            for i in range(dim):
                ai = a[:, i]
                nacc += ai * ai
                dots += ai[:, None] * qmat[None, :, i]
            # Zero-norm corpus vector: the SQL fold path raises
            # DIVIDE_BY_ZERO under ANSI mode (Spark 4 default); the
            # kernel mirrors that with a named error instead of
            # silently emitting NaN, which numpy would then sort LAST
            # while Spark/DuckDB windows order NaN as greatest under
            # DESC (ADVICE r6 — divergent top-k).
            if np.any(nacc == 0.0):
                bad = ids[np.flatnonzero(nacc == 0.0)[:3]].tolist()
                raise ValueError(
                    "cosine_topk_kernel: zero-norm corpus vector(s), "
                    f"ids {bad} — cosine is undefined (the SQL fold "
                    "raises DIVIDE_BY_ZERO here); filter them out"
                )
            cos = dots / (qnorm[None, :] * np.sqrt(nacc)[:, None])
            rows = []
            for j, qid in enumerate(qids):
                cj = cos[:, j]
                idx = np.flatnonzero(ids != qid)
                # (cosine desc, corpus_id asc): lexsort's last key is
                # primary; zero norms were rejected above, so cj is
                # NaN-free and the negated key is totally ordered
                order = np.lexsort((ids[idx], -cj[idx]))[:k]
                for s in idx[order]:
                    rows.append((qid, int(ids[s]), float(cj[s])))
            yield pd.DataFrame(
                rows, columns=["query_id", "corpus_id", "cosine"]
            )

    part = corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__vec")
    ).mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id")
    )
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def random_hyperplanes(dim: int, r: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny — r×dim
    floats broadcast as literals)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(r)]


def hyperplane_buckets(
    df: DataFrame, vec_col: str, planes: list[list[float]], out: str = "bucket"
) -> DataFrame:
    """LSH bucket id = sign pattern of r random projections, packed
    into a long. Pure expression — no UDF, no shuffle."""
    bucket = None
    for i, p in enumerate(planes):
        arr = "array(" + ", ".join(f"cast({x!r} as double)" for x in p) + ")"
        proj = F.expr(DOT.format(a=f"transform({vec_col}, x -> cast(x as double))", b=arr))
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        bucket = term if bucket is None else bucket + term
    return df.withColumn(out, bucket)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every corpus vector to its
    nearest centroid (the inverted lists), probe only the query's
    ``nprobe`` nearest lists, exact-cosine the candidates, top-k.

    ``centroids`` is a small DataFrame of (id, vector) — here seeded
    deterministically from the data (making the whole result
    exact-oracle checkable); in production it would be a k-means
    codebook, and nothing else changes.

    Scale shape (the point of IVF): the corpus never cross-joins
    anything. Assignment is corpus ⨝ broadcast(centroids) followed by
    a partial-agg argmax — the shuffle carries one (id, best) row per
    corpus row, no window over the fact. Probing is an equi join on
    centroid id (list membership), so candidate generation touches
    ~nprobe/K of the corpus per query. Argmax ties break to the
    LOWEST centroid id via max(struct(cosine, -cid)) — mirrored in
    the oracle's ORDER BY cosine DESC, cid."""
    c = with_norm(corpus, vec_col, "cv").select(
        F.col(id_col).alias("corpus_id"), "cv", "cv_norm"
    )
    cent = with_norm(centroids, vec_col, "ev").select(
        F.col(id_col).alias("cid"), "ev", "ev_norm"
    )
    q = with_norm(queries, vec_col, "qv").select(
        F.col(id_col).alias("query_id"), "qv", "qv_norm"
    )

    c_cos = F.expr(DOT.format(a="cv", b="ev")) / (F.col("cv_norm") * F.col("ev_norm"))
    assigned = (
        c.join(F.broadcast(cent))
        .groupBy("corpus_id")
        .agg(F.max(F.struct(c_cos.alias("cos"), (-F.col("cid")).alias("ncid"))).alias("m"))
        .select("corpus_id", (-F.col("m.ncid")).alias("cid"))
    )

    q_cos = F.expr(DOT.format(a="qv", b="ev")) / (F.col("qv_norm") * F.col("ev_norm"))
    wq = Window.partitionBy("query_id").orderBy(F.col("c_cos").desc(), F.col("cid"))
    probes = (
        q.join(F.broadcast(cent))
        .select("query_id", "cid", q_cos.alias("c_cos"))
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "cid")
    )

    cand = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id")
    )
    scored = (
        cand.join(c, "corpus_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "corpus_id",
            (
                F.expr(DOT.format(a="qv", b="cv"))
                / (F.col("qv_norm") * F.col("cv_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def kmeans_codebook(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 3,
) -> DataFrame:
    """Train an IVF coarse-quantizer codebook with Lloyd's algorithm,
    expressed as pure DataFrame ops (no MLlib dependency, no RDDs):
    seed centroids = the k lowest-id vectors (deterministic), then
    ``iters`` rounds of (1) assign every vector to its nearest
    centroid — broadcast join + partial-agg argmin, identical shape
    to ivf_topk's assignment, no window over the corpus — and
    (2) recompute centroids as per-list per-dimension means via
    posexplode + (cid, dim) aggregation, so the shuffle carries
    (cid, dim, partial sum, partial count) — never whole vectors.

    Each round is one job over the corpus; centroids (k×dim doubles)
    collect to the driver between rounds ONLY as the broadcast seed
    of the next round — the k×64-value codebook is metadata-sized, as
    in any IVF build. Returns (cid, centroid array<double>).
    Distortion is non-increasing per Lloyd round (monotonicity is
    pinned in tests); exactness of the final ANN answer is unaffected
    — candidates are still exact-cosine verified."""
    base = with_norm(corpus, vec_col, "v").select(
        F.col(id_col).alias("__vid"), "v"
    )
    w = Window.orderBy("__vid")
    cent = (
        base.orderBy("__vid")
        .limit(k)
        .withColumn("cid", F.row_number().over(w) - 1)
        .select("cid", F.col("v").alias("cv"))
    )
    dist2 = F.expr(
        "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    for _ in range(iters):
        assigned = (
            base.join(F.broadcast(cent))
            .groupBy("__vid")
            .agg(
                F.min(F.struct(dist2.alias("d"), F.col("cid").alias("cid"))).alias("m")
            )
            .select("__vid", F.col("m.cid").alias("cid"))
        )
        dims = (
            base.join(assigned, "__vid")
            .select("cid", F.posexplode("v").alias("dim", "x"))
            .groupBy("cid", "dim")
            # DECIMAL accumulation makes the per-dimension sum order-
            # independent (shuffle/merge order can't perturb the
            # centroid), so the trained codebook is bit-reproducible
            # across runs, partitionings, AND engines — what lets the
            # kmeans IVF query carry an exact oracle. Mean = exact
            # decimal sum cast to double, then one double division.
            .agg(
                F.sum(F.col("x").cast("decimal(25,10)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        cent = (
            dims.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "dim",
                            (F.col("s").cast("double") / F.col("n")).alias("m"),
                        )
                    )
                ).alias("dm")
            )
            .select("cid", F.expr("transform(dm, e -> e.m)").alias("cv"))
        )
        cent = cent.localCheckpoint(eager=True)  # cut lineage per round
    return cent.select("cid", F.col("cv").alias("centroid"))


def quantization_distortion(
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> float:
    """Mean squared distance of every vector to its nearest centroid
    — the quantity Lloyd minimizes; used to test convergence."""
    base = with_norm(corpus, vec_col, "v").select(F.col(id_col).alias("__vid"), "v")
    c = centroids.select("cid", F.col("centroid").alias("cv"))
    dist2 = F.expr(
        "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    row = (
        base.join(F.broadcast(c))
        .groupBy("__vid")
        .agg(F.min(dist2).alias("d"))
        .agg(F.avg("d").alias("mse"))
        .collect()[0]
    )
    return float(row["mse"])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.
    Join is equi on bucket → hash join, no cross product. Recall is
    governed by num_planes (fewer planes → bigger buckets → higher
    recall, more compute)."""
    planes = random_hyperplanes(dim, num_planes, seed)
    c = hyperplane_buckets(with_norm(corpus, vec_col, "cv"), vec_col, planes).select(
        F.col(id_col).alias("corpus_id"), "cv", "cv_norm", "bucket"
    )
    q = hyperplane_buckets(with_norm(queries, vec_col, "qv"), vec_col, planes).select(
        F.col(id_col).alias("query_id"), "qv", "qv_norm", "bucket"
    )
    dot = F.expr(DOT.format(a="qv", b="cv"))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            (dot / (F.col("qv_norm") * F.col("cv_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
