"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: broadcast the query set, exact cosine/dot per
  (query, candidate), window top-k. The correct baseline and the verifier
  for approximate variants. Scales as |Q|×N — fine for |Q| in the thousands
  when N-partitioned.
- ``lsh_topk``: random-hyperplane LSH — a vectorized numpy pandas-UDF
  computes the signature (one matmul per Arrow batch), candidates join on
  bucket, exact re-rank within bucket. The 100 TB path: the expensive
  cross-product is replaced by a bucket-keyed shuffle.

Dot products stay JVM-side via zip_with+aggregate (sequential IEEE fold —
deterministic, oracle-reproducible). Quantized variant multiplies
round(x*1000) longs for cross-engine exactness.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _qdot(a, b):
    """Quantized integer dot product — bit-exact across engines."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.round(x.cast("double") * 1000).cast("long")
            * F.round(y.cast("double") * 1000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """(query_id, vec_id, score, rank) — rank 1..k per query, ties broken by
    candidate id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    joined = candidates.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    if metric == "cosine":
        score = _dot(F.col(vec_col), F.col("__qv")) / (
            _norm(F.col(vec_col)) * _norm(F.col("__qv"))
        )
    elif metric == "dot":
        score = _dot(F.col(vec_col), F.col("__qv"))
    elif metric == "qdot":
        score = _qdot(F.col(vec_col), F.col("__qv"))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = joined.withColumn("score", score)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).astype(np.float64)


def _bucket_col(
    vec_col: str, dim: int, num_planes: int, seed: int
) -> Column:
    """Hyperplane-signature bucket as a Column expression (one numpy matmul
    per Arrow batch — no per-row Python)."""
    planes = _hyperplanes(dim, num_planes, seed)

    @pandas_udf(T.IntegerType())
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) >= 0  # (batch, planes)
        vals = (bits * (1 << np.arange(num_planes))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    return sig(F.col(vec_col))


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature via one numpy matmul per Arrow batch
    (vectorized pandas UDF — no per-row Python)."""
    return df.withColumn(out, _bucket_col(vec_col, dim, num_planes, seed))


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates and queries share a hyperplane bucket;
    exact cosine re-rank inside the bucket.

    num_tables > 1 is the standard recall lever: each table hashes with an
    independent plane set (seed+t); a candidate is examined if it collides
    with the query in ANY table (1-(1-p^planes)^tables retall curve). In
    plan terms each row explodes to num_tables (table, bucket) keys and the
    join keys on the pair — same bucket-keyed shuffle, ×tables volume;
    duplicates across tables collapse before the re-rank window."""
    def keyed(df, id_alias=None, keep_vec_as=None):
        cols = [
            F.struct(
                F.lit(t).alias("tbl"),
                _bucket_col(vec_col, dim, num_planes, seed + t).alias("b"),
            )
            for t in range(num_tables)
        ]
        out = df.withColumn("__tb", F.explode(F.array(*cols)))
        sel = [
            F.col(id_col).alias(id_alias) if id_alias else F.col(id_col),
            F.col("__tb.tbl").alias("tbl"),
            F.col("__tb.b").alias("bucket"),
        ]
        if keep_vec_as:
            sel.insert(1, F.col(vec_col).alias(keep_vec_as))
        else:
            sel.insert(1, F.col(vec_col))
        return out.select(*sel)

    cb = keyed(candidates)
    qb = keyed(queries, id_alias="query_id", keep_vec_as="__qv")
    joined = (
        cb.join(F.broadcast(qb), on=["tbl", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .dropDuplicates(["query_id", id_col])
    )
    score = _dot(F.col(vec_col), F.col("__qv")) / (
        _norm(F.col(vec_col)) * _norm(F.col("__qv"))
    )
    scored = joined.withColumn("score", score)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank", "bucket")
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 64,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Coarse-quantizer centroids for IVF, k-means on a driver-side sample —
    the standard faiss-style recipe (the quantizer trains on a bounded
    sample regardless of corpus size; only assignment runs distributed).
    Returns a (k, dim) float64 array; feed to ivf_assign/ivf_topk."""
    sample = df.select(vec_col)
    n = sample.limit(sample_rows * 2).count()
    if n > sample_rows:
        sample = sample.sample(fraction=min(1.0, sample_rows / n * 1.2), seed=seed)
    X = np.vstack(
        [np.asarray(r[0], dtype=np.float64) for r in sample.limit(sample_rows).collect()]
    )
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        # cosine assignment: normalize, argmax dot
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        Cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        assign = (Xn @ Cn.T).argmax(axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out: str = "cell",
) -> DataFrame:
    """Nearest-centroid (cosine) cell id via one numpy matmul per Arrow
    batch — the IVF inverted-list key. Centroids broadcast inside the UDF
    closure (a few KB)."""
    C = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @pandas_udf(T.IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ C.T).argmax(axis=1).astype(np.int32))

    return df.withColumn(out, cell(F.col(vec_col)))


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: candidates key on their ONE nearest cell;
    each query probes its n_probe nearest cells (explode) and re-ranks
    exactly inside them. The expensive side shuffles once by cell id; the
    query side (small) broadcasts — the faiss IVF-flat plan in DataFrame
    form. Raise n_probe for recall, cells (len(centroids)) for pruning."""
    C = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    n_probe = min(n_probe, len(C))

    cb = ivf_assign(candidates, centroids, vec_col, out="cell")

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ C.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    qb = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            probe_cells(F.col(vec_col)).alias("__cells"),
        )
        .select("query_id", "__qv", F.explode("__cells").alias("cell"))
    )
    joined = cb.join(F.broadcast(qb), on="cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    score = _dot(F.col(vec_col), F.col("__qv")) / (
        _norm(F.col(vec_col)) * _norm(F.col("__qv"))
    )
    scored = joined.withColumn("score", score)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank", "cell")
    )


def quantized_hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[int]]:
    """round(gauss*1000) integer hyperplanes — the quantized twin of
    ``_hyperplanes``. A plain list of ints, so the SAME constants can be
    inlined into a SQL oracle: the bucket assignment becomes bit-exact
    integer math in any engine."""
    return [
        [int(round(x * 1000)) for x in row]
        for row in _hyperplanes(dim, num_planes, seed)
    ]


def _quantize(vec_col: Column) -> Column:
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * 1000).cast("long")
    )


def add_lsh_bucket_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 4,
    seed: int = 42,
    out: str = "bucket",
    qe_out: str | None = None,
) -> DataFrame:
    """Random-hyperplane signature in pure integer JVM expressions: quantize
    the vector to round(x*1000) longs, take the sign of the integer dot with
    each quantized plane. Deterministic across engines/retries (no float
    summation-order hazards), stays inside whole-stage codegen.

    qe_out keeps the quantized vector as a column (reused by the near-dup
    re-rank so quantization happens once)."""
    planes = quantized_hyperplanes(dim, num_planes, seed)
    qe = _quantize(F.col(vec_col))
    tmp = "__qe" if qe_out is None else qe_out
    df = df.withColumn(tmp, qe)
    bucket = F.lit(0)
    for p, row in enumerate(planes):
        plane_arr = F.array(*[F.lit(v).cast("long") for v in row])
        dot = F.aggregate(
            F.zip_with(F.col(tmp), plane_arr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    df = df.withColumn(out, bucket.cast("int"))
    return df.drop(tmp) if qe_out is None else df


def embedding_near_dups_quantized(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 4,
    seed: int = 42,
    threshold_num: int = 2,
    threshold_den: int = 5,
    persist: bool = True,
) -> DataFrame:
    """Near-duplicate pairs with cosine ≥ threshold_num/threshold_den,
    integer-exact and LSH-bucket-pruned: the bucket equi-join replaces the
    N² cross product (this is the checked AND the 100 TB path — one code).

    cos(a,b) ≥ n/d  ⟺  qdot > 0 ∧ d²·qdot² ≥ n²·qn_a·qn_b over the
    quantized longs — no floats cross an engine or shuffle boundary.
    Returns (vec_a, vec_b, qdot). Recall follows the hyperplane collision
    bound (1-θ/π)^planes; raise recall with fewer planes or a union over
    several seeds.

    persist=True caches the NARROW projected side (id, bucket, quantized
    vector, norm — no payload) before the self-join: without it Spark
    evaluates the quantization + num_planes bucket dots twice, once per
    join side. Caller may spark.catalog.clearCache() when done."""
    b = add_lsh_bucket_quantized(
        df.select(id_col, vec_col), vec_col, dim, num_planes, seed, qe_out="__qe"
    )
    qn = F.aggregate(
        F.zip_with(F.col("__qe"), F.col("__qe"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    e = b.select(id_col, "bucket", "__qe", qn.alias("__qn"))
    if persist:
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    a, c = e.alias("a"), e.alias("b")
    qd = F.aggregate(
        F.zip_with(F.col("a.__qe"), F.col("b.__qe"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n2, d2 = threshold_num * threshold_num, threshold_den * threshold_den
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            qd.alias("qdot"),
            F.col("a.__qn").alias("__qn_a"),
            F.col("b.__qn").alias("__qn_b"),
        )
        .filter(
            (F.col("qdot") > 0)
            & (F.col("qdot") * F.col("qdot") * d2 >= F.col("__qn_a") * F.col("__qn_b") * n2)
        )
        .select("vec_a", "vec_b", "qdot")
    )


def lsh_topk_quantized(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    num_planes: int = 4,
    seed: int = 42,
    num_tables: int = 2,
) -> DataFrame:
    """Multi-table LSH top-k, integer-exact twin of ``lsh_topk``: quantized
    hyperplane buckets per table (independent plane set per table, seed+t),
    per-table bucket equi-join, cross-table dedup, re-rank by the quantized
    integer dot (metric='qdot' of ``brute_force_topk``). Every number that
    crosses an engine boundary is an int64, so a SQL oracle reproduces the
    exact result from the same inlined plane constants (the
    ``embedding_neardup`` recipe applied to top-k).

    Physical shape is unchanged from the float path: candidates explode to
    (table, bucket) and shuffle once on that key; the (small) query side
    broadcasts — flip to a shuffle join if queries become a corpus."""

    def keyed(df, id_alias, qe_name):
        out = df.select(
            F.col(id_col).alias(id_alias), _quantize(F.col(vec_col)).alias(qe_name)
        )
        tables = []
        for t in range(num_tables):
            planes = quantized_hyperplanes(dim, num_planes, seed + t)
            b = F.lit(0)
            for p, row in enumerate(planes):
                arr = F.array(*[F.lit(v).cast("long") for v in row])
                dot = F.aggregate(
                    F.zip_with(F.col(qe_name), arr, lambda a, c: a * c),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                b = b + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            tables.append(F.struct(F.lit(t).alias("tbl"), b.cast("int").alias("b")))
        out = out.withColumn("__tb", F.explode(F.array(*tables)))
        return out.select(
            id_alias, qe_name,
            F.col("__tb.tbl").alias("tbl"), F.col("__tb.b").alias("bucket"),
        )

    cb = keyed(candidates, id_col, "__qe")
    qb = keyed(queries, "query_id", "__qv")
    joined = (
        cb.join(F.broadcast(qb), on=["tbl", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .dropDuplicates(["query_id", id_col])
    )
    qdot = F.aggregate(
        F.zip_with(F.col("__qe"), F.col("__qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = joined.withColumn("qdot", qdot)
    w = Window.partitionBy("query_id").orderBy(F.col("qdot").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "qdot", "rank")
    )


def _cell_scores(qe_col: Column, centroids_q: list[list[int]]) -> list[Column]:
    """Per-centroid quantized-cosine score: int64 dot / python-float ‖c‖.
    The norm is a compile-time double literal, so a SQL oracle inlining the
    SAME repr() literal performs the bit-identical IEEE division."""
    import math

    out = []
    for row in centroids_q:
        arr = F.array(*[F.lit(v).cast("long") for v in row])
        qd = F.aggregate(
            F.zip_with(qe_col, arr, lambda a, c: a * c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        out.append(qd.cast("double") / F.lit(math.sqrt(sum(v * v for v in row))))
    return out


def ivf_topk_quantized(
    candidates: DataFrame,
    queries: DataFrame,
    centroids_q: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF top-k with an INTEGER coarse quantizer — the oracle-checkable
    twin of ``ivf_topk``. Cell assignment maximizes qdot(qe, c)/‖c‖ (the
    query-side norm is constant within a row's argmax, so this IS cosine
    argmax); ties take the smaller cell id. Candidates key on their one
    argmax cell and shuffle once; each query probes its n_probe best cells
    (explode) and re-ranks by integer qdot. Every cross-engine value is an
    int64 or a deterministic double of int64s, so DuckDB reproduces the
    result from a VALUES table of the same centroids
    (k-means-trained float centroids stay available via ``ivf_topk``; the
    pytest n_probe=K ≡ brute-force equivalence covers quantizer quality).

    Tie hazard, documented: two distinct cells give equal double scores
    only if qdot_i·‖c_j‖ == qdot_j·‖c_i‖ to 53 bits — both engines then
    break by cell id identically."""
    n_probe = min(n_probe, len(centroids_q))

    def scored_cells(df, id_alias, qe_name):
        out = df.select(
            F.col(id_col).alias(id_alias), _quantize(F.col(vec_col)).alias(qe_name)
        )
        cells = [
            F.struct(s.alias("s"), F.lit(-c).alias("nc"))
            for c, s in enumerate(_cell_scores(F.col(qe_name), centroids_q))
        ]
        # array_sort asc on (s, nc), reversed → s desc, then nc desc = cell asc
        return out.withColumn(
            "__order", F.reverse(F.array_sort(F.array(*cells)))
        )

    cb = scored_cells(candidates, id_col, "__qe").select(
        id_col, "__qe", (-F.col("__order")[0].nc).alias("cell")
    )
    qb = (
        scored_cells(queries, "query_id", "__qv")
        .select(
            "query_id", "__qv",
            F.explode(
                F.transform(F.slice("__order", 1, n_probe), lambda x: -x.nc)
            ).alias("cell"),
        )
    )
    joined = cb.join(F.broadcast(qb), on="cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    qdot = F.aggregate(
        F.zip_with(F.col("__qe"), F.col("__qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = joined.withColumn("qdot", qdot)
    w = Window.partitionBy("query_id").orderBy(F.col("qdot").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "qdot", "rank", "cell")
    )


def quantized_pq_codebooks(
    dim: int, m: int, ksub: int, seed: int = 42, scale: int = 700
) -> list[list[list[int]]]:
    """Seeded integer PQ codebooks: m subspaces × ksub centroids × (dim/m)
    ints (round(gauss·scale)). Plain nested lists so the SAME constants can
    be inlined into a SQL oracle — the faiss-style k-means-trained float
    path is ``pq_train_codebooks``; quantizer QUALITY is a pytest concern,
    cross-engine EXACTNESS is this one's."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    return [
        [
            [int(round(x * scale)) for x in rng.standard_normal(dim // m)]
            for _ in range(ksub)
        ]
        for _ in range(m)
    ]


def pq_train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks, k-means per subspace on a bounded
    driver-side sample (the faiss recipe — training is O(sample), only
    encode/search run distributed). Returns (m, ksub, dim/m) float64."""
    sample = df.select(vec_col)
    n = sample.limit(sample_rows * 2).count()
    if n > sample_rows:
        sample = sample.sample(fraction=min(1.0, sample_rows / n * 1.2), seed=seed)
    X = np.vstack(
        [np.asarray(r[0], dtype=np.float64) for r in sample.limit(sample_rows).collect()]
    )
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cents = S[rng.choice(len(S), size=min(ksub, len(S)), replace=False)]
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                mem = S[assign == c]
                if len(mem):
                    cents[c] = mem.mean(axis=0)
        books[j, : len(cents)] = cents
        if len(cents) < ksub:  # degenerate tiny sample: repeat last centroid
            books[j, len(cents) :] = cents[-1]
    return books


def _sq_l2(a: Column, b: Column) -> Column:
    """Integer squared L2 between two int64 arrays (bit-exact anywhere)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_sub(qe: Column, j: int, dsub: int) -> Column:
    return F.slice(qe, j * dsub + 1, dsub)


def pq_encode_quantized(
    df: DataFrame,
    codebooks_q: list[list[list[int]]],
    vec_col: str = "embedding",
    residual_of: list[list[int]] | None = None,
    cell_col: str = "cell",
    out: str = "code",
    qe_col: str | None = None,
) -> DataFrame:
    """PQ codes over quantized int64 vectors, pure JVM expressions: per
    subspace j the code is argmin_c ‖qe_sub − codebook[j][c]‖² (ties →
    smaller c, same rule both engines). With ``residual_of`` (the coarse
    IVF centroids) the encoded vector is the RESIDUAL qe − centroid[cell]
    — faiss IVFADC. Output ``out`` is an array<int> of m codes; 8 codes
    replace 64 floats (32× memory/IO compression — the reason PQ survives
    100 TB: the re-rank scan reads codes, never raw vectors)."""
    m = len(codebooks_q)
    dsub = len(codebooks_q[0][0])
    qe: Column = _quantize(F.col(vec_col)) if qe_col is None else F.col(qe_col)
    if residual_of is not None:
        cents = F.array(
            *[F.array(*[F.lit(v).cast("long") for v in row]) for row in residual_of]
        )
        cv = F.element_at(cents, F.col(cell_col) + 1)
        qe = F.zip_with(qe, cv, lambda a, b: a - b)
    codes = []
    for j in range(m):
        sub = _pq_sub(qe, j, dsub)
        cands = [
            F.struct(
                _sq_l2(sub, F.array(*[F.lit(v).cast("long") for v in cvec])).alias("d"),
                F.lit(c).alias("c"),
            )
            for c, cvec in enumerate(codebooks_q[j])
        ]
        codes.append(F.array_sort(F.array(*cands))[0]["c"])
    return df.withColumn(out, F.array(*codes))


def ivfpq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    centroids_q: list[list[int]],
    codebooks_q: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-PQ (faiss IVFADC) top-k, integer-exact: candidates assign to
    their argmax coarse cell and PQ-encode the RESIDUAL once — from then on
    a candidate is (id, cell, m codes): the raw vector never enters the
    search shuffle. Each query probes its n_probe best cells, computes one
    ADC distance table per probed cell (m × ksub int64 squared-L2 entries
    against its own residual), and scoring a candidate is m table lookups:
    adist = Σ_j dtab[j][code_j]. Rank ascending by adist (squared-L2
    approximation), ties by candidate id.

    Physical plan: candidates shuffle ONCE keyed by cell; the query side
    (probes × dtabs, a few KB/query) broadcasts; the window tops-k per
    query. Identical exchange shape to ``ivf_topk_quantized`` but the
    shuffled payload is m ints instead of the vector — at 10^12 rows that
    is the difference between shuffling 4 TB and 128 TB. Every value is
    int64, so the DuckDB oracle replays cells, residuals, codes, tables and
    ranks exactly from the same inlined constants."""
    m = len(codebooks_q)
    ksub = len(codebooks_q[0])
    dsub = len(codebooks_q[0][0])
    n_probe = min(n_probe, len(centroids_q))
    cents = F.array(
        *[F.array(*[F.lit(v).cast("long") for v in row]) for row in centroids_q]
    )

    def with_cells(df, id_alias, qe_name):
        out = df.select(
            F.col(id_col).alias(id_alias), _quantize(F.col(vec_col)).alias(qe_name)
        )
        cells = [
            F.struct(s.alias("s"), F.lit(-c).alias("nc"))
            for c, s in enumerate(_cell_scores(F.col(qe_name), centroids_q))
        ]
        return out.withColumn("__order", F.reverse(F.array_sort(F.array(*cells))))

    cb = with_cells(candidates, id_col, "__qe").select(
        id_col, "__qe", (-F.col("__order")[0].nc).alias("cell")
    )
    cb = pq_encode_quantized(
        cb, codebooks_q, residual_of=centroids_q, cell_col="cell",
        out="code", qe_col="__qe",
    ).select(id_col, "cell", "code")

    qb = with_cells(queries, "query_id", "__qv").select(
        "query_id", "__qv",
        F.explode(
            F.transform(F.slice("__order", 1, n_probe), lambda x: -x.nc)
        ).alias("cell"),
    )
    qres = F.zip_with(
        F.col("__qv"), F.element_at(cents, F.col("cell") + 1), lambda a, b: a - b
    )
    qb = qb.withColumn("__qres", qres)
    dtab = F.array(
        *[
            F.array(
                *[
                    _sq_l2(
                        _pq_sub(F.col("__qres"), j, dsub),
                        F.array(*[F.lit(v).cast("long") for v in codebooks_q[j][c]]),
                    )
                    for c in range(ksub)
                ]
            )
            for j in range(m)
        ]
    )
    qb = qb.select("query_id", "cell", dtab.alias("__dtab"))

    joined = cb.join(F.broadcast(qb), on="cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    adist = reduce(
        lambda acc, j: acc
        + F.element_at(
            F.element_at("__dtab", j + 1), F.element_at("code", j + 1) + 1
        ),
        range(m),
        F.lit(0).cast("long"),
    )
    scored = joined.withColumn("adist", adist)
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "adist", "rank", "cell")
    )


def semdedup_quantized(
    df: DataFrame,
    centroids_q: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_num: int = 9,
    threshold_den: int = 10,
) -> DataFrame:
    """Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", §3): cluster the embedding space with a coarse
    quantizer, then prune near-duplicates only WITHIN each cluster — the
    clustering bounds the pairwise work to Σ|cluster|² instead of |corpus|²,
    which is the whole trick that makes cosine dedup feasible at web scale.

    Keep policy: deterministic keep-lowest-id — a row is dropped iff some
    same-cell row with a SMALLER id is a near-dup of it (the paper keeps
    the lowest-centroid-similarity point per duplicate group; any
    within-group representative choice is admissible, and lowest-id is
    order-free, engine-exact, and idempotent on reruns).

    Integer-exact near-dup test over the round(x*1000) quantized vectors
    (the ``embedding_near_dups_quantized`` recipe):

        cos(a,b) ≥ num/den  ⇔  qdot ≥ 0  AND  qdot²·den² ≥ num²·‖a‖²q·‖b‖²q

    Overflow bound (documented, not hoped): |x|≤1 quantizes to ≤1000, so at
    dim 64 qdot ≤ 6.4e7 < 2^26 and qdot² < 2^52; den ≤ 45 keeps den²·qdot²
    < 2^63. Cell assignment is the ``ivf_topk_quantized`` integer argmax
    (qdot/‖c‖ with the same compile-time double norm literals), so a SQL
    oracle replays cells, pairs, and verdicts from a VALUES table of the
    identical centroids.

    Physical shape: one exchange of (id, qe, qn, cell) keyed on cell for the
    self-join (hot cells bound the skew — cell count is the knob), the
    bounded within-cell pair filter, then a (cell-local → id) aggregation of
    earlier-neighbor counts joined back to mark survivors. Payload vectors
    cross the wire once; no all-pairs path exists.

    Returns (id, cell, n_dups, kept): n_dups = count of same-cell smaller-id
    near-dups; kept = (n_dups == 0).
    """

    def assign(alias_id: str, qe_name: str):
        out = df.select(
            F.col(id_col).alias(alias_id), _quantize(F.col(vec_col)).alias(qe_name)
        )
        cells = [
            F.struct(s.alias("s"), F.lit(-c).alias("nc"))
            for c, s in enumerate(_cell_scores(F.col(qe_name), centroids_q))
        ]
        out = out.withColumn(
            "cell", (-F.reverse(F.array_sort(F.array(*cells)))[0].nc).cast("int")
        )
        qn = F.aggregate(
            F.zip_with(F.col(qe_name), F.col(qe_name), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return out.withColumn(f"{qe_name}n", qn)

    base = assign("__id", "__qe")
    a = base.select(
        F.col("__id").alias("__ida"), F.col("__qe").alias("__qa"),
        F.col("__qen").alias("__na"), "cell",
    )
    b = base.select(
        F.col("__id").alias("__idb"), F.col("__qe").alias("__qb"),
        F.col("__qen").alias("__nb"), "cell",
    )
    qdot = F.aggregate(
        F.zip_with(F.col("__qa"), F.col("__qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    num2 = threshold_num * threshold_num
    den2 = threshold_den * threshold_den
    # Neither side of the within-cell self-join is broadcastable (both are
    # the corpus), so hint shuffle_hash: one exchange per side on cell and a
    # hash build of the smaller partition — no sort of either side, which a
    # sort-merge join would add for zero benefit (cells are unordered).
    pairs = (
        a.join(b.hint("shuffle_hash"), on="cell")
        .filter(F.col("__idb") < F.col("__ida"))
        .withColumn("__qd", qdot)
        .filter(
            (F.col("__qd") >= 0)
            & (F.col("__qd") * F.col("__qd") * F.lit(den2)
               >= F.col("__na") * F.col("__nb") * F.lit(num2))
        )
    )
    dup_counts = pairs.groupBy("__ida").agg(
        F.count(F.lit(1)).cast("long").alias("n_dups")
    )
    return (
        base.select(F.col("__id"), "cell")
        # dup_counts is ≤ one row per duplicated doc — usually small but
        # corpus-bounded, so not safely broadcastable; shuffle_hash keeps
        # the survivor mark-back sort-free too.
        .join(dup_counts.hint("shuffle_hash"),
              base["__id"] == dup_counts["__ida"], "left")
        .select(
            F.col("__id").alias(id_col),
            "cell",
            F.coalesce(F.col("n_dups"), F.lit(0).cast("long")).alias("n_dups"),
            (F.coalesce(F.col("n_dups"), F.lit(0)) == 0).alias("kept"),
        )
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, bucket-pruned: the LSH
    bucket join replaces the N² cross product."""
    b = add_lsh_bucket(df, vec_col, dim, num_planes, seed)
    a, c = b.alias("a"), b.alias("b")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    score = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        _norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}"))
    )
    return (
        pairs.withColumn("cosine", score)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            "cosine",
        )
    )


def kmeans_train_quantized(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    dim: int = 64,
) -> tuple[DataFrame, list[list[int]]]:
    """Distributed Lloyd k-means over the full corpus — the trainer that
    feeds ``semdedup_quantized`` / ``ivf_topk_quantized`` centroids without
    the driver-side sample cap of ``train_ivf_centroids`` (faiss trains its
    coarse quantizer on a bounded sample; SemDeDup §3 clusters the WHOLE
    embedding table — this is that path, MLlib-KMeans-shaped but
    integer-exact so a SQL oracle can replay every iteration).

    Determinism/exactness contract (same discipline as ``bpe_learn``'s
    unrolled merge replay):

    - vectors quantize to round(x*1000) longs (the repo-wide recipe);
    - seeds = the k rows with smallest (mix32(id), id) — order-free,
      partition-invariant, SQL-replicable;
    - assignment = argmax over cells of qdot(qe, c)/sqrt(max(‖c‖²,1)),
      ties to the smaller cell id. qdot is int64-exact (dim 64 × 1000² →
      ≤ 2^26); the norm is sqrt of an int64 — both engines' IEEE-754
      correctly-rounded sqrt/division agree bit-for-bit, so the argmax
      (and its tie-break) is engine-exact. max(·,1) guards the all-zero
      centroid: its dot is 0 anyway, the guard only avoids 0/0;
    - update = per-cell elementwise FLOOR-division mean of the member qe
      vectors, kept as integers (floor = (s - pmod(s, n)) / n in both
      engines); an emptied cell keeps its previous centroid (standard
      Lloyd degenerate-cell policy, also what faiss does by default).

    Physical shape per iteration (the 100 TB audit): one cached scan of
    (id, qe); assignment is k compile-time score expressions inside
    whole-stage codegen (no join, no Python); the update is a single
    groupBy(cell) with map-side partial aggregation of dim+1 longs —
    the only exchange, k rows × (dim+1) columns on the wire; the k×dim
    integer centroid state collects to the driver exactly like MLlib's
    aggregateByKey-and-broadcast loop (bounded algorithm state, not data).

    Returns (assignments DataFrame (id, cell) under the FINAL centroids,
    final integer centroids).
    """
    import math

    from ..functions.hashing import mix32_col

    qdf = df.select(
        F.col(id_col), _quantize(F.col(vec_col)).alias("__qe")
    ).persist()

    def scores(cents: list[list[int]]) -> list[Column]:
        out = []
        for row in cents:
            arr = F.array(*[F.lit(int(v)).cast("long") for v in row])
            qd = F.aggregate(
                F.zip_with(F.col("__qe"), arr, lambda a, c: a * c),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            ss = sum(int(v) * int(v) for v in row)
            out.append(qd.cast("double") / F.lit(math.sqrt(max(ss, 1))))
        return out

    def assign(cents: list[list[int]]) -> DataFrame:
        cells = [
            F.struct(s.alias("s"), F.lit(-c).alias("nc"))
            for c, s in enumerate(scores(cents))
        ]
        return qdf.withColumn(
            "cell", (-F.reverse(F.array_sort(F.array(*cells)))[0].nc).cast("int")
        )

    seed_rows = (
        qdf.withColumn("__m", mix32_col(F.col(id_col), seed))
        .orderBy("__m", id_col)
        .limit(k)
        .collect()
    )
    cents = [[int(v) for v in r["__qe"]] for r in seed_rows]

    for _ in range(iters):
        sums = (
            assign(cents)
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[F.sum(F.col("__qe")[d]).alias(f"s{d}") for d in range(dim)],
            )
            .collect()
        )
        new_cents = [list(c) for c in cents]
        for r in sums:
            n = r["cnt"]
            new_cents[r["cell"]] = [int(r[f"s{d}"]) // n for d in range(dim)]
        cents = new_cents

    out = assign(cents).select(F.col(id_col), "cell")
    qdf.unpersist(False)  # iterations are done; the final pass re-derives qe in-plan
    return out, cents
