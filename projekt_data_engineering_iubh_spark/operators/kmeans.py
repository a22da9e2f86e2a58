"""DataFrame-native Lloyd k-means over embedding columns.

The coarse-quantizer trainer the IVF operators (plans/vector_queries.py)
assume as given: repeated assign (nearest centroid) + update (per-cell
mean) rounds, expressed entirely as DataFrame ops — the corpus side never
leaves the cluster, the centroid side is k rows broadcast into every
round, the shape Spark's own MLlib k-means executes per iteration.

All arithmetic is exact fixed-point (floats scaled by 2^20 → bigint):

* element quantization: ``floor(x * 2^20)`` — one deterministic float op;
* distances: integer squared-L2 (embedding values |x| < 1 → per-element
  diff² < 2^42, ×64 dims < 2^48 — far inside bigint);
* means: bigint sums are order-independent and EXACT (no FP summation
  nondeterminism across partition orders), then ``floor(sum / n)`` with
  the division done in double (sums < 2^53, so the quotient is exact).

That makes every round bit-reproducible across engines — the property the
DuckDB differential oracle needs — where double-precision means would
hash-mismatch on partition-order-dependent last bits. A production run
that doesn't need cross-engine determinism can use double means
unchanged; the operator shape is identical.

Fixed iteration count (no convergence collect) keeps the whole training
chain one lazy plan; a convergence-driven variant would collect the
k-row centroid delta per round exactly like the connected-components
counter (operators/connected_components.py:77) — k×dim values on the
driver, never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FIXED_SCALE = 1 << 20  # 2^20: exact in double, |x|<1 floats keep 20 bits


def quantize(emb: F.Column) -> F.Column:
    """array<float> → array<bigint> fixed-point at 2^20."""
    return F.transform(
        emb,
        lambda x: F.floor(x.cast("double") * F.lit(float(FIXED_SCALE))).cast(
            "long"
        ),
    )


def quantize_sql(expr: str) -> str:
    return (
        f"list_transform({expr}, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {float(FIXED_SCALE)}) AS BIGINT))"
    )


def quantize_normalized(emb: F.Column) -> F.Column:
    """array<float> → array<bigint>: unit-L2-normalize FIRST, then
    fixed-point at 2^20. On the unit sphere L2²(a,b) = 2 − 2·cos(a,b),
    so integer L2/ADC ranking over these codes IS cosine ranking — the
    r8 method matrix measured cosine-recall 0.14 for L2-ADC over raw
    (unnormalized) vectors; this is the standard fix (normalize at
    index build + query encode, rank by L2).

    Bit-compat contract with :func:`quantize_normalized_sql`: the norm
    is the same double fold both engines use for cosine (proven
    hash-exact by the brute entries), and the expression shape is
    ``floor((x / norm) * scale)`` with identical association on both
    sides.

    Zero-norm guard: an all-zero embedding would divide by zero — NULL
    in Spark, engine-version-dependent (NULL or inf) in DuckDB — so the
    vector would silently drop out of the index on one engine and not
    the other. ``greatest(norm, 1e-30)`` pins both engines to the same
    finite divisor; since every element of a zero-norm vector is zero,
    the quantized result is the exact all-zeros code on both sides."""
    from projekt_data_engineering_iubh_spark.functions import vectors as vx

    n = F.greatest(vx.norm(emb), F.lit(1e-30))
    return F.transform(
        emb,
        lambda x: F.floor(
            x.cast("double") / n * F.lit(float(FIXED_SCALE))
        ).cast("long"),
    )


def quantize_normalized_sql(expr: str) -> str:
    from projekt_data_engineering_iubh_spark.functions import vectors as vx

    n = f"greatest({vx.norm_sql(expr)}, 1e-30)"
    return (
        f"list_transform({expr}, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" / ({n}) * {float(FIXED_SCALE)}) AS BIGINT))"
    )


def _int_sq_dist(a: F.Column, b: F.Column) -> F.Column:
    sq = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v)


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, qemb) × (cell, cq) →
    (vec_id, qemb, cell, dist). Ties break to the lowest cell id.

    The centroid side is k rows — Spark broadcasts the cross join, so the
    corpus scan stays partition-local; the per-vector argmin is a
    ``min_by`` aggregate (struct ordering = lexicographic, so
    ``struct(dist, cell)`` reproduces the dist-then-lowest-cell
    tie-break). Declarative aggregates combine map-side: each input
    partition reduces its k candidate rows per vector to ONE before the
    vec_id shuffle — k× less shuffle traffic than a row_number window,
    which must move all k candidates per vector to one reducer.
    """
    cross = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", _int_sq_dist(F.col("qemb"), F.col("cq"))
    )
    best = cross.groupBy("vec_id").agg(
        F.min_by(
            F.struct("qemb", "cell", "dist"), F.struct("dist", "cell")
        ).alias("best")
    )
    return best.select(
        "vec_id", "best.qemb", "best.cell", "best.dist"
    )


def update_centroids(assign: DataFrame, dim: int) -> DataFrame:
    """Per-cell elementwise fixed-point mean → (cell, cq).

    posexplode → groupBy(cell, pos) is the classic two-level mean: partial
    sums combine map-side, the shuffle carries (cell, pos, sum, count) —
    k×dim rows — and the re-pack is a k-row groupBy. Cells that lost every
    member emit no row (k shrinks), same as the oracle's GROUP BY.
    """
    elems = assign.select("cell", F.posexplode("qemb").alias("pos", "val"))
    means = elems.groupBy("cell", "pos").agg(
        F.floor(
            F.sum("val").cast("double") / F.count(F.lit(1)).cast("double")
        )
        .cast("long")
        .alias("m")
    )
    packed = means.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s.getField("m"),
        ).alias("cq")
    )
    # a re-packed centroid missing elements would poison every later
    # distance (zip_with truncates silently) — fail loudly instead
    return packed.select(
        "cell",
        F.when(F.size("cq") == dim, F.col("cq"))
        .otherwise(
            F.raise_error(
                F.format_string(
                    "update_centroids: packed %d elems, expected "
                    + str(dim),
                    F.size("cq"),
                )
            )
        )
        .alias("cq"),
    )


def kmeans_train(
    vectors: DataFrame, k: int, iters: int, dim: int
) -> DataFrame:
    """``iters`` Lloyd rounds over (vec_id, qemb) fixed-point vectors →
    the trained centroids (cell, cq). Seeds are the k lowest vec_ids
    (deterministic — a production variant would hash-sample seeds, same
    shape). Exposed separately from :func:`kmeans_fixed_point` so callers
    that need the CODEBOOK itself (per-subspace PQ training,
    plans/vector_queries.py::emb_pq_adc_trained) reuse the exact same
    rounds the assignment query verifies cross-engine."""
    centroids = vectors.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("qemb").alias("cq")
    )
    for _ in range(iters):
        assign = assign_cells(vectors, centroids)
        centroids = update_centroids(assign, dim)
    return centroids


def kmeans_fixed_point(
    emb: DataFrame, k: int, iters: int, dim: int
) -> DataFrame:
    """Train k-means and return the final assignment (vec_id, cell, dist):
    ``iters`` full Lloyd rounds (:func:`kmeans_train`), then one final
    assignment against the trained centroids."""
    vectors = emb.select("vec_id", quantize(F.col("embedding")).alias("qemb"))
    centroids = kmeans_train(vectors, k, iters, dim)
    return assign_cells(vectors, centroids).select("vec_id", "cell", "dist")


# ---------------------------------------------------------------------------
# DuckDB oracle rendering (same rounds, same fixed-point arithmetic)
# ---------------------------------------------------------------------------


def _assign_sql(src: str, cent: str, dim: int) -> str:
    dist = (
        f"list_reduce(list_transform(range(1, {dim} + 1), "
        f"i -> (v.qemb[i] - c.cq[i]) * (v.qemb[i] - c.cq[i])), "
        f"(x, y) -> x + y)"
    )
    return (
        f"SELECT vec_id, qemb, cell, dist FROM (\n"
        f"  SELECT v.vec_id, v.qemb, c.cell, {dist} AS dist,\n"
        f"         ROW_NUMBER() OVER (PARTITION BY v.vec_id\n"
        f"             ORDER BY {dist}, c.cell) AS rn\n"
        f"  FROM {src} v CROSS JOIN {cent} c\n"
        f") WHERE rn = 1"
    )


def _update_sql(assign: str, dim: int) -> str:
    return (
        f"SELECT cell, list(m ORDER BY pos) AS cq FROM (\n"
        f"  SELECT cell, i AS pos,\n"
        f"         CAST(floor(CAST(SUM(val) AS DOUBLE)"
        f" / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS m\n"
        f"  FROM (SELECT cell, i, qemb[i] AS val\n"
        f"        FROM {assign}, range(1, {dim} + 1) t(i))\n"
        f"  GROUP BY cell, i\n"
        f") GROUP BY cell"
    )


def kmeans_train_sql_ctes(
    src_sql: str, k: int, iters: int, dim: int, prefix: str
) -> tuple[str, str]:
    """CTE chain mirroring :func:`kmeans_train` over an arbitrary source
    query producing (vec_id, qemb). Returns (CTE list fragment, name of
    the final CENTROID CTE). ``prefix`` namespaces the chain so several
    trainings (one per PQ subspace) compose in one statement."""
    parts = [
        f"{prefix}qv AS ({src_sql})",
        f"{prefix}c0 AS (SELECT CAST(vec_id AS INTEGER) AS cell, qemb AS cq"
        f" FROM {prefix}qv WHERE vec_id < {k})",
    ]
    cent = f"{prefix}c0"
    for r in range(1, iters + 1):
        parts.append(
            f"{prefix}a{r} AS ({_assign_sql(f'{prefix}qv', cent, dim)})"
        )
        parts.append(f"{prefix}c{r} AS ({_update_sql(f'{prefix}a{r}', dim)})")
        cent = f"{prefix}c{r}"
    return ",\n".join(parts), cent


def kmeans_sql_ctes(k: int, iters: int, dim: int) -> tuple[str, str]:
    """(CTE chain, final assignment CTE name) mirroring
    :func:`kmeans_fixed_point` on the ``embeddings`` view."""
    parts = [
        f"qv AS (SELECT vec_id, {quantize_sql('embedding')} AS qemb"
        f" FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INTEGER) AS cell, qemb AS cq"
        f" FROM qv WHERE vec_id < {k})",
    ]
    cent = "c0"
    for r in range(1, iters + 1):
        parts.append(f"a{r} AS ({_assign_sql('qv', cent, dim)})")
        parts.append(f"c{r} AS ({_update_sql(f'a{r}', dim)})")
        cent = f"c{r}"
    final = f"a{iters + 1}"
    parts.append(f"{final} AS ({_assign_sql('qv', cent, dim)})")
    return "WITH " + ",\n".join(parts), final
