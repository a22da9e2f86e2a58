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

from pyspark.sql import DataFrame, Window, functions as F

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


def kmeans_train_ranked(
    vectors: DataFrame, k: int, iters: int, dim: int
) -> DataFrame:
    """:func:`kmeans_train` for NON-DENSE id spaces: seeds are the k
    lowest vec_ids BY RANK (cell = rank − 1), so a corpus half (odd
    vec_ids), a stride sample, or a centroid table all seed correctly —
    ``vec_id < k`` only works when ids are dense from 0. The seed pick
    is a TakeOrderedAndProject (orderBy + limit — no global sort
    shuffle); the rank window then runs over k rows only."""
    seeds = (
        vectors.orderBy("vec_id")
        .limit(k)
        .withColumn(
            "cell",
            (F.row_number().over(Window.orderBy("vec_id")) - 1).cast("int"),
        )
        .select("cell", F.col("qemb").alias("cq"))
    )
    centroids = seeds
    for _ in range(iters):
        centroids = update_centroids(assign_cells(vectors, centroids), dim)
    return centroids


def kmeans_train_ranked_routed(
    vectors: DataFrame,
    k: int,
    iters: int,
    dim: int,
    *,
    n_probe_super: int | None = None,  # default ROUTER_SUPER_PROBES
) -> DataFrame:
    """:func:`kmeans_train_ranked` with ROUTER-ASSISTED Lloyd assignment
    (r12): exact Lloyd's per-iteration assignment is O(n·k) folds, which
    at production geometry (cells ∝ n, so k = n/64) makes TRAINING the
    quadratic term — at 1M vectors / 15.6k cells that is ~47B folds,
    hours on this box and unpayable at 100 TB. Here each iteration
    trains the two-level router over the CURRENT centroids (√k supers —
    a k-row job) and assigns through it (~(√k + 2k/√k) folds/vector, the
    measured 6.7× fold cut), then updates means as usual. This is
    exactly how FAISS trains large-k IVF (assignment via the coarse
    quantizer HNSW/IVF itself), and the r10 consistency result says
    approximate-but-consistent assignment is what matters downstream.

    NOT a drop-in replacement for the certified exact trainer: routed
    assignment can disagree with exact argmin near cell boundaries, so
    centroids differ from exact Lloyd's — registry oracles that
    replicate exact Lloyd (#153, #157-#159) keep using
    :func:`kmeans_train_ranked`. A routed-training oracle is renderable
    (router_sql_ctes + route_top_cells_sql compose per iteration) when
    an entry wants it. Per-iteration centroid frames are pinned
    (localCheckpoint) — the Lloyd-chain lineage trap."""
    seeds = (
        vectors.orderBy("vec_id")
        .limit(k)
        .withColumn(
            "cell",
            (F.row_number().over(Window.orderBy("vec_id")) - 1).cast("int"),
        )
        .select("cell", F.col("qemb").alias("cq"))
    )
    centroids = seeds.localCheckpoint(eager=True)
    if n_probe_super is None:
        n_probe_super = ROUTER_SUPER_PROBES
    # route_top_cells CONSUMES qemb; the mean update still needs the
    # vector, so it rides the routing aggregates under a second name
    # (cheaper than joining the assignment back on vec_id)
    carried = vectors.withColumn("_kept", F.col("qemb"))
    for _ in range(iters):
        router = train_router(centroids, dim)
        asg = route_top_cells(
            router, carried, "vec_id", ["_kept"], 1,
            n_probe_super=n_probe_super,
        ).withColumnRenamed("_kept", "qemb")
        centroids = update_centroids(asg, dim).localCheckpoint(eager=True)
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


# ---------------------------------------------------------------------------
# Two-level coarse router (productized from tools/knn_join_scale.py r10)
# ---------------------------------------------------------------------------
#
# Broadcast-argmin assignment is O(n·cells) distance folds; at production
# cell counts (cells ∝ corpus, r10 scale law) the coarse quantizer itself
# needs sublinear search. The router trains √cells super-cells OVER THE
# CENTROID TABLE (tiny), routes each vector to its ROUTER_SUPER_PROBES
# nearest super-cells, and ranks only the centroids inside them:
# ~(√k + 2k/√k) folds per vector instead of k (measured r10: 60 vs 400
# folds/vector at k=400, assignment wall 29.6 s → 13.4 s at 100k).
#
# The routing is APPROXIMATE (the true nearest centroid can hide in an
# unprobed super-cell; 60.7% of vectors routed differently from exact
# argmin in the r10 measurement) — which is exactly why the consistency
# contract matters: a kNN JOIN's recall depends on both sides agreeing
# on WHERE a region of space lives, not on argmin fidelity (join recall
# held at 0.140 vs 0.156 under that 60.7% disagreement). Therefore the
# router object is trained ONCE and both sides route through the SAME
# instance; corpus assignment (route_top_cells n_cells=1) is by
# construction the first probe of query routing (same ranking, same
# tie-break) — pinned by tests/test_kmeans_router.py. The asymmetric
# SERVE case (stored corpus assignment + later queries) must persist and
# reuse the router's super/centroid tables for the same reason.

ROUTER_SUPER_PROBES = 2


class TwoLevelRouter:
    """Trained two-level coarse quantizer.

    ``supers``: (super_cell, scq) — √k super-centroids trained on the
    centroid table; ``cent_super``: (cell, cq, super_cell) — every
    centroid routed to its single nearest super. Both are k-row-scale
    frames, broadcast into every routing join, never data-sized."""

    def __init__(self, supers: DataFrame, cent_super: DataFrame):
        self.supers = supers
        self.cent_super = cent_super


def train_router(
    cents: DataFrame, dim: int, *, iters: int = 2, n_super: int | None = None
) -> TwoLevelRouter:
    """Train the super-quantizer over a centroid table (cell, cq).

    ``n_super`` defaults to max(2, isqrt(k)) with k the MATERIALIZED
    centroid count (Lloyd's update drops empty cells, so k can be less
    than requested) — the count is a scalar collect over a k-row frame.
    Super training reuses the exact fixed-point Lloyd rounds
    (:func:`kmeans_train_ranked` — centroid ids are not dense after
    empty-cell drops), so the whole router is bit-reproducible across
    engines and :func:`router_sql_ctes` can mirror it for the DuckDB
    differential oracle."""
    import math

    k = cents.count()
    if n_super is None:
        n_super = max(2, math.isqrt(k))
    cvecs = cents.select(
        F.col("cell").cast("long").alias("vec_id"), F.col("cq").alias("qemb")
    )
    supers = kmeans_train_ranked(cvecs, n_super, iters, dim).select(
        F.col("cell").alias("super_cell"), F.col("cq").alias("scq")
    )
    cent_super = (
        cents.crossJoin(F.broadcast(supers))
        .withColumn("sd", _int_sq_dist(F.col("cq"), F.col("scq")))
        .groupBy("cell")
        .agg(
            F.min_by(
                F.struct("cq", "super_cell"), F.struct("sd", "super_cell")
            ).alias("b")
        )
        .select("cell", "b.cq", "b.super_cell")
    )
    return TwoLevelRouter(supers, cent_super)


def _route_supers(
    router: TwoLevelRouter,
    rows: DataFrame,
    id_col: str,
    keep: list[str],
    n_probe_super: int = ROUTER_SUPER_PROBES,
) -> DataFrame:
    """(id, *keep, qemb) → one row per (id, probed super_cell), the
    ``n_probe_super`` nearest supers. The default 2 uses two-pass min_by
    (map-side combinable) instead of a row_number window: each pass
    reduces the n_super candidate rows per vector to ONE before the id
    shuffle — the two-pass shape the probe-selection trap list
    mandates. Wider probing (a recall lever when the true nprobe-th
    cell hides in an unprobed super — the r11 trap note) falls back to
    a row_number window over the n_super candidates; same (sd,
    super_cell) tie-break, verified equivalent for n=2 by
    tests/test_kmeans_router.py."""
    sc = rows.crossJoin(F.broadcast(router.supers)).withColumn(
        "sd", _int_sq_dist(F.col("qemb"), F.col("scq"))
    )
    fields = [*keep, "qemb", "super_cell"]
    if n_probe_super != 2:
        w = Window.partitionBy(id_col).orderBy("sd", "super_cell")
        return (
            sc.withColumn("_sr", F.row_number().over(w))
            .filter(F.col("_sr") <= n_probe_super)
            .select(id_col, *fields)
        )
    s1 = sc.groupBy(id_col).agg(
        F.min_by(F.struct(*fields), F.struct("sd", "super_cell")).alias("b")
    )
    p1 = s1.select(id_col, "b.*")
    s2 = (
        sc.join(s1.select(id_col, F.col("b.super_cell").alias("_s1")), id_col)
        .filter(F.col("super_cell") != F.col("_s1"))
        .groupBy(id_col)
        .agg(
            F.min_by(F.struct(*fields), F.struct("sd", "super_cell")).alias(
                "b"
            )
        )
        .select(id_col, "b.*")
    )
    return p1.unionByName(s2)


def route_top_cells(
    router: TwoLevelRouter,
    rows: DataFrame,
    id_col: str,
    keep: list[str],
    n_cells: int,
    *,
    n_probe_super: int = ROUTER_SUPER_PROBES,
) -> DataFrame:
    """Route (id, *keep, qemb) rows to their ``n_cells`` nearest cells
    AS SEEN THROUGH the router: rank only the centroids of the probed
    supers by exact fixed-point distance, tie-break (dist, cell).

    n_cells=1 is corpus assignment (min_by argmin — one row per input
    before the shuffle); n_cells>1 is query probe selection (row_number
    over the ~2k/√k candidate cells per id). Output: (id, *keep, cell)
    [+ nothing else] — qemb is consumed here."""
    cand = (
        _route_supers(router, rows, id_col, keep, n_probe_super)
        .join(F.broadcast(router.cent_super), "super_cell")
        .withColumn("d", _int_sq_dist(F.col("qemb"), F.col("cq")))
    )
    if n_cells == 1:
        return (
            cand.groupBy(id_col)
            .agg(
                F.min_by(
                    F.struct(*keep, "cell"), F.struct("d", "cell")
                ).alias("b")
            )
            .select(id_col, "b.*")
        )
    w = Window.partitionBy(id_col).orderBy("d", "cell")
    return (
        cand.withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= n_cells)
        .select(id_col, *keep, "cell")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle rendering for the ranked trainer and the router
# ---------------------------------------------------------------------------


def sq_dist_sql(a: str, b: str, dim: int) -> str:
    """Exact bigint squared-L2 between two fixed-point list expressions."""
    return (
        f"list_reduce(list_transform(range(1, {dim} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


def kmeans_train_ranked_sql_ctes(
    src_sql: str, k_sql: str, iters: int, dim: int, prefix: str
) -> tuple[str, str]:
    """CTE chain mirroring :func:`kmeans_train_ranked`: seeds are the k
    lowest vec_ids by rank (cell = rank − 1). ``k_sql`` may be any SQL
    scalar expression INCLUDING a scalar subquery — the data-dependent-k
    face (cells ∝ corpus) that a static oracle string needs. Returns
    (CTE fragment, final CENTROID CTE name).

    Source and centroid CTEs are MATERIALIZED: DuckDB inlines a plain
    CTE at every reference site, so an oracle that references the
    trained centroids several times (router training, cent→super
    routing, corpus assignment, query probes) re-executes the whole
    Lloyd chain per reference — measured fatal at sf1 with cells ∝ n
    (the re-expanded tree OOM-killed a 98 GB process, r11). The cost is
    n rows (source) + k rows per round — the same fix _ivfpq_sql's
    ``res`` CTE already encodes."""
    parts = [
        f"{prefix}qv AS MATERIALIZED ({src_sql})",
        f"{prefix}c0 AS MATERIALIZED"
        f" (SELECT CAST(rn - 1 AS INTEGER) AS cell, qemb AS cq"
        f" FROM (SELECT qemb, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn"
        f" FROM {prefix}qv) WHERE rn <= ({k_sql}))",
    ]
    cent = f"{prefix}c0"
    for r in range(1, iters + 1):
        parts.append(
            f"{prefix}a{r} AS ({_assign_sql(f'{prefix}qv', cent, dim)})"
        )
        parts.append(
            f"{prefix}c{r} AS MATERIALIZED"
            f" ({_update_sql(f'{prefix}a{r}', dim)})"
        )
        cent = f"{prefix}c{r}"
    return ",\n".join(parts), cent


def router_sql_ctes(
    cent_cte: str, dim: int, prefix: str, *, iters: int = 2
) -> tuple[str, str, str]:
    """CTEs mirroring :func:`train_router` over a centroid CTE
    (cell, cq). Returns (CTE fragment, supers CTE name, cent_super CTE
    name). n_super = max(2, floor(sqrt(k))) via a scalar subquery over
    the MATERIALIZED centroid count — identical to the Spark side's
    post-training count."""
    n_super_sql = (
        f"SELECT greatest(2, CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)))"
        f" AS BIGINT)) FROM {cent_cte}"
    )
    src = (
        f"SELECT CAST(cell AS BIGINT) AS vec_id, cq AS qemb FROM {cent_cte}"
    )
    chain, sup_cent = kmeans_train_ranked_sql_ctes(
        src, n_super_sql, iters, dim, f"{prefix}s"
    )
    supers = f"{prefix}sup"
    cs = f"{prefix}cs"
    parts = [
        chain,
        # MATERIALIZED: supers and cent_super are referenced by every
        # routing CTE (corpus + queries) — plain CTEs would re-run the
        # super-training chain per reference (see
        # kmeans_train_ranked_sql_ctes for the sf1 OOM this caused)
        f"{supers} AS MATERIALIZED (SELECT cell AS super_cell, cq AS scq"
        f" FROM {sup_cent})",
        f"{cs} AS MATERIALIZED (SELECT cell, cq, super_cell FROM (\n"
        f"  SELECT c.cell, c.cq, s.super_cell,\n"
        f"         ROW_NUMBER() OVER (PARTITION BY c.cell ORDER BY\n"
        f"           {sq_dist_sql('c.cq', 's.scq', dim)}, s.super_cell)"
        f" AS rn\n"
        f"  FROM {cent_cte} c CROSS JOIN {supers} s) WHERE rn = 1)",
    ]
    return ",\n".join(parts), supers, cs


def route_top_cells_sql(
    src_cte: str,
    id_col: str,
    keep: list[str],
    n_cells: int,
    supers_cte: str,
    cent_super_cte: str,
    dim: int,
    prefix: str,
    n_probe_super: int = ROUTER_SUPER_PROBES,
) -> tuple[str, str]:
    """CTEs mirroring :func:`route_top_cells` over a source CTE
    (id, *keep, qemb): ROUTER_SUPER_PROBES nearest supers, then the
    n_cells nearest cells among their centroids, tie-breaks
    (sd, super_cell) / (d, cell). Returns (CTE fragment, result CTE
    name) with columns (id, *keep, cell)."""
    def cols(*items: str) -> str:
        return ", ".join(c for c in items if c)

    ks = ", ".join(keep)
    kv = ", ".join(f"v.{c}" for c in keep)
    kr = ", ".join(f"r.{c}" for c in keep)
    routed = f"{prefix}routed"
    out = f"{prefix}cells"
    parts = [
        # MATERIALIZED: the routed/cells CTEs embed the source scan and
        # the (already-materialized) router tables; downstream joins
        # reference them and must not re-expand the routing windows
        f"{routed} AS MATERIALIZED"
        f" (SELECT {cols(id_col, ks, 'qemb', 'super_cell')}"
        f" FROM (\n"
        f"  SELECT {cols(f'v.{id_col}', kv, 'v.qemb', 's.super_cell')},\n"
        f"         ROW_NUMBER() OVER (PARTITION BY v.{id_col} ORDER BY\n"
        f"           {sq_dist_sql('v.qemb', 's.scq', dim)}, s.super_cell)"
        f" AS sr\n"
        f"  FROM {src_cte} v CROSS JOIN {supers_cte} s)"
        f" WHERE sr <= {n_probe_super})",
        f"{out} AS MATERIALIZED (SELECT {cols(id_col, ks, 'cell')} FROM (\n"
        f"  SELECT {cols(f'r.{id_col}', kr, 'cs.cell')},\n"
        f"         ROW_NUMBER() OVER (PARTITION BY r.{id_col} ORDER BY\n"
        f"           {sq_dist_sql('r.qemb', 'cs.cq', dim)}, cs.cell) AS rn\n"
        f"  FROM {routed} r JOIN {cent_super_cte} cs USING (super_cell))"
        f" WHERE rn <= {n_cells})",
    ]
    return ",\n".join(parts), out
