"""Scale law of the large-to-large kNN join: fixed cells vs scaled cells.

emb_knn_join_shuffled (#152) keeps N_CENTROIDS=16 for oracle determinism,
but a FIXED cell count makes the join quadratic when the query side grows
with the corpus: candidates/query = nprobe * |corpus|/cells, so 10x data
is 100x candidate pairs. The deployable shape scales the cell count with
the corpus (cells ~ n/target_occupancy, the standard IVF sizing rule) so
candidates/query stays CONSTANT and total work stays linear.

This tool measures three arms on replica corpora (ann_scale_point's
dim-rotation scheme) — fixed 16 md5 cells, trained cells ∝ n (constant
occupancy), trained cells ∝ √n — and reports, per (size, arm): analytic
candidate-pair count (Σ_cell probe_hits × occupancy — two cheap
histograms, no join execution), candidates/query, and, for arms under
--wall-pair-cap, the end-to-end join wall (min-of-runs, interleaved)
plus recall@10 against exact brute force on a sampled query set and the
trained arms' one-off k-means cost. Arms over the cap report counts
only: the exploding pair count IS the finding; no need to melt the box
proving it end to end.

Both arms share one table-driven implementation (operators/kmeans.py
assign machinery: broadcast centroid cross join + map-side min_by argmin;
sort-merge candidate join on (cell, slice) with corpus-side salting —
the same plan shape the registry entry pins). Only the centroid table
differs: the entry's 16 md5 centroids vs sample-trained Lloyd centroids.

Usage:
  python tools/knn_join_scale.py --src /root/testdata/sf0.1 \
      [--copies 1 10 50] [--runs 2] [--out-base /tmp/knnjoin]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from ann_scale_point import build_embeddings_replicas  # noqa: E402

NPROBE = 2
SLICES = 4
K = 10
TARGET_OCCUPANCY = 125  # corpus rows per cell in the scaled arm
TRAIN_SAMPLE = 4_000
RECALL_QUERIES = 50


def _prep(spark, out_dir: str) -> DataFrame:
    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.functions import vectors as vx
    from projekt_data_engineering_iubh_spark.operators.kmeans import quantize

    e = load_table(spark, out_dir, "embeddings").select(
        "vec_id",
        "embedding",
        vx.norm(F.col("embedding")).alias("nrm"),
        quantize(F.col("embedding")).alias("qemb"),
    )
    return e


def _fixed_centroids(spark) -> DataFrame:
    """The registry entry's 16 md5 centroids, quantized to the same
    fixed-point grid assign_cells expects."""
    from projekt_data_engineering_iubh_spark.operators.kmeans import FIXED_SCALE
    from projekt_data_engineering_iubh_spark.plans.vector_queries import (
        CENTROIDS,
    )

    rows = [
        (j, [int(v * FIXED_SCALE // 1) for v in CENTROIDS[j]])
        for j in range(len(CENTROIDS))
    ]
    return spark.createDataFrame(rows, "cell int, cq array<bigint>")


def _trained_centroids(spark, e: DataFrame, n_cells: int, dim: int):
    """Sample-trained Lloyd centroids (train on a stride sample, assign
    everything — the standard IVF sizing/training split). Returns
    (centroids, train_sec)."""
    from projekt_data_engineering_iubh_spark.operators.kmeans import (
        assign_cells,
        update_centroids,
    )

    t0 = time.time()
    n = e.count()
    stride = max(1, n // TRAIN_SAMPLE)
    sample = e.filter(F.col("vec_id") % stride == 0).select("vec_id", "qemb")
    seeds = (
        sample.orderBy("vec_id")
        .limit(n_cells)
        .withColumn(
            "cell",
            (F.row_number().over(Window.orderBy("vec_id")) - 1).cast("int"),
        )
        .select("cell", F.col("qemb").alias("cq"))
    )
    cents = seeds
    for _ in range(2):
        cents = update_centroids(assign_cells(sample, cents), dim)
    cents = cents.cache()
    k_eff = cents.count()  # materialize; empty cells may shrink k
    return cents, k_eff, round(time.time() - t0, 3)


def _assign_sides(
    e: DataFrame, cents: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Cell-assign both roles: (corpus with cell+slice, query probes
    pre-slice-explosion). Shared by the join and the analytic pair
    counter so they count the same candidate set."""
    from projekt_data_engineering_iubh_spark.operators.kmeans import (
        _int_sq_dist,
    )

    corp_cross = (
        e.filter(F.col("vec_id") % 2 == 1)
        .crossJoin(F.broadcast(cents))
        .withColumn("dist", _int_sq_dist(F.col("qemb"), F.col("cq")))
    )
    corp = (
        corp_cross.groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("embedding", "nrm", "cell"), F.struct("dist", "cell")
            ).alias("b")
        )
        .select(
            "vec_id", "b.embedding", "b.nrm", "b.cell",
            (F.col("vec_id") % SLICES).cast("int").alias("slice"),
        )
    )
    q_cross = (
        e.filter(F.col("vec_id") % 2 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
            "qemb",
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("dist", _int_sq_dist(F.col("qemb"), F.col("cq")))
    )
    # top-NPROBE cells per query via two map-side-combinable min_by passes
    # (a row_number window would shuffle every (query, cell) candidate row;
    # min_by reduces each input partition to one row per query first)
    best1 = q_cross.groupBy("query_id").agg(
        F.min_by(
            F.struct("qe", "qnrm", "cell"), F.struct("dist", "cell")
        ).alias("b")
    )
    probe1 = best1.select(
        "query_id", "b.qe", "b.qnrm", F.col("b.cell").alias("pcell")
    )
    best2 = (
        q_cross.join(
            best1.select("query_id", F.col("b.cell").alias("c1")), "query_id"
        )
        .filter(F.col("cell") != F.col("c1"))
        .groupBy("query_id")
        .agg(
            F.min_by(
                F.struct("qe", "qnrm", "cell"), F.struct("dist", "cell")
            ).alias("b")
        )
        .select(
            "query_id", "b.qe", "b.qnrm", F.col("b.cell").alias("pcell")
        )
    )
    return corp, probe1.unionByName(best2)


def _two_level_assign_sides(
    spark, e: DataFrame, cents: DataFrame, dim: int
) -> tuple[DataFrame, DataFrame, int]:
    """Scale-law finding #4 made concrete: broadcast-argmin assignment is
    O(n·cells) distance folds, so at production cell counts the coarse
    quantizer itself needs sublinear search. This is the first rung — a
    two-level quantizer: train √cells super-cells OVER THE CENTROID
    TABLE (tiny), route each vector to its 2 nearest super-cells, argmin
    only over the centroids inside them: ~(√k + 2k/√k) folds per vector
    instead of k. Approximate (the true nearest centroid can hide in an
    unprobed super-cell) — the caller measures the disagreement rate and
    its recall effect. Returns (corp, probes_pre_slice, n_supers)."""
    from projekt_data_engineering_iubh_spark.operators.kmeans import (
        _int_sq_dist,
        kmeans_train,
    )

    k = cents.count()
    n_super = max(2, int(k ** 0.5))
    # super-quantizer trained on the centroids themselves (k rows)
    cvecs = cents.select(
        F.col("cell").cast("long").alias("vec_id"),
        F.col("cq").alias("qemb"),
    )
    supers = kmeans_train(cvecs, n_super, 2, dim).select(
        F.col("cell").alias("super_cell"), F.col("cq").alias("scq")
    )
    # each centroid routed to its own nearest super-cell (tiny join)
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

    def assign(rows: DataFrame, id_col: str, keep: list[str]) -> DataFrame:
        # stage 1: 2 nearest super-cells (n_super folds/vector)
        sc = (
            rows.crossJoin(F.broadcast(supers))
            .withColumn("sd", _int_sq_dist(F.col("qemb"), F.col("scq")))
        )
        s1 = sc.groupBy(id_col).agg(
            F.min_by(
                F.struct(*keep, "qemb", "super_cell"),
                F.struct("sd", "super_cell"),
            ).alias("b")
        )
        p1 = s1.select(id_col, "b.*")
        s2 = (
            sc.join(
                s1.select(id_col, F.col("b.super_cell").alias("s1")), id_col
            )
            .filter(F.col("super_cell") != F.col("s1"))
            .groupBy(id_col)
            .agg(
                F.min_by(
                    F.struct(*keep, "qemb", "super_cell"),
                    F.struct("sd", "super_cell"),
                ).alias("b")
            )
            .select(id_col, "b.*")
        )
        routed = p1.unionByName(s2)
        # stage 2: argmin over the centroids of the 2 probed super-cells
        # (~2k/√k folds/vector)
        return (
            routed.join(F.broadcast(cent_super), "super_cell")
            .withColumn("d", _int_sq_dist(F.col("qemb"), F.col("cq")))
            .groupBy(id_col)
            .agg(
                F.min_by(
                    F.struct(*keep, "cell"), F.struct("d", "cell")
                ).alias("b")
            )
            .select(id_col, "b.*")
        )

    corp = (
        assign(
            e.filter(F.col("vec_id") % 2 == 1),
            "vec_id",
            ["embedding", "nrm"],
        )
        .withColumn("slice", (F.col("vec_id") % SLICES).cast("int"))
    )
    # query probes: top-NPROBE cells via the same two-level route — rank
    # the centroids of the probed super-cells
    q = e.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
        "qemb",
    )
    sc = (
        q.crossJoin(F.broadcast(supers))
        .withColumn("sd", _int_sq_dist(F.col("qemb"), F.col("scq")))
    )
    s1 = sc.groupBy("query_id").agg(
        F.min_by(
            F.struct("qe", "qnrm", "qemb", "super_cell"),
            F.struct("sd", "super_cell"),
        ).alias("b")
    )
    p1 = s1.select("query_id", "b.*")
    s2 = (
        sc.join(
            s1.select("query_id", F.col("b.super_cell").alias("s1")),
            "query_id",
        )
        .filter(F.col("super_cell") != F.col("s1"))
        .groupBy("query_id")
        .agg(
            F.min_by(
                F.struct("qe", "qnrm", "qemb", "super_cell"),
                F.struct("sd", "super_cell"),
            ).alias("b")
        )
        .select("query_id", "b.*")
    )
    routed = p1.unionByName(s2)
    ranked = (
        routed.join(F.broadcast(cent_super), "super_cell")
        .withColumn("d", _int_sq_dist(F.col("qemb"), F.col("cq")))
    )
    pw = Window.partitionBy("query_id").orderBy("d", "cell")
    probes = (
        ranked.withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", "qe", "qnrm", F.col("cell").alias("pcell"))
    )
    return corp, probes, n_super


def _knn_join_from_sides(
    corp: DataFrame, probes_ns: DataFrame
) -> DataFrame:
    from projekt_data_engineering_iubh_spark.functions import vectors as vx

    probes = probes_ns.withColumn(
        "qslice", F.explode(F.array(*[F.lit(s) for s in range(SLICES)]))
    )
    cand = probes.join(
        corp.hint("merge"),
        (F.col("pcell") == F.col("cell")) & (F.col("qslice") == F.col("slice")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            vx.dot(F.col("qe"), F.col("embedding"))
            / (F.col("qnrm") * F.col("nrm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= K)
    )


def _knn_join(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Table-driven variant of emb_knn_join_shuffled: even vec_ids query
    the odd-vec_id corpus; cells come from the given centroid table."""
    corp, probes_ns = _assign_sides(e, cents)
    return _knn_join_from_sides(corp, probes_ns)


def _recall_at_10(spark, e: DataFrame, joined: DataFrame) -> float:
    """Exact brute-force top-10 for a deterministic query sample vs the
    join's answer for the same queries."""
    from projekt_data_engineering_iubh_spark.functions import vectors as vx

    n_q = e.filter(F.col("vec_id") % 2 == 0).count()
    stride = 2 * max(1, n_q // RECALL_QUERIES)
    qs = e.filter(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") % stride == 0)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    corp = e.filter(F.col("vec_id") % 2 == 1)
    pairs = corp.crossJoin(F.broadcast(qs)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            vx.dot(F.col("qe"), F.col("embedding"))
            / (F.col("qnrm") * F.col("nrm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    truth = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id")
        .collect()
    )
    truth_sets: dict[int, set] = {}
    for r in truth:
        truth_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = (
        joined.join(
            qs.select("query_id").hint("broadcast"), "query_id"
        )
        .select("query_id", "neighbor_id")
        .collect()
    )
    got_sets: dict[int, set] = {}
    for r in got:
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = [
        len(truth_sets[q] & got_sets.get(q, set())) / len(truth_sets[q])
        for q in truth_sets
    ]
    return round(sum(hits) / len(hits), 4)


def _trained_join_arm(
    spark,
    e: DataFrame,
    dim: int,
    runs: int,
    wall_pair_cap: int,
    nprobes: list[int],
    target_cell: int = 64,
    super_probes: int | None = None,
) -> dict:
    """The emb_knn_join_trained construction (r11 registry entry) at
    tool scale: cells ∝ corpus (one per ~target_cell vectors,
    sample-trained Lloyd — production training is sample-sized; the
    registry entry trains on the full corpus only for oracle purity),
    BOTH sides routed through the SHARED two-level router
    (operators/kmeans.py::train_router/route_top_cells — the
    productized r10 --two-level machinery), then the shuffled
    sort-merge join tail. Measures, per nprobe: analytic pair count
    (flat cand/query ≈ nprobe × target_cell is the design claim), join
    wall for arms under the cap, and recall@10 — the refine-coverage
    law the nprobe lever trades on."""
    from projekt_data_engineering_iubh_spark.operators import kmeans as km

    from projekt_data_engineering_iubh_spark.operators.kmeans import (
        ROUTER_SUPER_PROBES,
    )

    if super_probes is None:
        super_probes = ROUTER_SUPER_PROBES
    out: dict = {"target_cell": target_cell, "super_probes": super_probes}
    corpus = e.filter(F.col("vec_id") % 2 == 1)
    n_corp = corpus.count()
    k = max(8, n_corp // target_cell)
    t0 = time.time()
    cents, k_eff, train_sec = _trained_centroids(spark, e, k, dim)
    router = km.train_router(cents, dim)
    router.supers = router.supers.localCheckpoint(eager=True)
    router.cent_super = router.cent_super.localCheckpoint(eager=True)
    out.update(
        cells=k_eff,
        cells_requested=k,
        n_supers=router.supers.count(),
        train_router_sec=round(time.time() - t0, 3),
    )
    t0 = time.time()
    sp = min(super_probes, out["n_supers"])
    out["super_probes"] = sp
    corp = (
        km.route_top_cells(
            router, corpus, "vec_id", ["embedding", "nrm"], 1,
            n_probe_super=sp,
        )
        .withColumn("slice", (F.col("vec_id") % SLICES).cast("int"))
        .cache()
    )
    corp.count()
    out["corpus_assign_sec"] = round(time.time() - t0, 3)
    q = e.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
        "qemb",
    )
    n_q = q.count()
    ch = corp.groupBy("cell").count().withColumnRenamed("count", "cn")
    out["by_nprobe"] = {}
    for nprobe in nprobes:
        res: dict = {}
        probes_ns = (
            km.route_top_cells(
                router, q, "query_id", ["qe", "qnrm"], nprobe,
                n_probe_super=sp,
            )
            .withColumnRenamed("cell", "pcell")
            .cache()
        )
        probes_ns.count()
        qh = (
            probes_ns.groupBy("pcell").count().withColumnRenamed("count", "qn")
        )
        pairs = int(
            (
                ch.join(qh, ch.cell == qh.pcell)
                .agg(F.sum(F.col("cn") * F.col("qn")).alias("p"))
                .collect()[0]
                .p
            )
            or 0
        )
        res.update(
            cand_pairs=pairs, cand_per_query=round(pairs / max(1, n_q), 1)
        )
        if pairs <= wall_pair_cap:
            _knn_join_from_sides(corp, probes_ns).count()  # warm
            walls = []
            for _ in range(runs):
                t0 = time.time()
                _knn_join_from_sides(corp, probes_ns).count()
                walls.append(round(time.time() - t0, 3))
            res.update(
                wall_min=min(walls),
                runs=walls,
                recall_at_10=_recall_at_10(
                    spark, e, _knn_join_from_sides(corp, probes_ns)
                ),
            )
        else:
            res["skipped"] = f"pairs > wall cap {wall_pair_cap}"
        probes_ns.unpersist()
        out["by_nprobe"][str(nprobe)] = res
    corp.unpersist()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out-base", default="/tmp/knnjoin")
    ap.add_argument("--copies", type=int, nargs="+", default=[1, 10, 50])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--two-level",
        action="store_true",
        help="also measure the two-level coarse quantizer on the "
        "cells-proportional-to-n arm: assignment wall vs flat argmin, "
        "assignment disagreement rate, end-to-end join wall + recall",
    )
    ap.add_argument(
        "--trained-join",
        action="store_true",
        help="measure the emb_knn_join_trained construction (cells ∝ n "
        "at ~64/cell, shared two-level router on both sides) across "
        "--nprobes: pair budget, join wall, recall@10 per nprobe — the "
        "refine-coverage law the production sizing picks from",
    )
    ap.add_argument(
        "--nprobes", type=int, nargs="+", default=[2, 4, 8],
        help="nprobe sweep for the --trained-join arm",
    )
    ap.add_argument(
        "--super-probes", type=int, default=None,
        help="widen the router's super probing for the --trained-join "
        "arm (default ROUTER_SUPER_PROBES=2; a large value = exact "
        "probe selection, isolating router loss from coverage loss)",
    )
    ap.add_argument(
        "--wall-pair-cap", type=int, default=5_000_000,
        help="wall-clock and recall-check an arm only when its analytic "
        "candidate-pair count is under this cap; above it the PAIR COUNT "
        "is the finding (the fixed-cell arm explodes quadratically — no "
        "need to melt the box proving it end to end)",
    )
    args = ap.parse_args()

    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("knn_join_scale")
    spark.sparkContext.setLogLevel("ERROR")

    points = []
    for copies in args.copies:
        out_dir = f"{args.out_base}_{copies}x"
        if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
            dim = build_embeddings_replicas(spark, args.src, out_dir, copies)
        e = _prep(spark, out_dir).cache()
        n = e.count()
        dim = len(e.select("embedding").first()[0])

        if args.trained_join:
            # focused run: ONLY the production construction (the classic
            # arms re-measure r10's law; no need to re-melt the box)
            arm = _trained_join_arm(
                spark, e, dim, args.runs, args.wall_pair_cap, args.nprobes,
                super_probes=args.super_probes,
            )
            e.unpersist()
            points.append(
                {"copies": copies, "n_vectors": n,
                 "arms": {"trained_join": arm}}
            )
            print(json.dumps(points[-1]), file=sys.stderr)
            continue

        arms: dict[str, dict] = {}
        cent_tables: dict[str, DataFrame] = {}
        cent_tables["fixed16"] = _fixed_centroids(spark)
        arms["fixed16"] = {"cells": 16}
        # two trained sizing rules: cells ∝ n (constant occupancy → flat
        # cand/query, recall decays at fixed nprobe) and the classic
        # cells ∝ √n (cand/query grows as √corpus, recall holds better)
        corpus_n = n // 2
        for arm_name, n_cells in (
            ("linear_cells", max(16, corpus_n // TARGET_OCCUPANCY)),
            ("sqrt_cells", max(16, int(corpus_n ** 0.5))),
        ):
            cents, k_eff, train_sec = _trained_centroids(
                spark, e, n_cells, dim
            )
            cent_tables[arm_name] = cents
            arms[arm_name] = {
                "cells": k_eff, "cells_requested": n_cells,
                "train_sec": train_sec,
            }

        # analytic pair counts first (cheap histograms) — they gate
        # which arms get end-to-end walls
        n_queries = n // 2 + n % 2
        walled = []
        for a in arms:
            cand_rows = _knn_join_cand_count(e, cent_tables[a])
            arms[a].update(
                cand_pairs=cand_rows,
                cand_per_query=round(cand_rows / max(1, n_queries), 1),
            )
            if cand_rows <= args.wall_pair_cap:
                walled.append(a)
            else:
                arms[a]["skipped"] = (
                    f"pairs > wall cap {args.wall_pair_cap}"
                )

        # interleaved min-of-runs walls (box drift hits every arm alike)
        times: dict[str, list[float]] = {a: [] for a in walled}
        for a in walled:
            _knn_join(e, cent_tables[a]).count()  # warm plan + cache
        for _ in range(args.runs):
            for a in walled:
                t0 = time.time()
                _knn_join(e, cent_tables[a]).count()
                times[a].append(round(time.time() - t0, 3))
        for a in walled:
            arms[a].update(
                wall_min=min(times[a]),
                runs=times[a],
                recall_at_10=_recall_at_10(
                    spark, e, _knn_join(e, cent_tables[a])
                ),
            )
        if args.two_level:
            cents = cent_tables["linear_cells"]
            tl: dict = {}
            t0 = time.time()
            c0, p0 = _assign_sides(e, cents)
            c0 = c0.cache()
            c0.count(), p0.count()
            tl["flat_assign_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            c2, p2, n_super = _two_level_assign_sides(spark, e, cents, dim)
            c2 = c2.cache()
            c2.count(), p2.count()
            tl["two_level_assign_sec"] = round(time.time() - t0, 3)
            tl["n_supers"] = n_super
            both = c0.select(
                "vec_id", F.col("cell").alias("c_exact")
            ).join(c2.select("vec_id", "cell"), "vec_id")
            tl["assign_disagree_frac"] = round(
                both.filter(F.col("cell") != F.col("c_exact")).count()
                / max(1, both.count()),
                4,
            )
            joined2 = _knn_join_from_sides(c2, p2)
            joined2.count()  # warm
            walls = []
            for _ in range(args.runs):
                t0 = time.time()
                _knn_join_from_sides(c2, p2).count()
                walls.append(round(time.time() - t0, 3))
            tl["join_wall_min"] = min(walls)
            tl["runs"] = walls
            tl["recall_at_10"] = _recall_at_10(spark, e, joined2)
            arms["linear_cells"]["two_level"] = tl
            c0.unpersist(), c2.unpersist()

        e.unpersist()
        for name, ct in cent_tables.items():
            if name != "fixed16":
                ct.unpersist()
        points.append({"copies": copies, "n_vectors": n, "arms": arms})
        print(json.dumps(points[-1]), file=sys.stderr)

    print(json.dumps({"src": args.src, "k": K, "nprobe": NPROBE,
                      "slices": SLICES, "points": points}))
    return 0


def _knn_join_cand_count(e: DataFrame, cents: DataFrame) -> int:
    """Analytic candidate count: Σ_cell probe_hits(cell) × corpus(cell).
    Slicing doesn't change the pair count (queries replicate to every
    slice, slices partition the cell), so two cheap histograms replace
    executing the join — essential for the fixed-cell arm, whose pair
    count is exactly the quantity that explodes."""
    corp, probes_ns = _assign_sides(e, cents)
    ch = corp.groupBy("cell").count().withColumnRenamed("count", "cn")
    qh = (
        probes_ns.groupBy("pcell").count().withColumnRenamed("count", "qn")
    )
    row = (
        ch.join(qh, ch.cell == qh.pcell)
        .agg(F.sum(F.col("cn") * F.col("qn")).alias("pairs"))
        .collect()[0]
    )
    return int(row.pairs or 0)


if __name__ == "__main__":
    raise SystemExit(main())
