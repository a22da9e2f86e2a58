"""Empirical scale-linearity sweep for the dedup/ANN stack (r3 VERDICT #2).

The 100 TB-safety argument for the near-dup/ANN operators has been
by-construction (banded equi-joins, active-vertex CC). This tool MEASURES
it: run the pair-producing queries at sf0.01, sf0.1, and a synthetically
replicated k× corpus, record candidate-pair counts / CC convergence
rounds / wall time, and check the scaling laws:

* ``docs_minhash_lsh_pairs`` / dedup edges — content-banded: disjoint
  replicas cannot share bands, so pairs must grow ~linearly (k× replicas
  → ≈ k× pairs, tolerance for MinHash estimator noise under the per-copy
  token remap). Cross-copy contamination is asserted ZERO.
* connected-components rounds — must stay a small constant (graph
  diameter of quasi-clique dup clusters), independent of corpus size.
* ``emb_lsh_ann_pairs`` — random-hyperplane buckets are a FIXED 2^p
  space, so all-pairs-in-bucket grows by the birthday law n²/2^(p+1),
  NOT linearly; the sweep asserts the law (predictability is the
  capacity-planning contract) and demonstrates the scale lever: adding
  planes as the corpus grows (p ≈ log2(n) + const) restores ~flat
  pairs-per-vector. That lever is exactly how the operator is deployed
  at 100 TB (docstring in plans/vector_queries.py).

Replica construction (deterministic, disjointness by design):

* documents: copy c offsets doc_id by c·OFFSET and prefixes every token
  with ``c{c}`` — a bijective token remap, so each copy's true Jaccard
  structure is IDENTICAL to the original while the copies' shingle
  spaces are disjoint;
* embeddings: copy c offsets vec_id and circularly rotates the vector by
  c dims — rotation preserves within-copy norms and cosines exactly and
  re-randomizes bucket assignment across copies.

Usage:
    python tools/scale_sweep.py                  # sf0.01 + sf0.1 + 3x sf0.1
    python tools/scale_sweep.py --base sf0.01 --copies 3   # quick
Exit code 0 iff every scaling-law assertion holds; prints one JSON line
per scale point (recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OFFSET = 10_000_000  # replica id namespace (≫ any real doc_id/vec_id)


def build_replicas(spark, src_dir: str, out_dir: str, k: int) -> None:
    """Write documents.parquet + embeddings.parquet with k disjoint copies."""
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.functions import text as tx

    d = load_table(spark, src_dir, "documents")
    docs = None
    for c in range(k):
        # NB: the prefix must be bound OUTSIDE the lambda — a second lambda
        # parameter would make F.transform pass the element INDEX into it
        # (the (element, index) form), silently corrupting the remap.
        # The trailing "x" disambiguates copy indices ≥ 10 against tokens
        # that start with digits ("c1"+"0foo" vs "c10"+"foo") — without
        # it the disjoint-shingle-space invariant breaks at --copies 11+.
        # Copy 0 keeps the ORIGINAL text (identity remap): a per-copy
        # token bijection preserves every within-copy shingle-equality
        # structure either way, but a fully-remapped corpus has zero
        # natural-language tokens, so the language-signal operators
        # (quality-model bootstrap, lang-ID) would correctly refuse to
        # run at sf1 (r6 finding) — keeping one natural copy makes the
        # replica corpus exercise BOTH regimes.
        prefix = F.lit(f"c{c}x")
        remapped = (
            F.col("text")
            if c == 0
            else F.concat_ws(
                " ",
                F.transform(
                    tx.tokens(F.col("text")),
                    lambda t: F.concat(prefix, t),  # noqa: B023 — built eagerly
                ),
            )
        )
        part = d.select(
            (F.col("doc_id") + F.lit(c * OFFSET)).alias("doc_id"),
            remapped.alias("text"),
            "lang",
            "source",
            F.length(remapped).alias("n_chars"),
        )
        docs = part if docs is None else docs.unionByName(part)
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    e = load_table(spark, src_dir, "embeddings")
    embs = None
    for c in range(k):
        rotated = (
            F.col("embedding")
            if c == 0
            else F.concat(
                F.slice(F.col("embedding"), c + 1, 64 - c),
                F.slice(F.col("embedding"), 1, c),
            )
        )
        part = e.select(
            (F.col("vec_id") + F.lit(c * OFFSET)).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        )
        embs = part if embs is None else embs.unionByName(part)
    embs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


ADV_OFFSET = 50_000_000  # template-cluster id namespace (≫ replica ids)


def plant_template_cluster(spark, src_dir: str, out_dir: str, n: int) -> None:
    """documents.parquet = src docs + an n-doc boilerplate TEMPLATE cluster:
    every planted doc shares one 60-token boilerplate body and differs only
    in a trailing unique token — the adversarial shape for LSH banding
    (near-identical signatures → every band funnels the whole cluster into
    ONE bucket). Tokens are 'advtmpl'-prefixed so the cluster cannot band
    with real corpus docs (disjoint shingle space, same trick as
    build_replicas)."""
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table

    d = load_table(spark, src_dir, "documents")
    boiler = " ".join(f"advtmpl{i}" for i in range(60))
    tmpl = spark.range(n).select(
        (F.col("id") + F.lit(ADV_OFFSET)).alias("doc_id"),
        F.concat(F.lit(boiler + " advtmplunique"), F.col("id").cast("string")).alias(
            "text"
        ),
        F.lit("en").alias("lang"),
        F.lit("template").alias("source"),
    )
    tmpl = tmpl.withColumn("n_chars", F.length("text"))
    d.unionByName(tmpl).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def adversarial_check(spark, base_dir: str, tmp_root: str, n: int = 1000) -> dict:
    """The hot-bucket skew guard under adversarial load: an n-doc template
    cluster would cost the uncapped band self-join ~bands·n²/2 candidate
    pairs; the capped generator (LSH_MAX_BUCKET) must stay ≤ bands·cap·n
    (linear in n) while the dedup STILL collapses the whole cluster to one
    representative (the multi-star keeps every oversized bucket connected)."""
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.plans.text_queries import (
        _LSH_BANDS,
        LSH_MAX_BUCKET,
        _lsh_pairs,
        docs_dedup_apply,
    )

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.operators.connected_components import (
        connected_components,
    )

    adv_dir = os.path.join(tmp_root, "adversarial")
    os.makedirs(adv_dir, exist_ok=True)
    plant_template_cluster(spark, base_dir, adv_dir, n)

    capped = _lsh_pairs(spark, adv_dir, max_bucket=LSH_MAX_BUCKET)
    tmpl_pairs, secs = _timed(
        lambda: capped.filter(F.col("doc_a") >= ADV_OFFSET).count()
    )
    bound = _LSH_BANDS * LSH_MAX_BUCKET * n
    quadratic = _LSH_BANDS * n * (n - 1) // 2
    survivors = (
        docs_dedup_apply(spark, adv_dir)
        .filter(F.col("doc_id") >= ADV_OFFSET)
        .count()
    )
    # guard-NEUTRALITY is the correctness claim: the capped components
    # must equal the uncapped ones. (An exact survivors==1 expectation is
    # wrong — MinHash estimator noise can legitimately leave the odd
    # planted doc below the 0.5 est threshold with EVERY neighbor, e.g.
    # one of 1000 at the default seed, and it does so identically with
    # and without the cap.) The uncapped reference pays the quadratic
    # candidate cost the guard exists to avoid — affordable here, the
    # point of measuring.
    docs = load_table(spark, adv_dir, "documents").select("doc_id")
    unc_edges = _lsh_pairs(spark, adv_dir).filter(F.col("est_jaccard") >= 0.5)
    unc_comp = connected_components(
        docs, unc_edges, id_col="doc_id", src_col="doc_a", dst_col="doc_b",
        component_col="cluster_id",
    )
    unc_survivors = unc_comp.filter(
        (F.col("doc_id") >= ADV_OFFSET)
        & (F.col("doc_id") == F.col("cluster_id"))
    ).count()
    out = {
        "label": f"adversarial_n{n}",
        "template_docs": n,
        "capped_template_pairs": tmpl_pairs,
        "linear_bound": bound,
        "uncapped_would_be": quadratic,
        "template_survivors": survivors,
        "uncapped_survivors": unc_survivors,
        "secs": secs,
    }
    failures = []
    if tmpl_pairs > bound:
        failures.append(
            f"capped template pairs {tmpl_pairs} exceed linear bound {bound}"
        )
    if survivors != unc_survivors:
        failures.append(
            f"capped dedup kept {survivors} template representatives vs "
            f"uncapped {unc_survivors} (star connectivity broken)"
        )
    # absolute sanity alongside neutrality: a regression in the SHARED
    # signature/threshold path (broken est, dead edges) would keep ~all
    # n docs in BOTH variants and neutrality alone would miss it
    loose = max(3, n // 100)
    if survivors > loose:
        failures.append(
            f"dedup kept {survivors} of {n} template docs (> {loose}); "
            "the near-dup path is not clustering at all"
        )
    out["failures"] = failures
    return out


def _timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 3)


def measure(spark, sf_dir: str, label: str) -> dict:
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.operators.connected_components import (
        connected_components,
    )
    from projekt_data_engineering_iubh_spark.plans.text_queries import (
        _lsh_pairs,
        docs_dedup_apply,
        docs_minhash_lsh_pairs,
    )
    from projekt_data_engineering_iubh_spark.plans.vector_queries import (
        emb_lsh_ann_pairs,
    )

    n_docs = load_table(spark, sf_dir, "documents").count()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()

    lsh_rows, lsh_secs = _timed(
        lambda: docs_minhash_lsh_pairs(spark, sf_dir).count()
    )

    edges = _lsh_pairs(spark, sf_dir).filter(F.col("est_jaccard") >= 0.5)
    cross = edges.filter(
        (F.col("doc_a") / OFFSET).cast("int")
        != (F.col("doc_b") / OFFSET).cast("int")
    ).count()
    stats: dict = {}
    _, cc_secs = _timed(
        lambda: connected_components(
            load_table(spark, sf_dir, "documents").select("doc_id"),
            edges,
            id_col="doc_id",
            src_col="doc_a",
            dst_col="doc_b",
            stats=stats,
        ).count()
    )
    survivors, apply_secs = _timed(
        lambda: docs_dedup_apply(spark, sf_dir).count()
    )

    ann_rows, ann_secs = _timed(lambda: emb_lsh_ann_pairs(spark, sf_dir).count())

    return {
        "label": label,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "lsh_pairs": lsh_rows,
        "lsh_secs": lsh_secs,
        "dedup_edges_cross_copy": cross,
        "cc_rounds": stats.get("rounds"),
        "cc_secs": cc_secs,
        "dedup_survivors": survivors,
        "dedup_apply_secs": apply_secs,
        "ann_pairs": ann_rows,
        "ann_pairs_per_vec": round(ann_rows / n_vecs, 3),
        "ann_secs": ann_secs,
    }


def ann_pairs_scaled_planes(spark, sf_dir: str, n_planes: int) -> int:
    """emb_lsh_ann_pairs candidate count with a WIDER bucket space — the
    production lever: p ≈ log2(n) + const keeps pairs-per-vector flat."""
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table, spread
    from projekt_data_engineering_iubh_spark.plans.vector_queries import _plane

    e = spread(load_table(spark, sf_dir, "embeddings"))
    bucket = None
    for j in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(j)])
        prods = F.zip_with(
            F.col("embedding"), plane, lambda x, y: x.cast("double") * y
        )
        dot = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
        term = F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    b = e.select("vec_id", bucket.alias("bucket"))
    x, y = b.alias("x"), b.alias("y")
    return x.join(
        y,
        (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col("x.vec_id") < F.col("y.vec_id")),
    ).count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="sf0.1", help="replicated base sf dir name")
    ap.add_argument("--copies", type=int, default=3)
    ap.add_argument("--testdata", default="/root/testdata")
    ap.add_argument(
        "--adversarial-n",
        type=int,
        default=1000,
        help="template-cluster size for the hot-bucket skew check (0 = skip)",
    )
    args = ap.parse_args()

    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    results: list[dict] = []
    # always measure the replicated base itself so the linearity ratios
    # exist for any --base choice (not only the default two points)
    points = list(dict.fromkeys(["sf0.01", "sf0.1", args.base]))
    for sf in points:
        r = measure(spark, os.path.join(args.testdata, sf), sf)
        results.append(r)
        print(json.dumps(r), flush=True)

    base = next(x for x in results if x["label"] == args.base)
    if base["lsh_pairs"] == 0:
        # fail BEFORE the expensive replica build: with no planted
        # near-dups the linearity ratios are undefined
        msg = (
            f"base {args.base} has zero LSH pairs — pick a base with "
            "planted near-dups; linearity ratios are undefined"
        )
        print(json.dumps({"failures": [msg]}), flush=True)
        spark.stop()
        return 1

    base_dir = os.path.join(args.testdata, args.base)
    with tempfile.TemporaryDirectory(prefix="scale_sweep_") as tmp:
        build_replicas(spark, base_dir, tmp, args.copies)
        r = measure(spark, tmp, f"{args.base}x{args.copies}")
        results.append(r)
        print(json.dumps(r), flush=True)

        # the plane-scaling lever: +2 planes ≈ 4x buckets for 3x the data
        scaled = ann_pairs_scaled_planes(spark, tmp, 10)
        lever = {
            "label": f"{args.base}x{args.copies}+10planes",
            "ann_pairs": scaled,
            "ann_pairs_per_vec": round(scaled / r["n_vecs"], 3),
        }
        print(json.dumps(lever), flush=True)

        adv = None
        if args.adversarial_n > 0:
            adv = adversarial_check(spark, base_dir, tmp, args.adversarial_n)
            print(json.dumps(adv), flush=True)

    failures: list[str] = []
    if adv:
        failures.extend(adv["failures"])
    k = args.copies

    # 1. content-banded pairs grow ~linearly; zero cross-copy contamination
    ratio = r["lsh_pairs"] / (k * base["lsh_pairs"])
    if not 0.7 <= ratio <= 1.3:
        failures.append(
            f"minhash pair growth not linear: {r['lsh_pairs']} vs "
            f"{k}x{base['lsh_pairs']} (ratio {ratio:.2f})"
        )
    if r["dedup_edges_cross_copy"] != 0:
        failures.append(
            f"cross-copy dedup edges: {r['dedup_edges_cross_copy']}"
        )

    # 2. CC rounds constant at every scale
    for x in results:
        if x["cc_rounds"] is not None and x["cc_rounds"] > 8:
            failures.append(f"CC rounds {x['cc_rounds']} at {x['label']}")

    # 3. survivors scale linearly too (k replicas keep k representatives)
    sratio = r["dedup_survivors"] / (k * base["dedup_survivors"])
    if not 0.9 <= sratio <= 1.1:
        failures.append(
            f"survivor growth not linear: {r['dedup_survivors']} vs "
            f"{k}x{base['dedup_survivors']}"
        )

    # 4. fixed-plane ANN follows the birthday law n^2/2^(p+1) (256 buckets)
    for x in results:
        predicted = x["n_vecs"] * (x["n_vecs"] - 1) / 2 / 256
        if not 0.5 <= x["ann_pairs"] / predicted <= 2.0:
            failures.append(
                f"ANN pairs {x['ann_pairs']} vs predicted {predicted:.0f} "
                f"at {x['label']}"
            )

    # 5. the plane lever works: 10 planes at 3x ≤ ~1.5x the 8-plane base
    #    pairs-per-vector (4x buckets vs 3x data → ratio 3/4 ideally)
    if lever["ann_pairs_per_vec"] > 1.5 * base["ann_pairs_per_vec"]:
        failures.append(
            f"plane scaling failed to flatten pairs/vec: "
            f"{lever['ann_pairs_per_vec']} vs base {base['ann_pairs_per_vec']}"
        )

    print(json.dumps({"failures": failures}), flush=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
