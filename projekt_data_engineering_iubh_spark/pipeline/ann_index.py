"""Persisted trained-ANN indexes: build once, serve many (r7 VERDICT #2).

The ANN method matrix measured the deployment problem directly: every
trained variant's inline latency is dominated by TRAINING (Lloyd rounds
plus codebook collection run INSIDE the query — emb_ivfpq_residual
12.67 s at sf1 where brute force takes a fraction of that), and the
Hamming-sketch economics measurement proved the stored form flips the
verdict (0.471 s vs 5.70 s inline). This module generalizes that into
the build/serve split every ANN docstring already describes as the
production shape: a BUILD pass trains the quantizers and persists
centroids/codebooks/codes through the manifest-pointer snapshot store
(pipeline/store.py — atomic publish, snapshot-isolated readers), and a
SERVE query reads the artifacts and answers queries without retraining.

``ensure()`` is memoized build-if-stale, keyed exactly like the
plan-selection probes (plans/vector_queries.py::_max_occupancy): the
index root's name digests (absolute table path, table dir mtime,
constants), so a Spark re-write of the corpus — which deletes/creates
part files and bumps the dir mtime — routes to a FRESH root and
triggers a rebuild, while repeated plan builds over unchanged data
(bench min-of-3, dashboards, a serve fleet) reuse the committed
snapshot. That makes a serve registry entry self-contained: the first
call on a fresh corpus pays the build, every later call is pure read.

At 100 TB the same layout holds: codes are the stored index (2-4
bytes/vector plus the key), centroids/codebooks are k×dim-row tables
(driver-literal sized), training runs on a sample, and the serve join
codes ⋈ corpus is an equi-join on vec_id — co-locate it by writing
codes bucketed next to a bucketed corpus (pipeline/corpus_store.py is
the committed pattern) and it runs exchange-free.

Stale roots from superseded corpus versions accumulate under the index
base dir (each is a self-contained store); clean with a TTL sweep of
dirs whose digest no longer resolves — they are never referenced again.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from projekt_data_engineering_iubh_spark.pipeline import store

DEFAULT_BASE = "/tmp/spark_graft_ann_index"


def base_dir() -> str:
    return os.environ.get("SPARK_GRAFT_INDEX_DIR", DEFAULT_BASE)


def _corpus_fingerprint(path: str) -> tuple:
    """Stable identity of the corpus bytes under ``path``.

    Folds every data file's (relative name, size, mtime) — not the bare
    directory mtime, which does NOT change when file CONTENTS are
    rewritten in place (r8 ADVICE: an in-place rewrite silently served a
    stale index). A single-file corpus contributes its own (size,
    mtime); a missing path contributes a sentinel so the digest still
    resolves (the build then fails loudly on read, not on digest).
    """
    if os.path.isfile(path):
        st = os.stat(path)
        return ((os.path.basename(path), st.st_size, st.st_mtime),)
    if os.path.isdir(path):
        out = []
        for dirpath, _dirnames, filenames in os.walk(path):
            for f in filenames:
                fp = os.path.join(dirpath, f)
                try:
                    st = os.stat(fp)
                except OSError:
                    continue
                out.append(
                    (os.path.relpath(fp, path), st.st_size, st.st_mtime)
                )
        return tuple(sorted(out))
    return (("<missing>", -1, -1.0),)


def index_root(sf_dir: str, table: str, kind: str, constants: tuple) -> str:
    """Deterministic store root for (corpus version, index geometry).

    The digest covers the table's absolute path AND a full listing of
    its data files' (name, size, mtime), so any corpus re-write —
    including an in-place same-name content rewrite — yields a
    different root (build-if-stale without any invalidation protocol),
    plus every constant that shapes the index.
    """
    path = os.path.abspath(os.path.join(sf_dir, table))
    key = repr(
        (path, _corpus_fingerprint(path), kind, constants)
    ).encode()
    digest = hashlib.sha256(key).hexdigest()[:16]
    return os.path.join(base_dir(), f"{kind}_{digest}")


def ensure(
    sf_dir: str,
    table: str,
    kind: str,
    constants: tuple,
    build_fn,
) -> str:
    """Build-if-missing: return a committed store root for this corpus
    version, building via ``build_fn(data_dir)`` (which must write every
    artifact parquet under the given snapshot dir) when absent.

    A lost commit race (another process built the same root first) is
    success — the winner's snapshot is byte-equivalent because training
    is deterministic fixed-point arithmetic over the same corpus bytes.
    """
    root = index_root(sf_dir, table, kind, constants)
    if store.is_store(root):
        return root
    try:
        store.commit_snapshot(root, build_fn)
    except store.CommitConflict:
        pass  # concurrent builder won with an identical snapshot
    return root


def read_artifact(spark: SparkSession, root: str, name: str) -> DataFrame:
    """One named artifact (a parquet dir) out of the current snapshot."""
    return spark.read.parquet(os.path.join(store.resolve(root), name))


def write_bucketed_serving(
    spark: SparkSession,
    corpus: DataFrame,
    codes: DataFrame,
    table_prefix: str,
    *,
    buckets: int = 16,
) -> tuple[str, str]:
    """Materialize the serve join's two sides CO-BUCKETED by vec_id —
    the deployment layout every serve docstring references: the codes ⋈
    corpus equi-join then runs with ZERO exchanges (and zero sorts,
    both sides sortBy the key), proven by
    tests/test_ann_index.py::test_bucketed_serve_join_is_exchange_free.

    Same design as pipeline/corpus_store.py (shuffle once at write
    time, never at read; bucket metadata needs the catalog, so these
    are ``saveAsTable`` tables in the session warehouse). ``corpus``
    must carry vec_id + the serving columns (embedding, nrm, ...);
    ``codes`` is the committed index's (vec_id, cell[, c0..]) frame.
    Returns the two table names."""
    ct, kt = f"{table_prefix}_corpus", f"{table_prefix}_codes"
    for df, table in ((corpus, ct), (codes, kt)):
        (
            df.write.mode("overwrite")
            .bucketBy(buckets, "vec_id")
            .sortBy("vec_id")
            .saveAsTable(table)
        )
    return ct, kt


def bucketed_serve_cells(spark: SparkSession, table_prefix: str) -> DataFrame:
    """The exchange-free serve input: corpus ⋈ codes on vec_id from the
    co-bucketed tables — feed it to the search helpers
    (plans/vector_queries._ivft_search)."""
    ct, kt = f"{table_prefix}_corpus", f"{table_prefix}_codes"
    return spark.table(ct).join(spark.table(kt), "vec_id")


def vacuum_stale(ttl_seconds: float = 7 * 86400) -> list[str]:
    """Remove index roots not touched for ``ttl_seconds`` (the sweep the
    staleness design implies: a superseded corpus version's root is
    never referenced again — its digest can no longer be derived — so
    age is a safe proxy). A live root removed by a mis-tuned TTL is
    only a perf hiccup: the next ensure() rebuilds it deterministically.
    Returns the removed root paths."""
    import shutil
    import time

    removed: list[str] = []
    base = base_dir()
    if not os.path.isdir(base):
        return removed
    now = time.time()
    for name in sorted(os.listdir(base)):
        root = os.path.join(base, name)
        probe = os.path.join(root, store.MANIFEST_FILE)
        if not os.path.exists(probe):
            probe = root  # never-committed orphan: age of the dir itself
        try:
            age = now - os.path.getmtime(probe)
        except OSError:
            continue
        if age > ttl_seconds:
            shutil.rmtree(root, ignore_errors=True)
            removed.append(root)
    return removed
