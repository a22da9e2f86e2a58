"""Short-document sentinel regression (round-3 ADVICE, medium).

Docs with <3 tokens have an empty 3-shingle set and therefore the
all-MERSENNE_P sentinel MinHash signature. Before the fix, every such doc
shared one LSH band bucket: unrelated 1-2-token documents paired with
est_jaccard 1.0 and the transitive dedup collapsed them all into one
representative. The DuckDB oracle reproduced the same behavior, so the
differential harness could never catch it — this test pins the intended
semantics directly: short docs generate NO candidate pairs and survive
dedup as singletons.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.plans import all_queries


def _write_docs(spark, tmp_path):
    rows = [
        # two UNRELATED short docs (<3 tokens => empty shingle set)
        (1, "the cat", "en", "web", 7),
        (2, "run fast", "en", "web", 8),
        # an exact duplicate pair (identical signatures agree on every
        # band — deterministic, unlike a near-dup's banding luck)
        (3, "the quick brown fox jumps over the lazy dog every single day", "en", "web", 61),
        (4, "the quick brown fox jumps over the lazy dog every single day", "en", "web", 61),
        # an unrelated long doc
        (5, "completely different content about spark query engines and parquet", "en", "web", 67),
        # empty text (also sentinel territory)
        (6, "", "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_short_docs_never_pair_and_survive_dedup(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path)
    q = all_queries()

    pairs = q["docs_minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    paired_ids = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    # the only candidate pair is the genuine near-dup (3,4); no sentinel
    # doc (1, 2, 6) ever enters candidate generation
    assert paired_ids <= {3, 4}
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(3, 4)}

    kept = {r.doc_id for r in q["docs_dedup_apply"].fn(spark, sf_dir).collect()}
    # short/empty docs are singletons: all survive; the near-dup pair
    # keeps its min doc_id only
    assert kept == {1, 2, 3, 5, 6}


def test_sentinel_signature_still_emitted_for_short_docs(spark, tmp_path):
    # the signature QUERY still reports every doc (sentinel included) —
    # only banding/candidate generation excludes them
    sf_dir = _write_docs(spark, tmp_path)
    sigs = {
        r.doc_id: r.minhash_sig
        for r in all_queries()["docs_minhash_signatures"].fn(spark, sf_dir).collect()
    }
    assert set(sigs) == {1, 2, 3, 4, 5, 6}
    sentinel = "-".join(["2147483647"] * 16)
    assert sigs[1] == sentinel and sigs[6] == sentinel
    assert sigs[3] != sentinel
