"""Distributed BPE merge training (operators/bpe.py) vs a pure-Python
reference implementation of the classic algorithm (Sennrich et al.
2016): same word-frequency weighting, same (count DESC, pair ASC)
argmax tiebreak, same leftmost-first non-overlapping merge application.
The learned merge SEQUENCE and the final segmentations must be
identical."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.operators import bpe


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference trainer: dict-based, single-threaded."""
    segs = {w: [*w, bpe.EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        stats: Counter = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += word_counts[w]
        eligible = {p: c for p, c in stats.items() if c >= 2}
        if not eligible:
            break
        # count DESC, then pair ASC — the engine's exact tiebreak
        (a, b), cnt = min(
            eligible.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w, syms in segs.items():
            out: list[str] = []
            for s in syms:  # the same leftmost-first fold
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            segs[w] = out
    return merges, segs


CORPUS = [
    # classic BPE toy corpus shape: shared suffixes ('est', 'er') should
    # merge early; word frequency weights the counts
    "low low low lower lower lowest",
    "new new newer newer newer newest newest",
    "wide wider widest",
    "aaaa aaaa baaa",  # run-merge semantics ('a','a') on 'aaaa'
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_bpe_train_matches_reference(spark, docs):
    wc = {
        r.word: r.n for r in bpe.word_counts(docs).collect()
    }
    ref_merges, ref_segs = _ref_bpe(wc, 12)
    got_merges, seg = bpe.bpe_train(docs, 12)
    assert got_merges == ref_merges
    got_segs = {r.word: list(r.syms) for r in seg.collect()}
    assert got_segs == ref_segs
    # non-vacuous: several merges learned, and at least one multi-char
    # symbol beyond a simple pair emerged (a merge built on a merge)
    assert len(got_merges) >= 5
    assert any(len(a) + len(b) > 3 for a, b, _ in got_merges if bpe.EOW not in a + b)


def test_bpe_stops_when_no_repeated_pair(spark):
    d = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
    merges, seg = bpe.bpe_train(d, 10)
    assert merges == []  # every pair occurs once — nothing to learn
    segs = {r.word: list(r.syms) for r in seg.collect()}
    assert segs["ab"] == ["a", "b", bpe.EOW]


def test_run_merge_is_leftmost_nonoverlapping(spark):
    d = spark.createDataFrame([(0, "aaaa aaaa aaaa")], ["doc_id", "text"])
    seg = bpe.apply_merge(
        bpe.initial_segmentation(bpe.word_counts(d)), "a", "a"
    )
    [row] = seg.collect()
    assert list(row.syms) == ["aa", "aa", bpe.EOW]


def test_segment_words_applies_learned_merges(spark, docs):
    merges, seg = bpe.bpe_train(docs, 8)
    words = bpe.word_counts(docs)
    re_seg = bpe.segment_words(words, merges)
    a = {r.word: list(r.syms) for r in seg.collect()}
    b = {r.word: list(r.syms) for r in re_seg.collect()}
    assert a == b
    # inference on an UNSEEN word still applies learned merges
    unseen = words.sparkSession.createDataFrame(
        [("lowestest", 1)], ["word", "n"]
    )
    [row] = bpe.segment_words(unseen, merges).collect()
    assert len(row.syms) < len("lowestest") + 1  # something merged


@pytest.mark.parametrize("seed", [3, 41, 77])
def test_bpe_train_matches_reference_randomized(spark, seed):
    """Randomized generalization of the reference-equivalence pin: random
    word multisets over a small alphabet (dense pair collisions), random
    frequencies — merge sequence and final segmentations must match the
    pure-Python reference exactly."""
    import random

    rng = random.Random(seed)
    alphabet = "abcde"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7))):
            rng.randint(1, 9)
        for _ in range(30)
    }
    text = " ".join(w for w, n in words.items() for _ in range(n))
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    wc = {r.word: r.n for r in bpe.word_counts(docs).collect()}
    assert wc == words or sum(wc.values()) == sum(words.values())
    ref_merges, ref_segs = _ref_bpe(wc, 10)
    got_merges, seg = bpe.bpe_train(docs, 10)
    assert got_merges == ref_merges
    assert {r.word: list(r.syms) for r in seg.collect()} == ref_segs


def test_train3_query_matches_bpe_train(spark):
    """The chained SQL-expressible 3-round kernel (registry
    docs_bpe_train3) and the driver-loop trainer bpe_train must learn
    the same 3 merges and produce the same segmentations on the driver
    documents table — one verifies the other (the registry entry is
    additionally DuckDB-hash-verified by test_oracle_differential)."""
    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.plans.curation_queries import (
        docs_bpe_train3,
    )

    sf = "/root/testdata/sf0.001"
    rows = docs_bpe_train3(spark, sf).collect()
    assert rows
    q_merges = [
        (rows[0][f"merge{r}_a"], rows[0][f"merge{r}_b"]) for r in (1, 2, 3)
    ]
    # the registry entry ships syms in the scalar 0x1F-joined string
    # encoding (driver contract) — decode before comparing
    q_segs = {r.word: r.syms.split("\x1f") for r in rows}

    t_merges, t_seg = bpe.bpe_train(load_table(spark, sf, "documents"), 3)
    assert [(a, b) for a, b, _ in t_merges] == q_merges
    assert {r.word: list(r.syms) for r in t_seg.collect()} == q_segs
    # non-vacuous: three distinct merges actually learned
    assert len(set(q_merges)) == 3


def test_bpe_train_32_merges_matches_reference_fixture_corpus(spark):
    """Train-to-a-vocab-budget pin (r7 VERDICT #5): 32 sequential merge
    rounds over the real fixture corpus must reproduce the pure-Python
    reference exactly — merge sequence AND final segmentations. 32
    rounds crosses several checkpoint boundaries (cadence 4), so this
    also pins that lineage truncation never perturbs results."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = {r.word: r.n for r in bpe.word_counts(docs).collect()}
    ref_merges, ref_segs = _ref_bpe(wc, 32)
    assert len(ref_merges) == 32, "fixture corpus must sustain 32 merges"
    rounds = []
    got_merges, seg = bpe.bpe_train(
        docs, 32, on_round=lambda i, m: rounds.append((i, m))
    )
    assert got_merges == ref_merges
    assert [m for _i, m in rounds] == ref_merges  # hook sees each round
    got_segs = {r.word: list(r.syms) for r in seg.collect()}
    assert got_segs == ref_segs
    # budget actually buys vocabulary: multi-char symbols compound
    longest = max(
        len(s.replace(bpe.EOW, "")) for syms in got_segs.values() for s in syms
    )
    assert longest >= 4
