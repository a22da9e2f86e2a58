"""Distributed BPE merge training — the tokenizer-TRAINING kernel a
large-scale text pipeline runs before tokenizing anything (Sennrich et
al. 2016's byte-pair encoding, the construction behind GPT/LLaMA-family
vocabularies).

Engine breadth beyond the reference (its closest analog is plain word
counting, mirrored by docs_word_count): the reference has no tokenizer
tier at all; this implements the standard algorithm Spark-first.

Scale shape — the textbook BPE trick IS the distributed design: training
runs over the DISTINCT-WORD frequency table (vocabulary-sized, heavy-
tailed — ~100k–10M rows at 100 TB corpus scale), never the corpus
itself. The corpus is touched exactly once (tokenize → word counts, one
shuffle); each merge round is then

    pair stats:  explode adjacent symbol pairs over distinct words,
                 weighted by word count → groupBy pair (map-side
                 combine; output bounded by vocab × avg word length);
    argmax:      ONE driver-side row (count DESC, pair ASC tiebreak —
                 deterministic across partitionings since counts are
                 exact integers);
    merge apply: a per-row array fold (F.aggregate) over each word's
                 current segmentation — leftmost-first non-overlapping
                 replacement, the classic semantics. Map-side only, no
                 shuffle.

Rounds are driver-sequenced like every practical BPE trainer (the
argmax is a global decision); each round's work is one vocab-sized
aggregation, and segmentations are localCheckpoint'd every few rounds
to keep lineage flat (swap for checkpoint() on a cluster — same note as
operators/connected_components.py).

Determinism: counts are exact integers and the tiebreak is total, so
the learned merge sequence is identical across partitionings and
engines — pinned against a pure-Python reference implementation in
tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from projekt_data_engineering_iubh_spark.functions import text as tx

# end-of-word sentinel, the standard trick that lets a merged symbol
# encode "…at word end" distinctly from the same chars mid-word. </w>
# itself can merge with preceding symbols, exactly like the paper.
EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the ONE corpus-sized job."""
    return (
        docs.select(F.explode(tx.tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def initial_segmentation(words: DataFrame) -> DataFrame:
    """(word, n, syms) — each word split to characters + the EOW
    sentinel appended."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return words.select(
        "word", "n", F.concat(chars, F.array(F.lit(EOW))).alias("syms")
    )


def pair_stats(seg: DataFrame) -> DataFrame:
    """(a, b, pair_count) — adjacent-symbol pair frequencies weighted by
    word count, over the current segmentation. Words reduced to a
    single symbol contribute nothing (slice of negative length → empty)."""
    k = F.size("syms")
    pairs = F.when(
        k >= 2,
        F.zip_with(
            F.slice("syms", 1, k - 1),
            F.slice("syms", 2, k - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ).otherwise(F.array())
    return (
        seg.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("pair_count"))
    )


def apply_merge(seg: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every leftmost-first non-overlapping adjacent (a, b) in
    each word's segmentation with the merged symbol a||b — one array
    fold per row, no shuffle. The fold appends each incoming symbol
    unless the accumulator currently ends with ``a`` and the incoming
    symbol is ``b`` — and non-overlap falls out for free: the merged
    symbol ``a||b`` no longer equals ``a`` (append-then-rescan never
    happens within the pass), matching the classic semantics on runs
    like 'aaaa' → ('aa')('aa')."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.aggregate(
        "syms",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) >= 1)
            & (F.element_at(acc, -1) == la)
            & (s == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return seg.select("word", "n", merged.alias("syms"))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    checkpoint_every: int = 4,
    on_round=None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    sequence [(a, b, pair_count), …] in learned order and the final
    (word, n, syms) segmentation frame.

    Stops early when no pair occurs at least twice (merging singleton
    pairs only memorizes individual words). Each round's argmax is one
    collected row — count DESC then (a, b) ASC, a total order over
    exact integers, so the learned sequence is partition- and
    engine-independent.

    Training to a real vocabulary budget is this function with
    n_merges = budget (r8): rounds stay driver-sequenced because
    EXACTNESS requires it — batching symbol-disjoint merges per stats
    pass would be safe for the counts of the batched pairs themselves,
    but a merge (a,b) CREATES pairs (x, ab) whose count can exceed the
    next batched pair's, so the batched sequence can diverge from the
    canonical algorithm (and from the pure-Python reference pin). The
    scale lever is instead bounded lineage: ``checkpoint_every``
    truncates the fold-upon-fold plan so round cost stays flat — the
    measured per-round cost curve lives in BASELINE.md (r8 BPE
    section, tools/bpe_cost_curve.py). ``on_round(i, merge)`` is the
    instrumentation hook that curve uses (called after each round's
    merge is applied)."""
    seg = initial_segmentation(word_counts(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str, int]] = []
    for r in range(n_merges):
        top = (
            pair_stats(seg)
            .filter(F.col("pair_count") >= 2)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["pair_count"]
        merges.append((a, b, cnt))
        seg = apply_merge(seg, a, b)
        if (r + 1) % checkpoint_every == 0:
            # flatten the fold-upon-fold lineage (cluster: checkpoint())
            seg = seg.localCheckpoint(eager=True)
        if on_round is not None:
            on_round(r, (a, b, cnt))
    return merges, seg


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str, int]],
    *,
    checkpoint_every: int = 16,
) -> DataFrame:
    """Apply a learned merge sequence (in order) to new words —
    tokenizer INFERENCE for the word table; per-row folds only, with a
    periodic checkpoint so a long merge list doesn't nest one analyzed
    fold expression per merge (vocabulary-sized frames: cheap)."""
    seg = initial_segmentation(words)
    for i, (a, b, _) in enumerate(merges):
        seg = apply_merge(seg, a, b)
        if (i + 1) % checkpoint_every == 0:
            seg = seg.localCheckpoint(eager=True)
    return seg
