"""AQE skew-join demonstration (r2 VERDICT #8).

The salted two-stage aggregate (``operators/skew.py``) covers GROUPING
skew; join skew is deliberately left to AQE's runtime skew-split
(``spark.sql.adaptive.skewJoin``), which splits an oversized shuffle
partition on the skewed side and duplicates the matching partition on
the other — no salt columns, no plan rewrite. This test proves that
policy actually engages: a synthetic hot-key events⋈users join at
test-scale thresholds must show ``skew=true`` on the executed
SortMergeJoin.

At 100 TB the same mechanism handles the hot user_id with the DEFAULT
thresholds (256 MB partition, 5x median); the test only lowers the
byte thresholds so a local[32] frame can cross them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # test-scale thresholds: one hot key (~6 MB of padded rows) must
    # exceed factor x median of the cold partitions and the byte floor
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
    # force sort-merge: broadcast would hide the shuffle being split
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_hot_key_join(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        # user 0 owns 60k padded events; 200 cold users own 15 each
        events = spark.range(0, 63_000).select(
            F.when(F.col("id") < 60_000, F.lit(0))
            .otherwise((F.col("id") % 200) + 1)
            .alias("user_id"),
            F.col("id").alias("event_id"),
            F.repeat(F.lit("x"), 100).alias("pad"),
        )
        users = spark.range(0, 201).select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("segment_"), F.col("id") % 5).alias("segment"),
        )
        joined = events.join(users, "user_id").select(
            "user_id", "event_id", "segment"
        )
        # collect() executes THIS frame's QueryExecution (a noop write or
        # count() would build a different one whose adaptive plan this
        # handle never sees finalized)
        assert len(joined.collect()) == 63_000
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "AdaptiveSparkPlan isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
