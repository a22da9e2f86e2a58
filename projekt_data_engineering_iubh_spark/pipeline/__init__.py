"""Reference-parity ETL product (SURVEY.md §7 phase C).

A clean reimplementation of the reference's daily batch job
(``/root/reference/src/daily_aggregator.py``) with its documented-but-
unimplemented behaviors fixed: stable event ordering, cached shared
subtrees, and an idempotent summary upsert.
"""
