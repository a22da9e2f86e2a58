"""Reusable dataflow operators (SURVEY.md §2).

Each module re-expresses one family of reference semantics as composable
functions over DataFrames — native Column expressions wherever possible so
Catalyst can push down / prune / codegen through them.
"""
