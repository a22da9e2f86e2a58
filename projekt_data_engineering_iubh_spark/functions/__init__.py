"""Portable scalar/array function helpers.

Every helper here has two renderings that must stay in lockstep: a PySpark
Column expression and a DuckDB SQL snippet (used by the oracle harness).
Keeping both in one module, generated from shared constants, is what makes
the oracle-differential tests byte-exact.
"""
