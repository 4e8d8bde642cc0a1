"""Driver-contract smoke: entry() returns rows, queries/oracles align."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "offset", "kind", "text", "media_ref"]


def test_every_query_has_oracle_and_runs(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    missing = set(qs) - set(oracles)
    # non-SQL-expressible ops may omit oracles; today everything has one
    assert missing == set()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
