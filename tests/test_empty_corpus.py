"""Empty-corpus robustness: every registered query must run (not crash) on
zero-row tables. At 100 TB, empty partitions, empty date slices, and
freshly-created tables are routine inputs; driver-side scaffolding that
assumes "at least one row" (`.first()[0]`, non-empty collect) dies there.
Caught for real in r3: all three stored-ANN probes crashed on an empty
embeddings table before the vec-id-0 guard."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(f"{dst}/{t}.parquet")
        )
    return dst


def test_every_query_survives_empty_tables(spark, empty_sf):
    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, empty_sf).count()
        except Exception as e:  # collect ALL failures, not just the first
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
    assert not failures, failures
