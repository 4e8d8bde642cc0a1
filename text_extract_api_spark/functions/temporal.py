"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

Not in the reference (single-document service, no temporal queries); part of
the build contract's "operators Spark lacks" scope. For each *probe* row,
attach the *build* row with the greatest build-time ≤ (or <, strict) the
probe's time within the same key — the classic point-in-time lookup a
training-data pipeline needs for "state of X when Y happened" features
(latest prior snapshot / label / price / purchase).

Construction (Spark-first, no range explosion, no per-row Python):

1. union-tag probe and build rows into one frame (``unionByName`` with
   missing-column fill — a narrow op),
2. ONE shuffle: hash-partition by key,
3. in-partition sort by ``(time, side, tiebreak)`` — the side bit encodes
   strictness: for strict ``<`` the probe sorts BEFORE same-time build rows
   (so it cannot see them), for ``<=`` after,
4. ``last(build_payload, ignorenulls=True)`` over an unbounded-preceding
   running window carries the latest build payload forward to each probe
   row — a single window pass, whole-stage-codegen'd,
5. filter back to probe rows and unpack the payload struct.

Contrast with the naive ``probe JOIN build ON key AND b.t <= p.t`` + argmax:
that join is a range join whose output is O(probe × matching builds) before
the argmax prunes it — quadratic per hot key at 100 TB. The union-window
form moves each row exactly once.

Scale notes: cost is one exchange + one in-partition sort, both on the key;
a single pathologically hot key serializes into one window partition (window
carry-forward cannot be salted without a second boundary-carry pass — the
standard fix if ever needed: range-split the hot key by time, carry each
split's closing state into the next). Multiple build rows at the same
``(key, time)`` are resolved deterministically by ``tiebreak`` (greatest
wins), so results are engine- and partitioning-independent.

DuckDB parity: ``ASOF LEFT JOIN ... ON probe.key = build.key AND
probe.t > build.t`` (strict) / ``>=`` (non-strict) reproduces this exactly
(the oracle in ``__spark_entry__.py`` does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_T = "_asof_t"
_SIDE = "_asof_side"
_TB = "_asof_tb"
_PAYLOAD = "_asof_payload"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    carry: dict[str, str],
    tiebreak: str,
    strict: bool = True,
) -> DataFrame:
    """Left as-of join: every probe row, plus ``carry`` columns from the
    latest prior build row (NULLs when no build row precedes it).

    ``carry`` maps output-column-name -> build-column-name; ``tiebreak`` is
    a build column ordering same-time build rows (greatest wins). With
    ``strict`` a build row at exactly the probe's time is NOT visible.
    """
    # Side bit: rows are carried forward in (time, side) order and the
    # window includes the current row, so "strict" = probe sorts before
    # same-time builds (side 0 < 1), "non-strict" = after (1 > 0).
    probe_side, build_side = (0, 1) if strict else (1, 0)

    payload = F.struct(
        *[F.col(src).alias(dst) for dst, src in carry.items()]
    ).alias(_PAYLOAD)
    build_rows = build.select(
        F.col(key),
        F.col(build_time).alias(_T),
        F.lit(build_side).alias(_SIDE),
        F.col(tiebreak).cast("bigint").alias(_TB),
        payload,
    )
    probe_rows = probe.withColumn(_T, F.col(probe_time)).withColumn(
        _SIDE, F.lit(probe_side)
    ).withColumn(_TB, F.lit(0).cast("bigint"))

    unioned = probe_rows.unionByName(build_rows, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(_T, _SIDE, _TB)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = carried.filter(F.col(_SIDE) == probe_side).select(
        *[F.col(c) for c in probe.columns],
        *[F.col(f"{_PAYLOAD}.{dst}").alias(dst) for dst in carry],
    )
    return out
