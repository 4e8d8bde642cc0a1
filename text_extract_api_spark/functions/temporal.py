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

Scale notes: cost is one exchange + one in-partition sort, both on the key.
A single pathologically hot key (one user = 90% of events) would serialize
into one window partition; ``hot_key_splits > 1`` defends it with the
standard **time-range-split + boundary-carry** construction:

1. cut the time axis into ``hot_key_splits`` ranges (approx-quantile
   boundaries over the probe times — any boundaries are CORRECT, they only
   affect balance, so the approximation is free);
2. run the same union-window carry per ``(key, split)`` — the hot key's
   window work now parallelizes across splits;
3. compute each ``(key, split)``'s CLOSING build state (max ``(t, tb)``
   build payload — one small agg) and prefix-carry it across splits with a
   window over a keys×splits-sized frame (the per-key serial section is now
   #splits rows, not all rows);
4. each probe's answer = its in-split carry, falling back to the carry-in
   from earlier splits. Splits partition BY TIME, so carry-in builds are
   strictly earlier than every current-split probe — strict/non-strict
   semantics need no boundary special-case.

Output is bit-identical to the unsplit form under any split count or
boundary placement (tested on a 90%-hot-key build side). Multiple build
rows at the same ``(key, time)`` are resolved deterministically by
``tiebreak`` (greatest wins), so results are engine- and
partitioning-independent.

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


_SPLIT = "_asof_split"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    carry: dict[str, str],
    tiebreak: str,
    strict: bool = True,
    hot_key_splits: int = 1,
) -> DataFrame:
    """Left as-of join: every probe row, plus ``carry`` columns from the
    latest prior build row (NULLs when no build row precedes it).

    ``carry`` maps output-column-name -> build-column-name; ``tiebreak`` is
    a build column ordering same-time build rows (greatest wins). With
    ``strict`` a build row at exactly the probe's time is NOT visible.

    ``hot_key_splits > 1`` enables the time-range-split + boundary-carry
    path for skewed keys (module docstring §scale notes): identical output,
    the hot key's window work spread over that many time ranges.
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

    if hot_key_splits > 1:
        carried = _carry_split(unioned, key, probe, hot_key_splits)
    else:
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


def _carry_split(
    unioned: DataFrame, key: str, probe: DataFrame, n_splits: int
) -> DataFrame:
    """Time-range-split + boundary-carry payload propagation (skew defense).

    Correct under ANY boundary placement: split assignment is a pure
    function of the row's time, equal times always share a split, and the
    carry-in to split s is exactly the closing build state of splits < s —
    strictly earlier in time by construction.
    """
    # Approx-quantile cut points over the observed times: one pass, a
    # ≤(n_splits-1)-element driver list. Boundaries only affect BALANCE,
    # never the result, so the approximation (and sampling just the probe
    # side at scale) is free.
    cuts = unioned.select(F.col(_T).cast("double").alias("td")).approxQuantile(
        "td", [i / n_splits for i in range(1, n_splits)], 0.01
    )
    cuts = sorted(set(c for c in cuts if c is not None))
    split_col = F.lit(0)
    for c in cuts:
        split_col = split_col + F.when(
            F.col(_T).cast("double") > F.lit(c), F.lit(1)
        ).otherwise(F.lit(0))
    tagged = unioned.withColumn(_SPLIT, split_col)

    # Phase A: the normal carry, but partitioned by (key, split) — the hot
    # key's serial window section shrinks by the split factor.
    w_in = (
        Window.partitionBy(key, _SPLIT)
        .orderBy(_T, _SIDE, _TB)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_split = tagged.withColumn(
        "_asof_in", F.last(_PAYLOAD, ignorenulls=True).over(w_in)
    )

    # Phase B: each (key, split)'s closing build state — max (t, tb) build
    # payload; struct max is deterministic under the same (key, t, tb)-
    # uniqueness contract the unsplit window relies on.
    closing = (
        tagged.filter(F.col(_PAYLOAD).isNotNull())
        .groupBy(key, _SPLIT)
        .agg(F.max(F.struct(F.col(_T), F.col(_TB), F.col(_PAYLOAD))).alias("_mx"))
        .select(key, _SPLIT, F.col(f"_mx.{_PAYLOAD}").alias("_closing"))
    )
    # Phase C: prefix-carry closings across splits per key, over the FULL
    # (key, split) domain — a split with no build rows still needs the
    # carry-in from earlier splits, so the window must see its row. The
    # frame is ≤ keys × splits rows — the only remaining per-key serial
    # section.
    domain = tagged.select(key, _SPLIT).distinct()
    w_carry = (
        Window.partitionBy(key)
        .orderBy(_SPLIT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        domain.join(closing, [key, _SPLIT], "left")
        .withColumn("_carry_in", F.last("_closing", ignorenulls=True).over(w_carry))
        .select(key, _SPLIT, "_carry_in")
    )

    # Phase D: in-split carry wins; earlier-split carry-in is the fallback.
    # Equi-join on (key, split) — keys×splits scales with the corpus, so no
    # broadcast hint; AQE downgrades when genuinely small.
    return (
        in_split.join(carry_in, [key, _SPLIT], "left")
        .withColumn(_PAYLOAD, F.coalesce("_asof_in", "_carry_in"))
        .drop("_asof_in", "_carry_in", _SPLIT)
    )
