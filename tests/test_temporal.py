"""As-of join (functions/temporal.py) + quota/shard sampling semantics.

The as-of cases pin the exact boundary behavior the union-window
construction must reproduce: strict vs non-strict visibility of a build row
at the probe's own instant, deterministic tiebreak among same-time build
rows, and NULL carry when nothing precedes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from text_extract_api_spark.functions.sampling import (
    quota_per_stratum,
    shard_assign,
)
from text_extract_api_spark.functions.temporal import asof_join


def _frames(spark):
    probe = spark.createDataFrame(
        [(1, 3, "a"), (1, 10, "b"), (1, 15, "c"), (2, 7, "d")],
        "k int, t int, tag string",
    )
    build = spark.createDataFrame(
        [(1, 5, 100, 1.0), (1, 15, 200, 2.0), (9, 1, 900, 9.0)],
        "k int, bt int, bid int, v double",
    )
    return probe, build


def _run(spark, strict):
    probe, build = _frames(spark)
    out = asof_join(
        probe,
        build,
        key="k",
        probe_time="t",
        build_time="bt",
        carry={"prior_id": "bid", "prior_v": "v"},
        tiebreak="bid",
        strict=strict,
    )
    return {r["tag"]: (r["prior_id"], r["prior_v"]) for r in out.collect()}


def test_asof_strict_excludes_same_instant(spark):
    got = _run(spark, strict=True)
    assert got["a"] == (None, None)  # nothing precedes t=3
    assert got["b"] == (100, 1.0)  # latest build < 10 is bt=5
    assert got["c"] == (100, 1.0)  # bt=15 NOT visible at t=15 (strict)
    assert got["d"] == (None, None)  # key 2 has no build rows at all


def test_asof_nonstrict_includes_same_instant(spark):
    got = _run(spark, strict=False)
    assert got["c"] == (200, 2.0)  # bt=15 visible at t=15
    assert got["b"] == (100, 1.0)
    assert got["a"] == (None, None)


def test_asof_tiebreak_among_same_time_builds(spark):
    probe = spark.createDataFrame([(1, 20, "p")], "k int, t int, tag string")
    build = spark.createDataFrame(
        [(1, 10, 7, 0.7), (1, 10, 9, 0.9), (1, 10, 3, 0.3)],
        "k int, bt int, bid int, v double",
    )
    out = asof_join(
        probe, build, "k", "t", "bt",
        carry={"prior_id": "bid", "prior_v": "v"},
        tiebreak="bid", strict=True,
    ).collect()
    assert (out[0]["prior_id"], out[0]["prior_v"]) == (9, 0.9)  # max bid wins


def test_asof_probe_columns_survive(spark):
    probe, build = _frames(spark)
    out = asof_join(
        probe, build, "k", "t", "bt",
        carry={"prior_id": "bid"}, tiebreak="bid",
    )
    assert out.columns == ["k", "t", "tag", "prior_id"]
    assert out.count() == probe.count()  # left join: every probe row kept


def test_quota_caps_each_stratum_and_is_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quota = 7
    a = quota_per_stratum(docs, quota)
    counts = {
        r["source"]: r["n"]
        for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in counts.items():
        assert n == min(quota, avail[src])
    # rerun selects the identical doc_ids (hash order, no RNG)
    b = quota_per_stratum(docs, quota)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_quota_two_phase_matches_single_window(spark, sf_dir):
    """The salted two-phase plan must select exactly the rows the direct
    per-stratum window would (the oracle's form)."""
    from text_extract_api_spark.functions.sampling import hash_u32_col
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quota = 5
    direct = (
        docs.select(
            "doc_id", "source", hash_u32_col(F.col("doc_id"), "quota").alias("_u")
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.partitionBy("source").orderBy("_u", "doc_id"))
            .cast("bigint"),
        )
        .filter(F.col("rk") <= quota)
        .select("doc_id", "source", "rk")
    )
    two_phase = quota_per_stratum(docs, quota)
    assert two_phase.exceptAll(direct).count() == 0
    assert direct.exceptAll(two_phase).count() == 0


def test_shard_positions_dense_and_stable(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_shards = 8
    out = shard_assign(docs, n_shards)
    assert out.count() == docs.count()
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per.collect():
        assert 0 <= r["shard"] < n_shards
        assert (r["mn"], r["mx"]) == (1, r["n"])  # dense 1..n per shard
    again = shard_assign(docs, n_shards)
    assert out.exceptAll(again).count() == 0


def test_corpus_prep_e2e_manifest_contract(spark):
    """Composition sanity for the end-to-end prep query: (shard, pos) is a
    valid loader manifest — unique, dense per shard, quota respected — and
    deterministic across reruns."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    out = entrymod.queries()["corpus_prep_e2e"](spark, sf)
    rows = out.collect()
    assert rows, "funnel should keep at least some documents"
    seen = {(r["shard"], r["pos"]) for r in rows}
    assert len(seen) == len(rows)  # (shard, pos) unique
    per_source = {}
    per_shard = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    assert all(n <= entrymod.QUOTA_PER_SOURCE for n in per_source.values())
    for shard, poss in per_shard.items():
        assert 0 <= shard < entrymod.N_SHARDS
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense 1..n
    again = entrymod.queries()["corpus_prep_e2e"](spark, sf)
    assert out.exceptAll(again).count() == 0


def test_asof_hot_key_split_identical_to_unsplit(spark):
    """Skew defense (VERDICT r3 #3): one key carries 90% of the build rows;
    the time-range-split + boundary-carry path (hot_key_splits) must return
    EXACTLY the unsplit form's rows — including probes in build-free time
    ranges (carry-in across empty splits) and strict same-instant boundaries
    that land exactly on split cuts."""
    import random

    rng = random.Random(42)
    HOT = 1
    # hot key: 900 builds clustered in t∈[0,300) — later probes exercise
    # carry-in through build-free splits; cold keys sanity-check isolation
    build_rows = [(HOT, rng.randint(0, 299), i) for i in range(900)]
    build_rows += [
        (k, rng.randint(0, 999), 10_000 + i)
        for i, k in enumerate(rng.choices(range(2, 12), k=100))
    ]
    probe_rows = [(i, HOT, rng.randint(0, 999)) for i in range(900)]
    probe_rows += [
        (900 + i, rng.randint(2, 13), rng.randint(0, 999)) for i in range(100)
    ]
    probe = spark.createDataFrame(probe_rows, "pid int, k int, t int")
    build = spark.createDataFrame(build_rows, "k int, bt int, bid int")

    for strict in (True, False):
        base = asof_join(
            probe, build, "k", "t", "bt",
            carry={"prior": "bid"}, tiebreak="bid", strict=strict,
        )
        split = asof_join(
            probe, build, "k", "t", "bt",
            carry={"prior": "bid"}, tiebreak="bid", strict=strict,
            hot_key_splits=8,
        )
        assert base.exceptAll(split).count() == 0
        assert split.exceptAll(base).count() == 0
        assert split.count() == probe.count()


def test_asof_randomized_against_python_reference(spark):
    """50 seeded random key/time datasets (dense time range to force
    collisions), batched into ONE Spark job via composite case keys, each
    compared to a brute-force per-probe argmax reference — pins the
    union-window construction against the operator's definition."""
    import random

    probe_rows, build_rows, cases = [], [], []
    pid = 0
    for case in range(50):
        rng = random.Random(1000 + case)
        strict = case % 2 == 0
        builds = [
            (rng.randint(1, 3), rng.randint(0, 10), 100 + i)
            for i in range(rng.randint(0, 12))
        ]
        probes = [
            (pid + i, rng.randint(1, 3), rng.randint(0, 10))
            for i in range(rng.randint(1, 12))
        ]
        pid += len(probes)
        cases.append((case, strict, probes, builds))
        ck = case * 100
        probe_rows += [(case, ck + k, t, i) for (i, k, t) in probes]
        build_rows += [(ck + k, t, bid) for (k, t, bid) in builds]

    # two batched jobs (strict and non-strict halves share one frame each)
    probe_df = spark.createDataFrame(
        probe_rows, "case int, k int, t int, pid int"
    )
    build_df = spark.createDataFrame(build_rows, "k int, bt int, bid int")
    got = {}
    for strict in (True, False):
        sub = probe_df.filter(
            (F.col("case") % 2 == 0) if strict else (F.col("case") % 2 == 1)
        )
        out = asof_join(
            sub, build_df, "k", "t", "bt",
            carry={"prior": "bid"}, tiebreak="bid", strict=strict,
        )
        got.update({r["pid"]: r["prior"] for r in out.collect()})

    for case, strict, probes, builds in cases:
        for pid_, k, t in probes:
            cands = [
                (bt, bid)
                for (bk, bt, bid) in builds
                if bk == k and (bt < t if strict else bt <= t)
            ]
            want = max(cands)[1] if cands else None
            assert got[pid_] == want, (case, strict, k, t, got[pid_], want)
