"""Link-graph operators: anchor aggregation and integer PageRank.

Properties under test:
- anchor_text_agg counts/distincts and the hot-target anchor cap;
- pagerank_fixed conserves total mass to within deterministic floor-
  division dust, ranks a hub above leaves, redistributes dangling mass,
  and — the reason it exists in integer form — is BIT-IDENTICAL across
  different partition counts (float PageRank is not).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from text_extract_api_spark.functions.linkgraph import (
    PAGERANK_TOTAL_UNITS,
    anchor_text_agg,
    pagerank_fixed,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, href string, anchor string")


def test_anchor_agg_counts_and_distincts(spark):
    e = _edges(
        spark,
        [
            ("d1", "/a", "Alpha"),
            ("d1", "/a", "Alpha"),  # same doc, same anchor: 2 inlinks, 1 doc
            ("d2", "/a", "First"),
            ("d3", "/b", "Beta"),
        ],
    )
    got = {r.href: r for r in anchor_text_agg(e).collect()}
    assert got["/a"].n_inlinks == 3
    assert got["/a"].n_src_docs == 2
    assert got["/a"].anchors == "Alpha|First"  # sorted distinct
    assert got["/b"].n_inlinks == 1 and got["/b"].anchors == "Beta"


def test_anchor_agg_caps_hot_target_payload(spark):
    e = _edges(
        spark, [("d%d" % i, "/hot", "anchor-%02d" % i) for i in range(40)]
    )
    row = anchor_text_agg(e, max_anchors=5).collect()[0]
    assert row.n_inlinks == 40 and row.n_src_docs == 40
    assert row.anchors == "|".join("anchor-%02d" % i for i in range(5))


def _pr_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_mass_conserved_and_hub_ranked(spark):
    # a,b,c all link to hub; hub links back to a. d is isolated-ish (a->d).
    pairs = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"), ("a", "d")]
    ranks = {r.node: r.rank_units for r in pagerank_fixed(_pr_edges(spark, pairs)).collect()}
    assert set(ranks) == {"a", "b", "c", "d", "hub"}
    # floor-division dust: < n units lost per division site per iteration
    assert 0 < sum(ranks.values()) <= PAGERANK_TOTAL_UNITS
    assert sum(ranks.values()) > PAGERANK_TOTAL_UNITS * 999 // 1000
    # the hub collects three full contributions; everyone else gets less
    assert ranks["hub"] == max(ranks.values())
    # b and c are structurally identical -> identical integer ranks
    assert ranks["b"] == ranks["c"]
    # d receives half of a's mass, b/c only the dangling+teleport floor
    assert ranks["d"] > ranks["b"]


def test_pagerank_dangling_mass_redistributed(spark):
    # star: everything points at sink, sink has no outlinks (dangling)
    pairs = [("a", "sink"), ("b", "sink"), ("c", "sink")]
    ranks = {r.node: r.rank_units for r in pagerank_fixed(_pr_edges(spark, pairs)).collect()}
    assert sum(ranks.values()) > PAGERANK_TOTAL_UNITS * 999 // 1000
    # sources are never linked to, but dangling redistribution + teleport
    # keeps them strictly above zero
    assert min(ranks.values()) > 0
    assert ranks["sink"] > ranks["a"] and ranks["a"] == ranks["b"] == ranks["c"]


def test_pagerank_bit_identical_across_partitionings(spark):
    """The design property: integer arithmetic makes the result invariant
    to partition count / aggregation order. The same graph computed from a
    1-partition and a 16-partition edge frame must match unit-for-unit."""
    pairs = [
        ("n%d" % i, "n%d" % ((i * 7 + 3) % 50)) for i in range(50)
    ] + [("n%d" % i, "hub") for i in range(0, 50, 3)]
    e1 = _pr_edges(spark, pairs).coalesce(1)
    e16 = _pr_edges(spark, pairs).repartition(16)
    r1 = {r.node: r.rank_units for r in pagerank_fixed(e1).collect()}
    r16 = {r.node: r.rank_units for r in pagerank_fixed(e16).collect()}
    assert r1 == r16


def test_pagerank_iters_zero_is_uniform(spark):
    pairs = [("a", "b"), ("b", "c")]
    ranks = {
        r.node: r.rank_units
        for r in pagerank_fixed(_pr_edges(spark, pairs), iters=0).collect()
    }
    assert set(ranks.values()) == {PAGERANK_TOTAL_UNITS // 3}
