"""Near-duplicate cluster resolution: pair list → connected components →
canonical document per cluster.

The dedup modules emit verified near-dup PAIRS (dedup.py, similarity.py);
the corpus-level question is cluster membership — A~B and B~C put A and C
in one cluster even when A!~C directly (template chains are common in web
corpora). This module closes that transitive gap and picks one canonical
representative per cluster, which is the actual end product a training-data
pipeline needs ("keep one copy").

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame aggregations:

- large-star: for every node u, attach each strictly-larger neighbor to the
  minimum of N(u) ∪ {u}.
- small-star: orient edges toward the smaller endpoint, then attach each
  neighbor (and u itself) to that minimum.

Both steps are a single groupBy-shuffle each; the edge set monotonically
flattens into a star forest (every node points directly at its component's
minimum id) in O(log² n) rounds — crucially NOT O(diameter), so a chain of
10^6 incrementally-edited documents resolves in ~20 rounds, where naive
min-label propagation needs 10^6. Per-round work is proportional to the
current edge count.

Scale notes:
- Each round materializes its edge frame with ``localCheckpoint`` — an
  iterative algorithm's lineage otherwise grows per round and Catalyst
  re-analysis dominates. On a real cluster use a reliable checkpoint dir
  (``spark.sparkContext.setCheckpointDir``) and ``checkpoint()``;
  localCheckpoint keeps the sandbox single-JVM-safe. Round frames are
  pair-list-sized (near-dup pairs, not the corpus) — orders of magnitude
  smaller than the input table.
- The convergence probe (is any edge target still a non-root?) is a
  self-join count on the star-forest frame — O(|E|) on the shrunken edge
  set, and it doubles as the action that materializes the checkpoint.
- Cluster ids are component-minimum doc ids: deterministic under any
  partitioning, no RNG, no driver-side state beyond the loop counter.
- Edges always point from a larger id to a strictly smaller one, so the
  component minimum can never appear as a child — when the frame becomes a
  star forest, every root IS its component's minimum.

Reference parity: the reference engine (tonner007/text-extract-api) has no
clustering stage — its dedup is the md5 cache-hit short-circuit
(extract/tasks.py:33-41); this module is part of the §2.11 training-data
surface built on top of that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Safety valve only: large-star/small-star provably converges in O(log² n)
# alternations — 30 rounds covers any physically storable corpus.
MAX_ROUNDS = 30


def _symmetric(edges: DataFrame) -> DataFrame:
    """Both orientations of an undirected (u, v) edge list, self-loops dropped."""
    e = edges.filter(F.col("u") != F.col("v"))
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _star_min(grouped: DataFrame) -> DataFrame:
    """Add m = min(nbrs ∪ {u}) to a (u, nbrs) frame — row-local."""
    return grouped.withColumn(
        "m", F.least(F.array_min("nbrs"), F.col("u"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Attach strictly-larger neighbors of u to min(N(u) ∪ {u}).

    One groupBy(u) shuffle over the symmetric edge list; the min is computed
    once per group, the v > u filter is row-local after re-exploding.
    Every emitted edge (v, m) has m ≤ u < v: strictly decreasing targets.
    """
    grouped = _symmetric(edges).groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    return (
        _star_min(grouped)
        .select(F.col("u"), F.col("m"), F.explode("nbrs").alias("x"))
        .filter(F.col("x") > F.col("u"))
        .select(F.col("x").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the smaller endpoint, then attach that group
    (and u itself) to its minimum. One groupBy shuffle; emits (x, m) for
    x in N(u) ∪ {u}, x ≠ m."""
    oriented = _symmetric(edges).filter(F.col("v") < F.col("u"))
    grouped = oriented.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    return (
        _star_min(grouped)
        .select(
            F.col("m"),
            F.explode(F.array_union("nbrs", F.array("u"))).alias("x"),
        )
        .filter(F.col("x") != F.col("m"))
        .select(F.col("x").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(pairs: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """(id, cluster_id) for every node appearing in ``pairs`` (id_a, id_b).

    cluster_id is the minimum id of the node's connected component; roots
    map to themselves. Deterministic; converges in O(log² n) alternating
    large-star/small-star rounds (see module docstring).

    The caller's id type is preserved end-to-end: the star ops only need a
    total order, which every orderable Spark type has (for string doc_ids —
    UUIDs, prefixed ids — "minimum" is lexicographic, matching DuckDB
    ``min()`` over VARCHAR). Casting to long here would NULL non-numeric
    ids and the ``u != v`` filter would silently drop those edges; at scale
    prefer mapping very long string ids to dense long surrogates *outside*
    this function (one join each way) — comparisons stay cheap and the
    output type is still the caller's.
    """
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # Converged ⇔ the frame is a star forest with UNIQUE parents:
        # (a) no edge target is itself a child elsewhere (chain-free), and
        # (b) no node has two parents (a shared leaf between two stars is
        #     chain-free but not converged — the next small-star would merge
        #     the stars, so stopping there would split a component).
        # Edges always decrease (v < u) and both star ops preserve
        # connectivity, so chain-free + unique-parents ⇒ each original
        # component is exactly one star centered at its minimum id.
        chains = edges.alias("a").join(
            edges.alias("b"), F.col("a.v") == F.col("b.u"), "left_semi"
        )
        multi_parent = (
            edges.groupBy("u")
            .agg(F.count_distinct("v").alias("n_par"))
            .filter(F.col("n_par") > 1)
        )
        if chains.isEmpty() and multi_parent.isEmpty():
            break
    children = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = (
        edges.select(F.col("v").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    return children.unionByName(roots)


def neardup_clusters(pairs: DataFrame) -> DataFrame:
    """Per-doc cluster assignment over a verified near-dup pair list.

    Returns (doc_id, cluster_id, is_canonical) for every doc appearing in
    ≥1 pair — singleton docs are implicitly their own cluster and are
    omitted (at corpus scale the overwhelming majority of docs are
    singletons; emitting them would turn a pair-sized result into a
    full-corpus copy). is_canonical marks the kept representative: the
    cluster's minimum doc_id. "Drop the dups" is then an anti-join of the
    corpus against the non-canonical rows.
    """
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("cluster_id"),
        (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
    )
