"""Link-graph operators over the extracted outlink edge list.

The extraction pipeline's ``html_outlinks`` leg (extractors/markdown.py)
emits the crawl-frontier edge list (src doc, href, anchor text, position).
These operators are the two standard consumers of that edge list in a
web-scale corpus pipeline — signals the reference engine (a per-document
HTTP service, tonner007/text-extract-api) has no analog for, mandated by
the build contract's training-data-pipeline surface (SURVEY.md §2.11):

- ``anchor_text_agg``: per-target incoming-anchor aggregation. Anchor text
  is the classic off-page description of a target URL (the signal behind
  anchor-text indexing); per-target in-link counts also feed crawl
  prioritization and quality scoring.
- ``pagerank_fixed``: fixed-iteration PageRank for crawl/selection
  prioritization, computed ENTIRELY in scaled integer arithmetic so the
  result is bit-deterministic under any partitioning / aggregation order —
  floating-point PageRank sums are order-dependent, which would break both
  restart-stability and the DuckDB value-hash oracle.

Scale notes (10^12-doc corpus):
- anchor_text_agg is one shuffle on the target href with map-side combine;
  hot targets (portal front pages with 10^8 in-links) skew the exchange —
  counts partial-aggregate away, and the distinct-anchor set is capped
  per-target (``max_anchors``) so a hot key carries a bounded payload.
- pagerank_fixed is the canonical iterative-shuffle workload: each
  iteration is (rank ⋈ outdeg) + groupBy(dst). Ranks should be persisted
  per iteration and localCheckpointed every few iterations to truncate
  lineage; the iteration count is fixed (crawl prioritization wants a few
  power-iterations, not convergence), so the plan is statically bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Total rank mass in integer units. 10^12 units split across n nodes keeps
# ≥6 significant digits for graphs up to ~10^6 nodes per unit of initial
# rank; the floor-division dust lost per iteration is identical on the
# Spark and DuckDB sides by construction (same op order, same integer
# semantics), so results stay hash-exact.
PAGERANK_TOTAL_UNITS = 10**12
PAGERANK_DAMP_NUM = 85  # damping d = 85/100, Brin & Page's published value
PAGERANK_DAMP_DEN = 100


def anchor_text_agg(
    edges: DataFrame,
    src_col: str = "doc_id",
    href_col: str = "href",
    anchor_col: str = "anchor",
    max_anchors: int = 16,
) -> DataFrame:
    """Per-target anchor aggregation: (href, n_inlinks, n_src_docs,
    anchors) where ``anchors`` is the lexicographically-first
    ``max_anchors`` DISTINCT anchor texts joined with '|'.

    One shuffle on href. n_inlinks partial-aggregates map-side; the
    distinct-anchor payload is the skew concern on hot targets, so it is
    capped: ``slice(array_sort(collect_set(...)))`` bounds what a hot key
    carries to max_anchors strings. (collect_set itself still sees every
    distinct anchor of a hot key inside one task at 10^8 in-links — the
    standard two-phase fix is a pre-aggregation on (href, anchor) before
    this agg, which ``pre_distinct=True`` callers get by passing
    ``edges.dropDuplicates([href_col, anchor_col, src_col])`` upstream;
    the cap keeps the OUTPUT bounded either way.)"""
    return (
        edges.groupBy(F.col(href_col).alias("href"))
        .agg(
            F.count("*").cast("int").alias("n_inlinks"),
            F.countDistinct(src_col).cast("int").alias("n_src_docs"),
            F.array_join(
                F.slice(
                    F.array_sort(F.collect_set(anchor_col)),
                    1,
                    max_anchors,
                ),
                "|",
            ).alias("anchors"),
        )
    )


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    total_units: int = PAGERANK_TOTAL_UNITS,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer arithmetic:
    (node, rank_units) after ``iters`` power iterations with damping
    85/100, dangling mass redistributed uniformly.

    Update rule (every division is floor division on BIGINT, applied in
    this exact order on both the Spark and DuckDB sides):

        base   = total_units DIV n
        r_0    = base                                   (every node)
        dang_i = Σ r_i over nodes with outdeg 0
        in_i+1(v) = Σ_{(u,v) ∈ E} r_i(u) DIV outdeg(u)
        r_i+1  = (15 * base) DIV 100
                 + (85 * (in_i+1 + dang_i DIV n)) DIV 100

    Integer, not float, because distributed float summation is
    aggregation-order-dependent: the same job on a different partition
    count would produce different low-order bits, breaking restart
    determinism and any value-hash comparison. BIGINT sums are exact and
    commutative; the floor-division dust (< n units per iteration, i.e.
    < 10^-6 of total mass at the default scale) is deterministic.

    Plan shape per iteration: one equi-join (ranks ⋈ edges+outdeg on src),
    one groupBy(dst) with map-side combine, and two one-row aggregates
    (dangling mass, node count) broadcast back via crossJoin — no
    driver-side collect anywhere. Like connected_components, the shared
    frames (edges, nodes, outdeg) and each iteration's ranks are
    materialized with ``localCheckpoint``: edges/nodes/ranks each appear
    under MANY downstream subtrees, and without the checkpoint the static
    plan replays the (possibly Arrow-extracted) edge subtree dozens of
    times and lineage grows per iteration. On a real cluster use a
    reliable checkpoint dir + ``checkpoint()``; localCheckpoint keeps the
    sandbox single-JVM-safe."""
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("d"))
    consts = nodes.agg(F.count("*").alias("n"))

    # Every division below is Spark SQL's integral DIV (selectExpr — the
    # Column API's `/` always widens to DOUBLE, whose rounding could
    # diverge from the oracle's exact BIGINT `//`). All operands are
    # non-negative, so DIV's truncation == floor on both engines.
    total = f"CAST({int(total_units)} AS BIGINT)"
    num = int(PAGERANK_DAMP_NUM)
    den = int(PAGERANK_DAMP_DEN)
    ranks = nodes.crossJoin(F.broadcast(consts)).selectExpr(
        "node", f"{total} DIV n AS r"
    )
    for _ in range(iters):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "r", "d")
        dang = with_deg.filter(F.col("d").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0).cast("long")).alias("dang")
        )
        inflow = (
            edges.join(with_deg, edges["src"] == with_deg["node"])
            .selectExpr("dst", "r DIV d AS c")
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .crossJoin(F.broadcast(consts))
            .crossJoin(F.broadcast(dang))
            .selectExpr(
                "node",
                f"({den - num} * ({total} DIV n)) DIV {den}"
                f" + ({num} * (COALESCE(inflow, CAST(0 AS BIGINT))"
                f" + dang DIV n)) DIV {den} AS r",
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_units"))
