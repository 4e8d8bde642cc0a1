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

from pyspark.sql import DataFrame, Window, functions as F

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
        #
        # ONE aggregation job checks both (VERDICT r4 #8 — was a semi-join
        # action plus a groupBy action per round): tag each node with its
        # role(s) — child rows carry their parent v, parent rows carry
        # NULL — then per node count distinct parents (NULLs don't count)
        # and whether it ever appears as a parent. A chain exists iff some
        # node is both child and parent; multi-parent iff n_par > 1.
        v_type = edges.schema["v"].dataType
        tagged = edges.select(F.col("u").alias("node"), "v").unionByName(
            edges.select(
                F.col("v").alias("node"), F.lit(None).cast(v_type).alias("v")
            )
        )
        not_converged = (
            tagged.groupBy("node")
            .agg(
                F.count_distinct("v").alias("n_par"),
                F.max(F.col("v").isNull()).alias("is_parent"),
            )
            .agg(
                F.max(
                    ((F.col("n_par") >= 1) & F.col("is_parent"))
                    | (F.col("n_par") > 1)
                ).alias("bad")
            )
            .first()["bad"]
        )
        if not not_converged:
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


# ---------------------------------------------------------------- k-means /
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): cluster the embedding space
# with k-means, then hunt near-duplicates ONLY inside each cluster — the
# construction that turns the corpus-quadratic cosine-dedup problem into a
# sum of per-cluster quadratics.

KMEANS_K = 16
KMEANS_ITERS = 2
SEMDEDUP_COS = 0.35  # within-cluster near-dup threshold (sf-synthetic scale)


def _sqdist_col(v, c) -> F.Column:
    """Squared L2 distance, left-to-right fold in double, rounded to 9 dp.
    The fold order matches the DuckDB oracle's list_sum(list_transform(
    list_zip(...))) term order; rounding guards the residual engine noise
    (different SIMD/merge orders) without ever deciding an argmin — gaps
    between distinct random centroids are O(1), 9 dp is 10^8 below them."""
    return F.round(
        F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )


def _assign_col(cents: list[list[float]]) -> F.Column:
    """struct(dist, cluster) of the nearest centroid: array_min over
    struct(dist, i) — struct comparison is lexicographic, so the minimum is
    the smallest distance with ties broken to the lowest centroid index,
    and every one of the k×dim distance terms is evaluated exactly once
    per row (a transform-then-array_position form would evaluate the
    distance array twice: no CSE across non-attribute HOF operands)."""
    # ONE generated-SQL expr instead of k×dim F.lit() calls: each lit is a
    # py4j round-trip, measured 0.6 s per assignment build at k=16/dim=64
    # vs 1 ms for the parsed string (3 builds per kmeans call)
    carr = F.expr(
        "array("
        + ",".join(
            f"struct({i} as i, array("
            + ",".join(f"{float(x)!r}D" for x in c)
            + ") as c)"
            for i, c in enumerate(cents)
        )
        + ")"
    )
    return F.array_min(
        F.transform(
            carr,
            lambda e: F.struct(
                _sqdist_col(F.col("v"), e["c"]).alias("dist"),
                e["i"].alias("cluster"),
            ),
        )
    )


def _assign_frame(base: DataFrame, cents: list[list[float]], arrow: bool) -> DataFrame:
    """(vec_id, v, cluster, dist) for one assignment pass. ``arrow=False``
    is the oracle-checked JVM form (_assign_col); ``arrow=True`` is the
    numpy replica — a chunked (rows × k × dim) broadcast-subtract per
    Arrow batch instead of k×dim interpreted lambda terms per row. Same
    summation SHAPE as the JVM fold (squares of exact differences, no
    a²-2ab rearrangement → no cancellation), rounded to the same 9 dp;
    numpy's half-even vs Spark's HALF_UP at that boundary needs a sq-dist
    within ~1e-16 of a 1e-9 grid edge AND an argmin tie — negligible, and
    the equality pytest pins bit-identical output through all rounds.
    Measured interleaved on 128k×64d vectors, min-of-3: k=16 JVM 1.10 s
    vs Arrow 0.71 s (1.5×); k=64 JVM 4.35 s vs Arrow 1.81 s (2.4×) — the
    crossover favors Arrow at every k the operator ships with, so the
    shipped queries pass assign_arrow=True; the JVM form remains the
    oracle-twin reference. Row chunks cap the (chunk × k × dim) temporary
    at ~32 MB so large k cannot blow batch memory."""
    if not arrow:
        a = base.withColumn("a", _assign_col(cents))
        return a.select(
            "vec_id",
            "v",
            F.col("a")["cluster"].alias("cluster"),
            F.col("a")["dist"].alias("dist"),
        )
    import numpy as np
    import pandas as pd

    id_type = base.schema["vec_id"].dataType.simpleString()
    C = np.asarray(cents, dtype=np.float64)

    chunk = max(1, 4_000_000 // max(1, C.size))  # ~32 MB f64 temporaries

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            cls, dists = [], []
            for s in range(0, len(V), chunk):
                d2 = np.round(
                    ((V[s : s + chunk, None, :] - C[None, :, :]) ** 2).sum(axis=2),
                    9,
                )
                cl = d2.argmin(axis=1)  # ties -> lowest index, like array_min
                cls.append(cl)
                dists.append(d2[np.arange(len(cl)), cl])
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "cluster": pd.array(np.concatenate(cls), dtype="int32"),
                    "dist": np.concatenate(dists),
                }
            )

    return base.mapInPandas(op, f"vec_id {id_type}, v array<double>, cluster int, dist double")


def kmeans_assign(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_arrow: bool = False,
) -> DataFrame:
    """Distributed Lloyd k-means with deterministic seeding (no RNG):
    seeds = the k lowest-id vectors, every centroid rounded to 6 dp before
    it becomes a broadcast literal, ``iters`` update rounds, then a final
    assignment. Returns (vec_id, v, cluster, dist_r).

    Plan shape per iteration (the standard distributed Lloyd, what MLlib's
    KMeans also does): one row-local assignment pass over the corpus
    (centroids ride into the task as literals — k×dim doubles, never a
    join), then one posexplode + partial-aggregated groupBy(cluster, pos)
    whose exchange carries only partitions×k×dim partial sums — the corpus
    itself never shuffles. The k×dim driver collect per round is the
    centroid update every Lloyd implementation performs; it does not grow
    with the corpus. Empty clusters carry their previous centroid forward.

    Rounding contract: centroid means are round(avg, 6) — the single point
    where double summation order (Spark partition merge vs DuckDB
    sequential) could diverge; 6 dp absorbs the ~1e-15 noise and every
    downstream distance is then computed from bit-identical literals on
    both engines. At 100 TB: assignment cost is k×dim fused-codegen-free
    HOF work per row — ``assign_arrow=True`` swaps the assignment stage to
    the numpy ``mapInPandas`` replica (one batched broadcast-subtract
    matmul instead of k×dim interpreted lambda terms per row), identical
    output pinned by pytest; the JVM form stays the oracle-checked
    default at the sandbox's k (see _assign_frame for the measured
    crossover).
    """
    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # one parquet file = one input split locally: without this the per-row
    # k×dim assignment work runs on a single core, and each Lloyd round
    # would re-scan + re-shuffle; checkpoint once, iterate over cached
    # partitions (a real cluster's scan already has splits — the
    # repartition stays correct there, just redundant)
    base = base.repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    # HASH-SPREAD seeding: the k vectors with the lowest md5(vec_id) — a
    # deterministic uniform sample of the corpus (no RNG, restart-stable,
    # same rows on both engines). Seeding by lowest RAW id is a measured
    # pathology: on id-correlated corpora (sorted dumps, replicated
    # batches) the k lowest ids sit in a few embedding-space locations, a
    # handful of mega-cells capture everything, and the downstream
    # Σ|cell|² verify goes quadratic — the ×64 scale probe hit exactly
    # this (769 s vs 8.5 s/×16 with spread seeds). Hashing the id
    # decorrelates seed choice from id layout; vec_id breaks md5 ties.
    seed_rows = (
        base.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k)
        .collect()
    )  # k rows, tiny
    cents = [[round(float(x), 6) for x in r["v"]] for r in seed_rows]
    if not cents:
        # empty corpus: no seeds exist, and _assign_col([]) would emit an
        # untyped array() literal — return the (empty) frame with the
        # contract schema instead of crashing
        return base.select(
            "vec_id",
            "v",
            F.lit(None).cast("int").alias("cluster"),
            F.lit(None).cast("double").alias("dist_r"),
        )
    for _ in range(iters):
        assigned = _assign_frame(base, cents, assign_arrow)
        means = (
            assigned.select("cluster", "v")
            .select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()  # k×dim rows — constant-size driver fetch
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        cents = [
            [round(by_c[i][p], 6) for p in range(len(cents[i]))]
            if i in by_c
            else cents[i]
            for i in range(len(cents))
        ]
    final = _assign_frame(base, cents, assign_arrow)
    return final.select(
        "vec_id",
        "v",
        "cluster",
        F.round(F.col("dist"), 6).alias("dist_r"),
    )


def _semdedup_cells(assigned: DataFrame, threshold: float) -> DataFrame:
    """Cell-local SemDeDup verify: ONE ``applyInPandas`` over the cluster
    cells replaces the self-join + distinct + spine re-join — this is the
    construction the SemDeDup paper actually describes (a per-cluster
    pairwise matrix), and it never materializes a pair ROW: the join form
    ships two 64-dim arrays per pair through an exchange and evaluates an
    interpreted 64-term HOF dot per pair; here the cell's cosine matrix is
    built by a per-DIMENSION accumulation of rank-1 outer products.

    Bit-exactness: the dimension loop accumulates ``acc += v[:,d]·v[:,d]ᵀ``
    in dimension order, so every (i, j) entry experiences EXACTLY the JVM
    fold's add sequence (init 0.0, += product per dim, left to right) —
    same for the norm folds and the single divide — making the result
    bit-identical to the join form / DuckDB oracle, not merely close
    (pinned by pytest). np.round half-even vs Spark HALF_UP needs a cosine
    within ~1e-16 of the 1e-4 grid midpoint — negligible for fold ratios.
    Row-chunked so the live (chunk × |cell|) slab stays ~32 MB: cell size
    is already bounded by the k ∝ n / target_cell knob, the chunking just
    decouples worker memory from the knob's exact setting.
    Pair order (i < j on vec_id) is realized by sorting the cell on vec_id
    — exact for numeric and ASCII-string ids (pandas vs UTF8-binary
    collation can differ on non-ASCII string ids; map such ids to dense
    longs first, the connected_components guidance).
    """
    import numpy as np
    import pandas as pd

    id_type = assigned.schema["vec_id"].dataType.simpleString()
    thr = float(threshold)

    def cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        n, d = V.shape
        nacc = np.zeros(n)
        for t in range(d):
            nacc += V[:, t] * V[:, t]
        na = np.sqrt(nacc)
        dup = np.zeros(n, dtype=bool)
        chunk = max(1, 4_000_000 // max(1, n))
        idx = np.arange(n)
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            acc = np.zeros((e - s, n))
            for t in range(d):
                acc += V[s:e, t, None] * V[None, :, t]
            denom = na[s:e, None] * na[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.round(acc / denom, 4)
            cos[(na[s:e] == 0)[:, None] | (na == 0)[None, :]] = -1.0
            ge = (cos >= thr) & (idx[s:e, None] < idx[None, :])  # strict i<j
            dup |= ge.any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": pdf["cluster"],
                "dist_r": pdf["dist_r"],
                "sem_dup": dup,
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        cell, f"vec_id {id_type}, cluster int, dist_r double, sem_dup boolean"
    )


def semdedup(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    threshold: float = SEMDEDUP_COS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_arrow: bool = True,
    cell_arrow: bool = True,
) -> DataFrame:
    """SemDeDup: k-means the embeddings, then flag the non-minimum member
    of every within-cluster pair with cosine ≥ threshold. Returns
    (vec_id, cluster, dist_r, sem_dup) for EVERY input vector.

    Scale design: the pairwise stage is Σ|cluster|² work, never
    corpus-quadratic; the knob that keeps it flat as the corpus grows is
    k ∝ n / target_cell (SemDeDup uses ~0.1% of n; 10^9 vectors → k=10^5
    keeps cells at ~10^4 rows). ``cell_arrow=True`` (default) runs the
    verify as ONE cell-local Arrow stage (_semdedup_cells — no pair rows
    ever materialize; measured ×16-corpus probe: 309 s join-form →
    0.9-2.8 s cell-form, BENCH/QUIET_R4.md wave-2 section); ``cell_arrow=False`` keeps the
    equi-join + interpreted-HOF-dot form, bit-identical by construction
    (the cell kernel replays the JVM fold order), as the oracle-twin
    reference. The same fixed hyperplane trick as embedding_neardup_pairs
    could band WITHIN cells for another quadratic cut if cells must exceed
    the knob.
    """
    from .similarity import _dot, _norm

    assigned = kmeans_assign(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        # Arrow assignment is the measured-faster path at every shipped k
        # (_assign_frame numbers); output pinned bit-identical by pytest
        assign_arrow=assign_arrow,
    )
    # the assignment subtree is referenced up to three times below (pair
    # sides + the output base) and its k×dim work is the plan's most
    # expensive projection — materialize it once (same localCheckpoint
    # treatment as connected_components' iterative frames; measured 6.2 s
    # → 3.4 s at sf0.1)
    assigned = assigned.localCheckpoint()
    if cell_arrow:
        return _semdedup_cells(assigned, threshold)
    # norms are projected BELOW the cluster-key exchange the join forces, so
    # each 64-term norm fold runs once per VECTOR; per PAIR only the dot
    # fold remains (the naive cosine_pair_col form re-evaluates both norms
    # per pair — measured 9 s → ~3 s at sf0.1 for this one change)
    x = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"), _norm(F.col("v")).alias("na"),
    )
    y = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"), _norm(F.col("v")).alias("nb"),
    )
    # a zero-norm vector has no direction: cosine is undefined (and ANSI
    # division raises) — sentinel -1.0 keeps it out of every dup set, the
    # same rule the ADVICE-fixed cosine_topk_batch applies (-inf sentinel)
    guarded_cos = F.when(
        (F.col("na") == 0) | (F.col("nb") == 0), F.lit(-1.0)
    ).otherwise(
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
    )
    dups = (
        x.join(y, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", guarded_cos)
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("sem_dup", F.lit(True))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            "dist_r",
            F.coalesce(F.col("sem_dup"), F.lit(False)).alias("sem_dup"),
        )
    )


PROTO_KEEP_FRAC = 0.6


def prune_prototypes(
    emb: DataFrame,
    keep_frac: float = PROTO_KEEP_FRAC,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    keep_hard: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_arrow: bool = True,
) -> DataFrame:
    """Prototypicality-based data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws: beating power law scaling via data pruning"):
    rank every vector by its distance to its k-means centroid and keep the
    ``keep_frac`` fraction per cluster — ``keep_hard=True`` keeps the
    FARTHEST (hardest) examples, the paper's regime for abundant data;
    ``keep_hard=False`` keeps the most prototypical (scarce-data regime).
    Returns (vec_id, cluster, dist_r, prune_rank, keep) for every vector.

    Scale design: everything after ``kmeans_assign`` (whose distributed
    shape is documented there) is ONE window over the cluster id — the
    partition count equals k and per-partition size is the cell size, both
    governed by the same k ∝ n / target_cell knob as semdedup, so no
    single task ever sees more than a cell. Ranking is over the round-6
    dist_r both engines computed from bit-identical centroid literals,
    with vec_id as the deterministic tiebreak; the keep cut
    ceil(keep_frac × |cell|) is a single double multiply of identical
    operands on both engines (exact same IEEE result, no epsilon needed).
    """
    assigned = kmeans_assign(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        # Arrow assignment is the measured-faster path at every shipped k
        # (_assign_frame numbers); output pinned bit-identical by pytest
        assign_arrow=assign_arrow,
    )
    order = (
        [F.col("dist_r").desc(), F.col("vec_id").asc()]
        if keep_hard
        else [F.col("dist_r").asc(), F.col("vec_id").asc()]
    )
    w = Window.partitionBy("cluster").orderBy(*order)
    wc = Window.partitionBy("cluster")
    return (
        assigned.select("vec_id", "cluster", "dist_r")
        .withColumn("prune_rank", F.row_number().over(w))
        .withColumn("n_in_cluster", F.count(F.lit(1)).over(wc))
        .select(
            "vec_id",
            "cluster",
            "dist_r",
            "prune_rank",
            (
                F.col("prune_rank")
                <= F.ceil(F.lit(float(keep_frac)) * F.col("n_in_cluster")).cast("int")
            ).alias("keep"),
        )
    )


def cluster_keep_best(
    members: DataFrame,
    scored: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware canonical selection: for every near-dup cluster keep
    the member with the HIGHEST score (id tiebreak) instead of the lowest
    id — what production dedup actually ships (drop the worse copies, not
    the arbitrarily-later ones). ``members`` = (id_col, cluster_col) from
    ``neardup_clusters``; ``scored`` = (id_col, score_col) for the corpus.

    Scale design: one merge-hinted equi-join on the doc id (the scored
    side is corpus-sized — never statically broadcastable; AQE downgrades
    when small) + one window partitioned by cluster id. Cluster sizes are
    duplicate-chain sizes — bounded by the dedup threshold, not the
    corpus — so no window partition can concentrate load.
    """
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        members.join(scored.hint("merge"), id_col)
        .withColumn("rk", F.row_number().over(w))
        .select(
            id_col,
            cluster_col,
            score_col,
            (F.col("rk") == 1).alias("keep_best"),
        )
    )
