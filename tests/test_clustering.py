"""Connected-components / near-dup cluster resolution tests.

Covers the large-star/small-star iteration (clustering.py): transitive
chains, multi-component graphs, the shared-leaf convergence hazard, and
determinism under input permutation.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from text_extract_api_spark.functions.clustering import (
    connected_components,
    neardup_clusters,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _cc_map(spark, edges, **kw):
    rows = connected_components(_pairs(spark, edges), **kw).collect()
    got = {}
    for r in rows:
        # a node must resolve to exactly one cluster
        assert r.id not in got, f"node {r.id} assigned twice"
        got[r.id] = r.cluster_id
    return got


def test_chain_resolves_transitively(spark):
    # A~B, B~C, C~D ... — no direct A~D edge, one cluster anyway.
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _cc_map(spark, edges)
    assert got == {i: 0 for i in range(n)}


def test_two_components_and_unordered_pairs(spark):
    edges = [(5, 3), (3, 9), (20, 17), (17, 21)]
    got = _cc_map(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 17: 17, 20: 17, 21: 17}


def test_shared_leaf_two_stars_merges(spark):
    # 10 is a leaf of both star(1) and star(2): the chain-free probe alone
    # would accept the two-star state; the unique-parent probe forces the
    # merge (1 and 2 are connected THROUGH 10).
    edges = [(10, 1), (11, 1), (10, 2), (12, 2)]
    got = _cc_map(spark, edges)
    assert got == {1: 1, 2: 1, 10: 1, 11: 1, 12: 1}


def test_determinism_under_permutation(spark):
    import random

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 30)] + [(rng.randrange(100, 140), 100 + i) for i in range(20)]
    a = _cc_map(spark, edges)
    shuffled = list(edges)
    rng.shuffle(shuffled)
    flipped = [(b, a2) if i % 2 else (a2, b) for i, (a2, b) in enumerate(shuffled)]
    b = _cc_map(spark, flipped)
    assert a == b


def test_self_loops_dropped(spark):
    got = _cc_map(spark, [(4, 4), (4, 7)])
    assert got == {4: 4, 7: 4}


def test_string_doc_ids_preserved(spark):
    # UUID-like / prefixed string ids must survive: the old long-cast
    # NULLed them and silently dropped every edge. cluster_id is the
    # LEXICOGRAPHIC minimum for strings, and the output dtype stays string.
    pairs = spark.createDataFrame(
        [
            ("doc-b", "doc-a"),
            ("doc-c", "doc-b"),
            ("7f9e-2", "7f9e-10"),  # lexicographic: "7f9e-10" < "7f9e-2"
        ],
        "id_a string, id_b string",
    )
    out = connected_components(pairs)
    assert dict(out.dtypes) == {"id": "string", "cluster_id": "string"}
    got = {r.id: r.cluster_id for r in out.collect()}
    assert got == {
        "doc-a": "doc-a",
        "doc-b": "doc-a",
        "doc-c": "doc-a",
        "7f9e-10": "7f9e-10",
        "7f9e-2": "7f9e-10",
    }


def test_digit_string_ids_stay_strings(spark):
    # digit-only string ids: min must be lexicographic ("10" < "9"), not
    # numeric — output type is the caller's, never silently bigint.
    pairs = spark.createDataFrame([("9", "10")], "id_a string, id_b string")
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {"9": "10", "10": "10"}


def test_neardup_clusters_canonical_flags(spark):
    out = neardup_clusters(_pairs(spark, [(2, 1), (3, 2), (8, 9)])).collect()
    got = {r.doc_id: (r.cluster_id, r.is_canonical) for r in out}
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        8: (8, True),
        9: (8, False),
    }
    # "drop the dups" contract: anti-join corpus against non-canonical rows
    keep = {d for d, (_, canon) in got.items() if canon}
    assert keep == {1, 8}


# --- k-means / SemDeDup ------------------------------------------------------


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_separates_two_obvious_blobs(spark):
    from text_extract_api_spark.functions.clustering import kmeans_assign

    blob_a = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [0.1, 0.1]]
    blob_b = [[5.0, 5.0], [5.1, 5.0], [5.0, 5.1], [5.1, 5.1]]
    # hash-spread seeding may start both seeds in one blob; a few Lloyd
    # rounds must still pull the centroids apart on well-separated blobs
    out = kmeans_assign(_emb_df(spark, blob_a + blob_b), k=2, iters=4).collect()
    by_id = {r.vec_id: r.cluster for r in out}
    assert len({by_id[i] for i in range(4)}) == 1
    assert len({by_id[i] for i in range(4, 8)}) == 1
    assert by_id[0] != by_id[4]


def test_kmeans_deterministic_across_runs_and_partitionings(spark):
    from text_extract_api_spark.functions.clustering import kmeans_assign

    vecs = [[(i * 37 % 11) / 10.0, (i * 53 % 13) / 10.0, (i * 71 % 7) / 10.0]
            for i in range(40)]
    a = {r.vec_id: (r.cluster, r.dist_r)
         for r in kmeans_assign(_emb_df(spark, vecs), k=4, iters=2).collect()}
    b = {r.vec_id: (r.cluster, r.dist_r)
         for r in kmeans_assign(
             _emb_df(spark, vecs).repartition(7), k=4, iters=2).collect()}
    assert a == b


def test_kmeans_empty_cluster_carries_seed_forward(spark):
    from text_extract_api_spark.functions.clustering import kmeans_assign

    # hash-spread seeds for ids 0..4 are vecs 4 and 1 (md5-id order);
    # making those two vectors IDENTICAL forces every assignment to tie —
    # ties go to the lower centroid index, so cluster 1 is empty from
    # round 1 and must carry its seed forward (no crash, no NULL centroid)
    vecs = [[0.01, 0.0], [0.0, 0.0], [0.02, 0.0], [0.03, 0.0], [0.0, 0.0]]
    out = {r.vec_id: r for r in kmeans_assign(_emb_df(spark, vecs), k=2, iters=2).collect()}
    assert all(r.cluster in (0, 1) and r.dist_r is not None for r in out.values())
    # round 2 proves the carry: the duplicate vectors sit at distance 0
    # from the CARRIED seed [0,0] (cluster 1's mean never updated) and are
    # won back from cluster 0's drifted mean — NULL centroids would crash
    assert out[1].cluster == 1 and out[1].dist_r == 0.0
    assert out[4].cluster == 1 and out[4].dist_r == 0.0


def test_semdedup_flags_within_cluster_near_dups_only(spark):
    from text_extract_api_spark.functions.clustering import semdedup

    # vecs 0/1 nearly parallel (cos ~1) in blob A; vec 2 orthogonal-ish in
    # A's cell would NOT be flagged; blob B far away with its own near-pair
    vecs = [
        [1.0, 0.0, 0.0],
        [0.999, 0.01, 0.0],   # near-dup of 0 -> flagged (higher id)
        [0.0, 1.0, 0.0],      # same cell maybe, but cos(0,2)=0 -> not flagged
        [50.0, 50.0, 50.0],
        [50.0, 50.0, 50.1],   # near-dup of 3 -> flagged
    ]
    out = {r.vec_id: r.sem_dup
           for r in semdedup(_emb_df(spark, vecs), k=2, iters=1,
                             threshold=0.95).collect()}
    assert out[0] is False          # cluster minimum survives
    assert out[1] is True
    assert out[2] is False
    assert out[3] is False
    assert out[4] is True


def test_semdedup_emits_every_input_vector(spark):
    from text_extract_api_spark.functions.clustering import semdedup

    vecs = [[float(i), float(i % 3)] for i in range(17)]
    out = semdedup(_emb_df(spark, vecs), k=3, iters=2, threshold=2.0)
    assert out.count() == 17  # threshold 2.0 -> no flags, but all rows present
    assert out.filter("sem_dup").count() == 0


# --- prototypicality pruning -------------------------------------------------


def test_prune_prototypes_keeps_hardest_per_cluster(spark):
    from text_extract_api_spark.functions.clustering import prune_prototypes

    # two tight blobs + one far outlier per blob: hard mode must keep the
    # outliers and cut the most prototypical members
    blob_a = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [0.1, 0.1], [3.0, 0.0]]
    blob_b = [[9.0, 9.0], [9.1, 9.0], [9.0, 9.1], [9.1, 9.1], [9.0, 6.0]]
    out = prune_prototypes(
        _emb_df(spark, blob_a + blob_b), keep_frac=0.4, k=2, iters=2
    ).collect()
    assert len(out) == 10  # every vector emitted
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    import math

    for rows in by_cluster.values():
        kept = [r for r in rows if r.keep]
        assert len(kept) == math.ceil(0.4 * len(rows))
        # kept = the rows with the LARGEST dist_r (rank 1 = farthest)
        assert max(r.dist_r for r in rows) == max(r.dist_r for r in kept)
        assert all(r.prune_rank <= len(kept) for r in kept)
    # the planted outliers (ids 4 and 9) must survive
    keep_ids = {r.vec_id for r in out if r.keep}
    assert {4, 9} <= keep_ids


def test_prune_prototypes_soft_mode_keeps_nearest(spark):
    from text_extract_api_spark.functions.clustering import prune_prototypes

    vecs = [[0.0, 0.0], [0.1, 0.0], [5.0, 0.0]]
    out = {r.vec_id: r for r in prune_prototypes(
        _emb_df(spark, vecs), keep_frac=0.34, k=1, iters=1, keep_hard=False
    ).collect()}
    kept = [v for v, r in out.items() if r.keep]
    # ceil(0.34*3) = 2 nearest-to-centroid survive; the far point is cut
    assert len(kept) == 2 and 2 not in kept


def test_cluster_keep_best_prefers_quality_over_min_id(spark):
    from text_extract_api_spark.functions.clustering import cluster_keep_best

    members = spark.createDataFrame(
        [(1, 1), (5, 1), (9, 1), (20, 20), (21, 20)],
        "doc_id long, cluster_id long",
    )
    scored = spark.createDataFrame(
        [(1, 0.2), (5, 0.9), (9, 0.9), (20, 0.5), (21, 0.5), (99, 1.0)],
        "doc_id long, quality double",
    )
    out = {r.doc_id: r for r in cluster_keep_best(members, scored).collect()}
    assert len(out) == 5  # members only; unclustered 99 not emitted
    # cluster 1: quality argmax is a TIE between 5 and 9 -> lowest id wins
    assert [out[i].keep_best for i in (1, 5, 9)] == [False, True, False]
    # cluster 20: tie -> id 20 wins (min-id fallback on equal quality)
    assert [out[i].keep_best for i in (20, 21)] == [True, False]


def test_kmeans_arrow_assignment_matches_jvm(spark):
    """assign_arrow=True (numpy matmul assignment, the large-k scale mode)
    must reproduce the oracle-checked JVM path exactly: same clusters,
    same round-6 distances, through ALL Lloyd rounds (a single divergent
    assignment would cascade into different centroids)."""
    from text_extract_api_spark.functions.clustering import kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    jvm = {r.vec_id: (r.cluster, r.dist_r)
           for r in kmeans_assign(emb, k=8, iters=2).collect()}
    arr = {r.vec_id: (r.cluster, r.dist_r)
           for r in kmeans_assign(emb, k=8, iters=2, assign_arrow=True).collect()}
    assert jvm == arr


def test_kmeans_fewer_vectors_than_k(spark):
    # n < k: only n seeds exist; every vector must still be assigned,
    # in both assignment paths
    from text_extract_api_spark.functions.clustering import kmeans_assign

    vecs = [[1.0, 0.0], [0.0, 1.0], [5.0, 5.0]]
    for arrow in (False, True):
        out = kmeans_assign(
            _emb_df(spark, vecs), k=8, iters=2, assign_arrow=arrow
        ).collect()
        assert len(out) == 3
        assert all(r.cluster is not None and r.dist_r is not None for r in out)
        # 3 distinct seeds = 3 singleton clusters, each at distance 0
        assert sorted(r.cluster for r in out) == [0, 1, 2]
        assert all(r.dist_r == 0.0 for r in out)


def test_semdedup_cell_arrow_matches_join_form(spark):
    """The cell-local Arrow verify must reproduce the join + HOF-dot form
    exactly (same fold order by construction) — on the real sf0.01
    embedding table and on a handcrafted corpus with a zero-norm vector."""
    from text_extract_api_spark.functions.clustering import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = {r.vec_id: (r.cluster, r.dist_r, r.sem_dup)
         for r in semdedup(emb, cell_arrow=True).collect()}
    b = {r.vec_id: (r.cluster, r.dist_r, r.sem_dup)
         for r in semdedup(emb, cell_arrow=False).collect()}
    assert a == b

    vecs = [
        [1.0, 0.0, 0.0],
        [0.999, 0.01, 0.0],
        [0.0, 0.0, 0.0],   # zero norm: never a dup of anything
        [50.0, 50.0, 50.0],
        [50.0, 50.0, 50.1],
    ]
    df = _emb_df(spark, vecs)
    for flag in (True, False):
        out = {r.vec_id: r.sem_dup
               for r in semdedup(df, k=2, iters=1, threshold=0.95,
                                 cell_arrow=flag).collect()}
        assert out == {0: False, 1: True, 2: False, 3: False, 4: True}, flag
