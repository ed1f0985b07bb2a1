"""Distributed connected components — the missing last stage of near-dedup.

LSH/Jaccard stages end at verified PAIRS; a training-data pipeline must then
group pairs into transitive duplicate CLUSTERS and keep one canonical doc per
cluster (the per-pair "drop the larger id" policy under-deletes on chains:
a~b, b~c but not a~c keeps b out but also keeps c, whose canonical a is two
hops away). The reference has no graph stage at all (wprdc-etl upserts rows
independently); this is one of the engine's beyond-reference LLM-pipeline
operators (SURVEY §2 extension table).

Algorithm: iterative hash-min label propagation — every vertex starts with
its own id as label, each round takes the min label over itself and its
neighbors, converging in O(graph diameter) rounds. Spark shape per round:
ONE keyed shuffle (edges ⋈ labels on src, then a min hash-aggregate on dst);
edges are symmetrized once and cached; labels are ``localCheckpoint``-ed
each round so the iterative plan's lineage doesn't grow (classic iterative-
algorithm trap: without truncation round k replans rounds 1..k−1).

100-TB shape: near-dup graphs are unions of near-cliques (every member of a
dup cluster shares bands with most others), so diameter ≈ 2-3 and the loop
runs 3-4 rounds of edge-count-sized shuffles. For adversarial high-diameter
graphs (long chains) the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) halves path lengths
per round (O(log d) rounds) — hash-min is chosen here because dedup graphs
make its round count constant in practice and each round is one shuffle
cheaper. On a real cluster pass ``use_local_checkpoint=False`` +
``spark.sparkContext.setCheckpointDir(...)`` so label state survives
executor loss (localCheckpoint pins to executor storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iters: int = 25,
    use_local_checkpoint: bool = True,
    algorithm: str = "hash_min",
) -> DataFrame:
    """→ one row per vertex appearing in ``pairs``: ``(v, component)`` where
    ``component`` is the MINIMUM vertex id reachable from ``v`` (so each
    component is named by its smallest member — deterministic under any
    partitioning / input order).

    ``algorithm='hash_min'`` (default) converges in O(diameter) rounds of
    one keyed shuffle each — the right choice for dup-cluster graphs
    (near-cliques, diameter 2-3). ``algorithm='star'`` is the
    large-star/small-star alternation (Kiveris et al., SOCC'14): each
    round halves path lengths, so chains/trees converge in O(log d)
    rounds at the price of two keyed shuffles per round — the choice for
    adversarial high-diameter graphs.

    Raises ``ValueError`` if labels haven't converged after ``max_iters``
    rounds (diameter > max_iters — not a dedup-shaped graph).
    """
    if algorithm == "star":
        return _star_components(
            pairs, src, dst, max_iters=max_iters,
            use_local_checkpoint=use_local_checkpoint,
        )
    if algorithm != "hash_min":
        raise ValueError(f"unknown algorithm {algorithm!r} (hash_min | star)")
    e = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = e.persist()
    try:
        labels = (
            e.select(F.col("s").alias("v")).distinct().withColumn("lbl", F.col("v"))
        )
        labels = (
            labels.localCheckpoint(eager=True) if use_local_checkpoint
            else labels.checkpoint(eager=True)
        )
        for _ in range(max_iters):
            prop = (
                e.join(labels.withColumnRenamed("v", "s"), "s")
                .select(F.col("d").alias("v"), "lbl")
            )
            new_labels = (
                labels.union(prop).groupBy("v").agg(F.min("lbl").alias("lbl"))
            )
            new_labels = (
                new_labels.localCheckpoint(eager=True) if use_local_checkpoint
                else new_labels.checkpoint(eager=True)
            )
            # convergence probe: any vertex whose label still moved? limit(1)
            # lets Spark stop at the first witness instead of counting all.
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .where(F.col("n.lbl") != F.col("o.lbl"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select(F.col("v"), F.col("lbl").alias("component"))
        raise ValueError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(graph diameter exceeds max_iters; raise it or use a "
            f"star-contraction algorithm for chain-shaped graphs)"
        )
    finally:
        e.unpersist()


def _ckpt(df: DataFrame, local: bool) -> DataFrame:
    return df.localCheckpoint(eager=True) if local else df.checkpoint(eager=True)


def _star_components(
    pairs: DataFrame, src: str, dst: str, *,
    max_iters: int, use_local_checkpoint: bool,
) -> DataFrame:
    """Large-star/small-star alternation. Each step is groupBy-min + a join
    back on the same key (two keyed shuffles per round); path lengths halve
    per round, so max_iters bounds O(log d), not O(d). Convergence is
    detected on the edge set itself: an order-insensitive (count, xor-ish
    hash sum) checksum — one tiny aggregate per round, no driver-side edge
    materialization."""
    e = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d")).where(
        F.col("s") != F.col("d")
    ).distinct()
    vertices = (
        e.select(F.col("s").alias("v"))
        .union(e.select(F.col("d").alias("v")))
        .distinct()
    )
    vertices = _ckpt(vertices, use_local_checkpoint).persist()

    def large_star(edges: DataFrame) -> DataFrame:
        sym = edges.union(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
        m = sym.groupBy("s").agg(
            F.least(F.min("d"), F.first("s")).alias("_m")
        )
        return (
            sym.join(m, "s")
            .where(F.col("d") > F.col("s"))
            .select(F.col("d").alias("s"), F.col("_m").alias("d"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        o = edges.select(
            F.greatest("s", "d").alias("s"), F.least("s", "d").alias("d")
        ).distinct()
        m = o.groupBy("s").agg(F.min("d").alias("_m"))  # all d < s here
        nbrs = o.join(m, "s").select(F.col("d").alias("v"), F.col("_m"))
        selfs = m.select(F.col("s").alias("v"), F.col("_m"))
        return (
            nbrs.union(selfs)
            .where(F.col("v") != F.col("_m"))
            .select(F.col("v").alias("s"), F.col("_m").alias("d"))
            .distinct()
        )

    def checksum(edges: DataFrame):
        r = edges.agg(
            F.count("*").alias("n"),
            # decimal(38,0) sum: |xxhash64| < 1e19, so 1e19 edges fit —
            # a long sum would overflow under ANSI arithmetic
            F.sum(F.xxhash64("s", "d").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    try:
        e = _ckpt(e, use_local_checkpoint)
        prev = None
        for _ in range(max_iters):
            e = _ckpt(small_star(large_star(e)), use_local_checkpoint)
            cur = checksum(e)
            if cur == prev:
                # converged: edges are (child, root) stars, root = component
                # min; roots/isolated vertices label themselves
                labels = (
                    e.groupBy(F.col("s").alias("v")).agg(F.min("d").alias("_c"))
                )
                return (
                    vertices.join(labels, "v", "left")
                    .select(
                        F.col("v"), F.coalesce(F.col("_c"), F.col("v")).alias("component")
                    )
                )
            prev = cur
        raise ValueError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(star algorithm; raise max_iters)"
        )
    finally:
        vertices.unpersist()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    algorithm: str = "hash_min",
) -> DataFrame:
    """Assign every document its duplicate-cluster id and canonical flag:
    ``(id_col, component, is_canonical)``. Docs in no verified pair are
    their own singleton component. The canonical member is the cluster's
    smallest id — the keep-policy used by large-scale dedup pipelines
    (deterministic, join-free to apply downstream: filter is_canonical).
    """
    cc = connected_components(pairs, src, dst, algorithm=algorithm)
    comp = F.coalesce(F.col("component"), F.col(id_col))
    return (
        docs.join(cc, docs[id_col] == cc["v"], "left")
        .select(
            F.col(id_col),
            comp.alias("component"),
            (comp == F.col(id_col)).alias("is_canonical"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    *,
    damping: float = 0.85,
    n_iter: int = 8,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Weighted PageRank by power iteration — the corpus-curation
    centrality (CommonCrawl/fineweb-style source ranking; here typically
    over the cross-source duplication graph, where a high rank marks
    mirror/content-farm sources whose text mass duplicates others').

    Brin & Page's original formulation: ``r_{t+1}(v) = (1-d) + d *
    Σ_{u→v} r_t(u) · w(u,v)/outw(u)``; dangling nodes leak mass (no
    redistribution), matching the classic definition — on a symmetrized
    (bidirectional) edge list there are no dangling nodes and total mass
    stays exactly ``n`` every iteration.

    Scale shape: the edge list stays distributed (never collected);
    parallel edges fold into weights up front; out-weight normalization is
    one hash agg + one keyed join, cached once; each iteration is ONE
    keyed shuffle (contributions groupBy dst) + a broadcast-sized join
    back to the node set; ranks are ``localCheckpoint``-ed per iteration
    so the iterative plan stays flat (same idiom as
    ``connected_components``). Iterations are fixed-count, which is what
    makes the DuckDB twin (unrolled CTE chain) an exact oracle.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"), w.alias("_w"))
        .groupBy("_u", "_v")
        .agg(F.sum("_w").alias("_w"))
    )
    outw = e.groupBy("_u").agg(F.sum("_w").alias("_outw"))
    e = e.join(outw, "_u").select(
        "_u", "_v", (F.col("_w") / F.col("_outw")).alias("_frac")
    )
    e = _ckpt(e, use_local_checkpoint)
    nodes = (
        e.select(F.col("_u").alias("node"))
        .unionByName(e.select(F.col("_v").alias("node")))
        .distinct()
    )
    nodes = _ckpt(nodes, use_local_checkpoint)
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "_u"), "_u")
            .groupBy("_v")
            .agg(F.sum(F.col("rank") * F.col("_frac")).alias("_in"))
            .withColumnRenamed("_v", "node")
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
        )
        ranks = _ckpt(ranks, use_local_checkpoint)
    return ranks
