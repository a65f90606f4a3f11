"""Connected components over dup-pair edges: near-dup clusters -> canonical ids.

The dedup operators (minhash/simhash/ngram/ppjoin/embedding) emit PAIRS; a
training-data pipeline needs GROUPS — every document labeled with a canonical
cluster id so one representative per cluster survives.  That is connected
components on the pair graph.

Algorithm: iterative min-label propagation, entirely DataFrame-native:

    label(u) <- min(label(u), min over neighbors v of label(v))

repeated until a fixed point.  Each round is one shuffle (symmetrized-edge
join + groupBy-min); rounds needed = graph diameter.  Near-dup clusters are
short chains of mutually similar documents — diameters in the low single
digits even at web scale, so this beats the O(log^2 n) alternating-star
contraction (Kiveris et al., "Connected Components in MapReduce and Beyond")
in practice: star rounds cost 2 shuffles each and rebuild the edge set, while
label rounds ride a shrinking frontier.

Pathological graphs (long chains — diameter >> label rounds) no longer
raise: from the third round on, each round ALSO applies pointer jumping
(the Shiloach-Vishkin shortcut, ``label(u) <- label(label(u))``) — shallow
near-dup graphs converge in the plain rounds and never pay for it — which
at least doubles the
distance a label has traveled per round, so convergence is O(log diameter)
on ANY graph — a 2000-node path converges in ~11 rounds instead of 2000.
Correctness is unchanged: a label is always the id of a node in the same
component (neighbor mins and jumps both stay inside the component), labels
decrease monotonically, and at the fixed point they are constant per
component and equal to its min id.  ``max_iter=50`` is now a loud backstop
that no physical graph reaches (it covers diameters up to ~2^49).

Scale notes:
- Only (node, label) longs ride each shuffle; edges are reused as-is each
  round (cache them — done below).
- Convergence is checked with a count() of changed labels per round: one
  driver-blocking scalar per iteration, same pattern the kNN-join ring loop
  uses (operators/knn.py), NOT a row-data collect.
- ``localCheckpoint`` every ``checkpoint_every`` rounds truncates the plan
  lineage, which otherwise doubles per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


_INTEGRAL_ID_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _check_id_types(df: DataFrame, cols: tuple[str, ...]) -> None:
    """Ids are cast to long internally; a non-numeric id column (common for
    string doc ids) would silently become NULL under default non-ANSI mode
    and collapse every such node into one bogus NULL component.  Raise
    loudly instead and tell the caller how to map ids to longs."""
    types = dict(df.dtypes)
    for c in cols:
        if c not in types:
            raise ValueError(
                f"connected_components: column {c!r} not found; available "
                f"columns: {sorted(types)}"
            )
        if types[c] not in _INTEGRAL_ID_TYPES:
            raise TypeError(
                f"connected_components id column {c!r} has type {types[c]!r}; "
                "only integral ids are supported (a lossy cast would collapse "
                "non-numeric ids into one NULL component). Map string ids to "
                "longs first, e.g. F.xxhash64(col) (collision odds ~n^2/2^64) "
                "or a dense_rank over distinct ids, and apply the SAME "
                "mapping to edges and nodes."
            )


def _driver_union_find(
    e: DataFrame, nodes: DataFrame | None, node_col: str, out_col: str
) -> DataFrame:
    """Bounded small-graph path: union-find over a collected edge list (the
    caller has already counted it against the cap), then one broadcast join
    labeling the universe.  Labels are identical to the iterative loop's
    fixed point: min node id per component."""
    spark = e.sparkSession
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in e.collect():
        u, v = row[0], row[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    label: dict = {}
    for x in parent:
        r = find(x)
        if r not in label or x < label[r]:
            label[r] = x
    mapping = [(x, label[find(x)]) for x in parent]
    mapped = spark.createDataFrame(
        mapping, f"{node_col} long, {out_col} long"
    )
    if nodes is None:
        # every node appears in some edge, so the mapping IS the labeling
        return mapped
    universe = nodes.select(F.col(node_col).cast("long").alias(node_col)).distinct()
    return universe.join(F.broadcast(mapped), node_col, "left").select(
        F.col(node_col),
        F.coalesce(F.col(out_col), F.col(node_col)).alias(out_col),
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "id",
    out_col: str = "component",
    max_iter: int = 50,
    checkpoint_every: int = 5,
    driver_edge_cap: int = 100_000,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges``: undirected pair edges (one direction is enough; symmetrized
    internally).  ``nodes``: optional universe DataFrame (one column
    ``node_col``); nodes absent from any edge become singleton components of
    themselves — exactly what dedup grouping needs (every doc gets a label).

    Small graphs (at most ``driver_edge_cap`` edges after the one
    materializing count below — dedup pair graphs are tiny relative to the
    corpus) take a driver union-find fast path: the iterative loop costs
    several scheduled rounds of joins regardless of size, ~1.5 s/round of
    pure orchestration on an idle graph, while a capped edge list is one
    bounded collect (same pattern as the kNN straggler finisher and the ANN
    sampling collect) plus one broadcast join.  Pass ``driver_edge_cap=0``
    to force the distributed loop.
    """
    _check_id_types(edges, (src, dst))
    if nodes is not None:
        _check_id_types(nodes, (node_col,))
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).persist()
    n_edges = e.count()  # materialize ONCE: read again below, and edge
    # generation (e.g. a PPJoin) is usually the most expensive input here

    if n_edges <= driver_edge_cap:
        out = _driver_union_find(e, nodes, node_col, out_col)
        e.unpersist()
        return out

    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()

    if nodes is not None:
        universe = nodes.select(F.col(node_col).cast("long").alias("u")).distinct()
    else:
        universe = sym.select("u").distinct()
    labels = universe.select("u", F.col("u").alias("label")).persist()
    labels.count()

    for it in range(max_iter):
        # messages: each node receives its neighbors' current labels
        msgs = (
            sym.join(labels.withColumnRenamed("u", "v2"), sym["v"] == F.col("v2"))
            .select(F.col("u"), F.col("label"))
        )
        new_labels = (
            msgs.union(labels)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping (Shiloach-Vishkin shortcut): label <- label(label).
        # One extra (node, label)-longs self-join per round; turns O(diameter)
        # convergence into O(log diameter) on chain-like graphs.  Engaged
        # only from round 3: near-dup graphs (diameter 1-2, the common case)
        # converge in the plain rounds without paying for the join.  left
        # join + coalesce: a label id may be an edge endpoint absent from
        # `labels` for one round on universe-restricted runs.
        jump_base = None
        if it >= 2:
            # persist BEFORE the self-join: Catalyst does not CSE across
            # join sides, so without the pin the msgs-union-groupBy
            # aggregate would run twice per jump round
            jump_base = new_labels.persist()
            new_labels = (
                jump_base.alias("x")
                .join(
                    jump_base.select(
                        F.col("u").alias("__l"), F.col("label").alias("__ll")
                    ).alias("y"),
                    F.col("x.label") == F.col("__l"),
                    "left",
                )
                .select(
                    F.col("x.u").alias("u"),
                    F.least(
                        F.col("x.label"),
                        F.coalesce(F.col("__ll"), F.col("x.label")),
                    ).alias("label"),
                )
            )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "u")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        labels.unpersist()
        if jump_base is not None:
            jump_base.unpersist()  # new_labels is materialized above
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "with pointer jumping this covers diameters up to ~2^"
            f"{max_iter - 1}, so this indicates a bug, not a big graph"
        )

    sym.unpersist()
    e.unpersist()
    return labels.select(F.col("u").alias(node_col), F.col("label").alias(out_col))


def dedup_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep exactly one document per near-dup cluster (the min-id member) —
    the standard dedup 'keep first' policy.  Returns docs filtered to
    representatives, plus the ``component`` label column."""
    cc = connected_components(pairs, nodes=docs.select(id_col), src=src, dst=dst,
                              node_col=id_col)
    joined = docs.join(cc, id_col)
    return joined.where(F.col(id_col) == F.col("component"))
