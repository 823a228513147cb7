"""Distributed connected components over matched pairs (transitive
clustering) — hash-partitioned min-label propagation with Ray Data groupbys
only (no driver-side union-find, no mutable global state; SURVEY.md §7.1
step 6).

Round structure (2 shuffles per round, O(diameter) rounds — the scorer emits
star edges so real diameters are tiny):

1. ``groupby(node)`` over labels ∪ edge-endpoints: each node's group holds
   its current label and its neighbors; emit the label to itself and to
   every neighbor.
2. ``groupby(node)`` over the messages: new label = lexicographic min;
   ``changed`` flags drive termination (sum over the round's output — a
   count aggregate, no full materialization to the driver).

The deterministic min-label rule (smallest url) makes cluster ids stable
across runs and parallelism levels.
"""

import pandas as pd


def _propagate(group: pd.DataFrame) -> pd.DataFrame:
    """Stage 1 kernel: group = one node's label row(s) + its edge rows."""
    node = group["node"].iloc[0]
    labels = group["label"].dropna()
    label = labels.min() if len(labels) else node
    neighbors = group["neighbor"].dropna().unique()
    nodes = [node]
    nodes.extend(neighbors)
    return pd.DataFrame({"node": nodes, "candidate": [label] * len(nodes)})


def _combine(group: pd.DataFrame) -> pd.DataFrame:
    """Stage 2 kernel: min over candidates; old label is the self-candidate
    carried via the label row (node's own previous label)."""
    node = group["node"].iloc[0]
    new = group["candidate"].min()
    old = group["old"].dropna()
    old = old.iloc[0] if len(old) else None
    return pd.DataFrame(
        {"node": [node], "label": [new], "changed": [1 if new != old else 0]}
    )


def connected_components(pairs, max_rounds: int = 15):
    """``pairs``: Dataset with ``url_a``/``url_b`` → Dataset
    ``(url, cluster_id)`` where cluster_id is the lexicographically smallest
    url in the component.  Only matched nodes appear (unmatched pages are
    implicitly their own singleton cluster — at 10^12 docs the label table
    must stay proportional to the EDGE set, not the corpus)."""
    import pyarrow as pa

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("url_a").to_pylist()
        b = batch.column("url_b").to_pylist()
        return pa.table(
            {
                "node": pa.array(a + b, type=pa.string()),
                "neighbor": pa.array(b + a, type=pa.string()),
            }
        )

    # both-direction edge list; small relative to the corpus → materialize
    # once so per-round re-execution doesn't re-run the whole upstream
    # pipeline (ray_guide.md: materialize only small, reused intermediates)
    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node")
        return pa.table({"node": nodes, "label": nodes})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
        .materialize()
    )

    for _round in range(max_rounds):
        lab = labels.map_batches(
            lambda t: t.append_column("neighbor", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow",
        )
        edg = edges.map_batches(
            lambda t: t.append_column("label", pa.nulls(t.num_rows, pa.string())).select(
                ["node", "label", "neighbor"]
            ),
            batch_format="pyarrow",
        )
        msgs = lab.select_columns(["node", "label", "neighbor"]).union(edg)
        stage1 = msgs.groupby("node").map_groups(_propagate, batch_format="pandas")

        old = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "candidate": t.column("label"),
                    "old": t.column("label"),
                }
            ),
            batch_format="pyarrow",
        )
        s1 = stage1.map_batches(
            lambda t: t.append_column("old", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow",
        )
        merged = old.union(s1).groupby("node").map_groups(_combine, batch_format="pandas")
        merged = merged.materialize()
        changed = merged.sum("changed")
        labels = merged.drop_columns(["changed"]).materialize()
        if not changed:
            break

    return labels.map_batches(
        lambda t: pa.table({"url": t.column("node"), "cluster_id": t.column("label")}),
        batch_format="pyarrow",
    )
