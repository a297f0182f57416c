"""Distributed canonicalization: connected components / union-find over
an edge list (SURVEY.md G7 — no reference analog; north-rule
"alias canonicalization via a distributed union-find merge").

Two interchangeable implementations:

  local_components(edges)   driver/oracle-side union-find — used by the
                            single-process oracle and wherever the edge
                            set is provably small.
  components(edges_ds)      distributed min-label propagation, no driver
                            materialization: each round is
                              labels' = min-groupby(node) of
                                        (labels ∪ labels joined through
                                         the symmetrized edges)
                            using hash-partitioned Dataset.join keyed on
                            node. Rounds ≈ graph diameter (the linking
                            graphs here are bipartite star-shaped,
                            diameter <= 4; cap max_rounds). Convergence
                            is checked with a scalar changed-count. Hot
                            nodes (head entities) are fine — per-node
                            state is one label and the min() groupby
                            combines map-side.

Also used by MinHash-LSH dedup (engine.dedup) to merge candidate pairs
into duplicate clusters.
"""

from __future__ import annotations


def local_components(edges) -> dict[str, str]:
    """Union-find; returns node -> min-label root for every node that
    appears in an edge."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def components(edges_ds, num_partitions: int = 16, max_rounds: int = 16):
    """Distributed connected components over a Dataset with columns
    (src:string, dst:string). Returns a Dataset (node:string,
    root:string); root = lexicographically-smallest label reachable.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "peer": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                ),
            }
        )

    sym_edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()

    def init_label(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "label": pc.min_element_wise(t["node"], t["peer"])}
        )

    labels = (
        sym_edges.map_batches(init_label, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    for _ in range(max_rounds):
        # push every node's current label to each neighbor, take mins
        prop = (
            sym_edges.join(labels, "inner", num_partitions, on=("node",))
            .select_columns(["peer", "label"])
            .rename_columns({"peer": "node"})
        )
        new_labels = (
            prop.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        changed = (
            new_labels.join(
                labels, "inner", num_partitions, on=("node",), right_suffix="_old"
            )
            .map_batches(
                lambda t: pa.table(
                    {"c": [pc.sum(pc.not_equal(t["label"], t["label_old"])).as_py() or 0]}
                ),
                batch_format="pyarrow",
            )
            .sum("c")
        )
        labels = new_labels
        if not changed:
            break

    return labels.rename_columns({"label": "root"})
