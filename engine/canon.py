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


def components_auto(edges_ds, small_threshold: int = 100_000,
                    num_partitions: int = 16, max_rounds: int = 16):
    """Scale-aware CC: edge sets below the threshold (vocabulary-sized
    graphs — nil-key canonicalization, verified dup pairs) run the
    driver-side union-find in one pass; larger graphs run the
    distributed label propagation. Returns a Dataset (node, root)
    either way."""
    import ray.data as rd

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= small_threshold:
        pairs = [(r["src"], r["dst"]) for r in edges_ds.iter_rows()]
        roots = local_components(pairs)
        return rd.from_items(
            [{"node": n, "root": r} for n, r in sorted(roots.items())]
        )
    return components(edges_ds, num_partitions, max_rounds)


def components(edges_ds, num_partitions: int = 16, max_rounds: int = 16):
    """Distributed connected components over a Dataset with columns
    (src:string, dst:string). Returns a Dataset (node:string,
    root:string); root = lexicographically-smallest label reachable.

    The per-round neighbor-label propagation is an explicit
    partitioned co-group (engine.joins.bucket_join pattern, inlined
    here with the label min folded into the same groupby) rather than
    Dataset.join — chaining hash-joins trips a Ray 2.49 empty-block
    schema issue, and the co-group form needs one less shuffle per
    round anyway (hash(node) partitions both the edge endpoints and
    the label rows).
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

    def lab_rows(t: pa.Table) -> pa.Table:
        # label rows as pseudo-edges: peer="" marks "this is my label"
        return pa.table(
            {"node": t["node"], "peer": pa.nulls(t.num_rows, pa.string()),
             "label": t["label"]})

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "peer": t["peer"],
             "label": pa.nulls(t.num_rows, pa.string())})

    for _ in range(max_rounds):
        # co-group edges and labels on node: within each group, the
        # group's current label (from the pseudo-edge row) is proposed
        # to every peer; group rows also restate the node's own label.
        both = sym_edges.map_batches(edge_rows, batch_format="pyarrow").union(
            labels.map_batches(lab_rows, batch_format="pyarrow")
        )

        def propose(g: pa.Table) -> pa.Table:
            lab = pc.min(g["label"]).as_py()
            nodes, labs = [g["node"][0].as_py()], [lab]
            for peer in g["peer"].to_pylist():
                if peer is not None:
                    nodes.append(peer)
                    labs.append(lab)
            return pa.table({"node": pa.array(nodes, pa.string()),
                             "label": pa.array(labs, pa.string())})

        new_labels = (
            both.groupby("node")
            .map_groups(propose, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # convergence: total label count + sum of label hashes stable
        def digest(t: pa.Table) -> pa.Table:
            import zlib

            s = sum(zlib.crc32(f"{n}\x1f{l}".encode()) for n, l in
                    zip(t["node"].to_pylist(), t["label"].to_pylist()))
            return pa.table({"d": pa.array([s], pa.int64())})

        old_d = labels.map_batches(digest, batch_format="pyarrow").sum("d")
        new_d = new_labels.map_batches(digest, batch_format="pyarrow").sum("d")
        labels = new_labels
        if old_d == new_d:
            break

    return labels.rename_columns({"label": "root"})
