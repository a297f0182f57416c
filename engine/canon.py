"""Distributed canonicalization: connected components / union-find over
an edge list (SURVEY.md G7 — no reference analog; north-rule
"alias canonicalization via a distributed union-find merge").

Two interchangeable implementations:

  local_components(edges)   driver/oracle-side union-find — used by the
                            single-process oracle and wherever the edge
                            set is provably small.
  components(edges_ds)      distributed BSP hash-to-min with pointer
                            jumping over raw Ray tasks, no driver
                            materialization: per-bucket edge/label
                            frames pinned in the object store, one task
                            wave per round exchanging only CHANGED
                            labels (delta propagation). O(log diameter)
                            rounds; quiescence-checked termination.
                            Hot nodes (head entities) are fine —
                            per-node state is one label and proposals
                            dedup before shipping.

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
                    num_partitions: int = 16, max_rounds: int = 64):
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


def components(edges_ds, num_partitions: int = 16, max_rounds: int = 64):
    """Distributed connected components over a Dataset with columns
    (src:string, dst:string). Returns a Dataset (node:string,
    root:string); root = lexicographically-smallest label reachable.

    BSP hash-to-min with pointer jumping over raw Ray tasks — the one
    place the engine drops below the Dataset API, and deliberately so:
    an iterative algorithm with O(log diameter) tiny rounds cannot pay
    a full hash-shuffle spin-up per round (measured ~15s/round via
    groupby at single-node test scale vs ~50ms/round here). The
    partitioning assumption is explicit: node v's edges, label row and
    all messages addressed to v live in bucket h(v) % num_partitions;
    per-bucket frames must fit one worker's heap, so size
    num_partitions ~ |E| / target_bucket_rows at real scale.

    Round structure (delta propagation — only CHANGED labels emit):
      inbox: label proposals (node, label) addressed by h(node),
             jump requests (v, l) addressed by h(l)
      new_L = per-node min(L, proposals)
      emit:  edges x changed labels -> proposals to h(peer)
             jump answers (v, label(l)) for queued requests -> h(v)
             jump requests (v, new label) for changed -> h(label)
    Terminates when no label changed AND no messages are in flight;
    hitting max_rounds first logs a warning instead of silently
    returning non-minimal roots."""
    import logging
    import pickle

    import numpy as np
    import pandas as pd
    import ray

    B = int(num_partitions)

    def _bucket_of(s: pd.Series) -> np.ndarray:
        return (pd.util.hash_array(s.astype(str).to_numpy(dtype=object))
                % np.uint64(B)).astype("int64")

    def _shard(df: pd.DataFrame, key: str) -> list:
        """df -> B sub-frames routed by h(df[key]) (None for empty)."""
        out = [None] * B
        if df is None or not len(df):
            return out
        for bk, sub in df.groupby(_bucket_of(df[key]), sort=False):
            out[int(bk)] = sub.reset_index(drop=True)
        return out

    def _cat(frames, cols) -> pd.DataFrame:
        fr = [f for f in frames if f is not None and len(f)]
        if not fr:
            return pd.DataFrame({c: pd.Series([], dtype="object") for c in cols})
        return pd.concat(fr, ignore_index=True)

    @ray.remote
    def split_edges(block) -> tuple:
        df = block.to_pandas() if hasattr(block, "to_pandas") else block
        e = pd.DataFrame(
            {"node": pd.concat([df["src"], df["dst"]], ignore_index=True),
             "peer": pd.concat([df["dst"], df["src"]], ignore_index=True)}
        )
        return tuple(_shard(e, "node"))

    @ray.remote
    def build_bucket(*shards) -> tuple:
        """Concat this bucket's edge shards; emit (E, init_labels)."""
        e = _cat(shards, ["node", "peer"])
        if not len(e):
            lab = pd.DataFrame({"node": pd.Series([], dtype="object"),
                                "label": pd.Series([], dtype="object")})
            return e, lab
        lab = e.groupby("node", as_index=False)["peer"].min()
        lab["label"] = lab[["node", "peer"]].min(axis=1)
        return e, lab[["node", "label"]]

    @ray.remote
    def step(E, L, first_round: bool, *inboxes):
        """One BSP superstep for one bucket; inboxes = B proposal
        shards then B jump-request shards (flattened varargs so Ray
        resolves the refs — refs nested in tuples are NOT resolved).
        Returns (new_L, n_changed, n_emitted, prop_shards...,
        jump_shards...)."""
        props_in, jumps_in = inboxes[:B], inboxes[B:]
        props = _cat(props_in, ["node", "label"])
        if len(props):
            allp = pd.concat([L, props], ignore_index=True)
            newL = allp.groupby("node", as_index=False)["label"].min()
        else:
            newL = L
        if first_round:
            changed = newL
        else:
            cmpd = newL.merge(L, on="node", how="left",
                              suffixes=("", "_old"))
            changed = cmpd.loc[cmpd["label"] != cmpd["label_old"],
                               ["node", "label"]]
        # outgoing proposals: changed labels along edges + jump answers
        out_parts = []
        if len(changed) and len(E):
            prop = E.merge(changed, on="node")[["peer", "label"]]
            prop.columns = ["node", "label"]
            out_parts.append(prop.drop_duplicates())
        jumps = _cat(jumps_in, ["v", "l"])
        if len(jumps):
            ans = jumps.merge(newL, left_on="l", right_on="node")[["v", "label"]]
            ans.columns = ["node", "label"]
            out_parts.append(ans.drop_duplicates())
        out_props = (pd.concat(out_parts, ignore_index=True).drop_duplicates()
                     if out_parts else None)
        # jump requests for changed nodes: ask h(label) for label(label)
        out_jumps = None
        if len(changed):
            out_jumps = pd.DataFrame({"v": changed["node"],
                                      "l": changed["label"]})
        n_emitted = (0 if out_props is None else len(out_props)) + (
            0 if out_jumps is None else len(out_jumps))
        prop_shards = _shard(out_props, "node") if out_props is not None else [None] * B
        jump_shards = _shard(out_jumps, "l") if out_jumps is not None else [None] * B
        return (newL, int(len(changed)), int(n_emitted),
                *prop_shards, *jump_shards)

    # ---- ingest: stream edge blocks into per-bucket frames ----------
    # the driver only ever holds REFS: split tasks emit one ref per
    # (block, bucket), build tasks emit (E, L) refs per bucket
    blocks = edges_ds.to_arrow_refs()
    shard_refs = [split_edges.options(num_returns=B).remote(b) for b in blocks]
    if B == 1:  # num_returns=1 yields a single ref, not a list
        shard_refs = [[r] for r in shard_refs]
    bucket_EL = [
        build_bucket.options(num_returns=2).remote(
            *[sl[i] for sl in shard_refs])
        for i in range(B)
    ]
    E_ref = [el[0] for el in bucket_EL]
    L_ref = [el[1] for el in bucket_EL]

    props_in: list[list] = [[None] for _ in range(B)]
    jumps_in: list[list] = [[None] for _ in range(B)]
    converged = False
    for rnd in range(max_rounds):
        nr = 3 + 2 * B
        outs = [
            step.options(num_returns=nr).remote(
                E_ref[i], L_ref[i], rnd == 0,
                *props_in[i], *jumps_in[i])
            for i in range(B)
        ]
        changed_refs = [o[1] for o in outs]
        emitted_refs = [o[2] for o in outs]
        L_ref = [o[0] for o in outs]
        props_in = [[outs[j][3 + i] for j in range(B)] for i in range(B)]
        jumps_in = [[outs[j][3 + B + i] for j in range(B)] for i in range(B)]
        n_changed = sum(ray.get(changed_refs))
        n_emitted = sum(ray.get(emitted_refs))
        if n_changed == 0 and n_emitted == 0:
            converged = True
            break

    if not converged:
        logging.getLogger(__name__).warning(
            "components(): BSP propagation hit max_rounds=%d without "
            "quiescence — roots may be non-minimal; raise max_rounds",
            max_rounds,
        )

    import ray.data as rd

    out = rd.from_pandas_refs(L_ref)
    return out.map_batches(
        lambda df: df.rename(columns={"label": "root"})
        if len(df) else pd.DataFrame({"node": pd.Series([], dtype="object"),
                                      "root": pd.Series([], dtype="object")}),
        batch_format="pandas",
    )
