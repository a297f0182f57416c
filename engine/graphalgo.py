"""Distributed graph analytics over the constructed knowledge graph —
PageRank (fixed-iteration power method) as a first-class engine op.

The reference has no graph analytics (its graphs are tiny per-token
lattices, nemo.py:78-97); this is part of the KG generalization the
north rule asks for: once triples are materialized, "which entities
matter" is the first question a user asks of the graph.

Two interchangeable implementations (the engine.canon pattern):

  local_pagerank(edges)      driver-side numpy power iteration (index
                             the nodes once, then K bincount passes) —
                             used below the scale threshold and as the
                             test oracle.
  pagerank(edges_ds)         pinned raw-task BSP: bucket b holds the
                             edges whose SOURCE hashes to b, that
                             bucket's out-degrees, and the rank entries
                             of nodes hashing to b — so rank(src) is
                             always local to the contribution pass.
                             Per iteration only (dst, partial-sum)
                             contribution shards move between buckets,
                             pre-aggregated per (bucket, dst) before
                             shipping; dangling mass is a B-float
                             driver reduce. Fixed K iterations =
                             deterministic output, no convergence
                             messaging needed.

Partitioning assumption (explicit, as with canon.components): node v's
rank row, its out-edges, and all contributions addressed to v live in
bucket h(v) % num_buckets; per-bucket frames must fit one worker's
heap, so at real scale num_buckets ~ |E| / target_bucket_rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def local_pagerank(edges, iters: int = 10, d: float = 0.85) -> dict:
    """Power-iteration PageRank over (src, dst) pairs; dangling mass
    redistributed uniformly. Returns node -> rank (sums to 1)."""
    edges = list(edges)
    nodes = sorted({n for e in edges for n in e})
    if not nodes:
        return {}
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    if edges:
        src = np.fromiter((idx[a] for a, _ in edges), np.int64, len(edges))
        dst = np.fromiter((idx[b] for _, b in edges), np.int64, len(edges))
    else:
        src = dst = np.empty(0, np.int64)
    outdeg = np.bincount(src, minlength=n)
    r = np.full(n, 1.0 / n)
    dangling = outdeg == 0
    for _ in range(iters):
        w = r[src] / outdeg[src]
        contrib = np.bincount(dst, weights=w, minlength=n)
        dm = r[dangling].sum()
        r = (1.0 - d) / n + d * (contrib + dm / n)
    return dict(zip(nodes, r))


def pagerank(edges_ds, iters: int = 10, d: float = 0.85,
             num_buckets: int = 16) -> pd.DataFrame:
    """Distributed PageRank over a Dataset with columns (src:string,
    dst:string); multi-edges should be deduped by the caller. Returns
    a pandas frame (node, rank) — O(nodes) rows; callers wanting a
    Dataset can from_pandas it, but rank vectors are the one artifact
    that is legitimately driver-sized per bucket wave."""
    import ray

    B = int(num_buckets)

    def _bucket_of(s: pd.Series) -> np.ndarray:
        return (pd.util.hash_array(s.astype(str).to_numpy(dtype=object))
                % np.uint64(B)).astype("int64")

    def _shard(df: pd.DataFrame, key: str) -> list:
        out = [None] * B
        if df is None or not len(df):
            return out
        for bk, sub in df.groupby(_bucket_of(df[key]), sort=False):
            out[int(bk)] = sub.reset_index(drop=True)
        return out

    def _cat(frames, cols) -> pd.DataFrame:
        fr = [f for f in frames if f is not None and len(f)]
        if not fr:
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in cols})
        return pd.concat(fr, ignore_index=True)

    @ray.remote
    def split_block(block) -> tuple:
        """One edge block -> B edge shards (by h(src)) + B node shards
        (every endpoint, by h(node)) — flattened 2B returns."""
        df = block.to_pandas() if hasattr(block, "to_pandas") else block
        e = df[["src", "dst"]]
        nodes = pd.DataFrame({"node": pd.unique(
            pd.concat([df["src"], df["dst"]], ignore_index=True))})
        return (*_shard(e, "src"), *_shard(nodes, "node"))

    @ray.remote
    def build_bucket(*shards) -> tuple:
        """(edges_by_src, outdeg_by_src, node_list, n_local_nodes)."""
        e = _cat(shards[:len(shards) // 2], ["src", "dst"])
        nl = _cat(shards[len(shards) // 2:], ["node"])
        nodes = pd.DataFrame({"node": pd.unique(nl["node"])}) \
            .sort_values("node").reset_index(drop=True)
        od = e.groupby("src", as_index=False).size() \
            .rename(columns={"size": "outdeg"})
        return e, od, nodes, int(len(nodes))

    @ray.remote
    def contribute(E, OD, NODES, R) -> tuple:
        """Contribution pass for one bucket: rank(src)/outdeg(src)
        summed per dst BEFORE sharding (map-side combine), plus this
        bucket's dangling-rank partial. Returns (*B shards, dangling)."""
        dang = 0.0
        if len(NODES):
            withdeg = NODES.merge(OD, left_on="node", right_on="src",
                                  how="left")
            dangmask = withdeg["outdeg"].isna().to_numpy()
            dang = float(R[dangmask].sum())
        if not len(E):
            return (*[None] * B, dang)
        rmap = pd.Series(R, index=NODES["node"])
        ew = E.merge(OD, on="src")
        w = (rmap.reindex(ew["src"]).to_numpy()
             / ew["outdeg"].to_numpy(np.float64))
        part = (pd.DataFrame({"dst": ew["dst"], "w": w})
                .groupby("dst", as_index=False)["w"].sum())
        return (*_shard(part, "dst"), dang)

    @ray.remote
    def apply_rank(NODES, n_total: int, dm_total: float, *inboxes):
        """Rank update for one bucket: fixed-order inbox sum (bucket
        index order -> deterministic float result run-to-run)."""
        contrib = np.zeros(len(NODES))
        if len(NODES):
            pos = pd.Series(np.arange(len(NODES)), index=NODES["node"])
            for f in inboxes:
                if f is None or not len(f):
                    continue
                p = pos.reindex(f["dst"]).to_numpy()
                m = ~np.isnan(p)
                np.add.at(contrib, p[m].astype(np.int64),
                          f["w"].to_numpy(np.float64)[m])
        return (1.0 - d) / n_total + d * (contrib + dm_total / n_total)

    blocks = edges_ds.to_arrow_refs()
    nr = 2 * B
    shard_refs = [split_block.options(num_returns=nr).remote(b)
                  for b in blocks]
    bucket_state = [
        build_bucket.options(num_returns=4).remote(
            *[sl[i] for sl in shard_refs],
            *[sl[B + i] for sl in shard_refs])
        for i in range(B)
    ]
    E_ref = [s[0] for s in bucket_state]
    OD_ref = [s[1] for s in bucket_state]
    N_ref = [s[2] for s in bucket_state]
    n_local = ray.get([s[3] for s in bucket_state])
    n_total = int(sum(n_local))
    if n_total == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="object"),
                             "rank": pd.Series([], dtype="float64")})

    R_ref = [ray.put(np.full(k, 1.0 / n_total)) for k in n_local]
    for _ in range(iters):
        outs = [contribute.options(num_returns=B + 1).remote(
            E_ref[i], OD_ref[i], N_ref[i], R_ref[i]) for i in range(B)]
        dm_total = float(sum(ray.get([o[B] for o in outs])))
        inboxes = [[outs[j][i] for j in range(B)] for i in range(B)]
        R_ref = [apply_rank.remote(N_ref[i], n_total, dm_total,
                                   *inboxes[i]) for i in range(B)]

    frames = []
    for nodes, r in zip(ray.get(N_ref), ray.get(R_ref)):
        if len(nodes):
            frames.append(pd.DataFrame({"node": nodes["node"], "rank": r}))
    out = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame({"node": pd.Series([], dtype="object"),
                      "rank": pd.Series([], dtype="float64")})
    return out.sort_values("node").reset_index(drop=True)


def pagerank_auto(edges_ds, iters: int = 10, d: float = 0.85,
                  small_threshold: int = 100_000,
                  num_buckets: int = 16) -> pd.DataFrame:
    """Scale-aware PageRank: edge sets below the threshold run the
    driver-side numpy iteration; larger graphs run the bucketed BSP.
    Path choice is pathlog'd (no silent caps)."""
    from .pathlog import note

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges <= small_threshold:
        note("pagerank", "driver_local", n_edges=n_edges)
        pairs = [(r["src"], r["dst"]) for r in edges_ds.iter_rows()]
        ranks = local_pagerank(pairs, iters=iters, d=d)
        out = pd.DataFrame({"node": list(ranks), "rank": list(ranks.values())})
        return out.sort_values("node").reset_index(drop=True)
    note("pagerank", "distributed_bsp", n_edges=n_edges,
         num_buckets=num_buckets)
    return pagerank(edges_ds, iters=iters, d=d, num_buckets=num_buckets)
