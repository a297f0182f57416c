"""Similarity search over an embedding column (list<float>).

  knn_bruteforce   baseline: per batch, numpy matmul of the batch's
                   embedding matrix against a BROADCAST query matrix
                   (ray.put once, read in each task), emit per-batch
                   local top-k, then one tiny global top-k reduce. The
                   dataset streams; only k rows per batch shuffle.
  knn_lsh          scale path: random-hyperplane LSH bucket per vector
                   (signed projections -> bucket key); queries probe
                   only matching buckets (multi-probe on the query's
                   nearby buckets). Recall<1 by construction; the
                   bucket distribution is the documented partitioning
                   assumption.
  cosine_pairs     all-pairs near-duplicate detection by cosine >=
                   threshold: broadcast the (n, d) normalized matrix
                   once (ray.put), each batch computes its row-block of
                   the similarity matrix — distributed O(n^2) compute
                   with O(n*d) broadcast. Feasibility bound: the op is
                   only runnable where n^2 compute fits the cluster, so
                   the n*d broadcast is never the binding constraint;
                   at corpus scale use the bucketed paths (knn_lsh /
                   knn_ivf / minhash) instead.
  kmeans           distributed spherical Lloyd iterations: assignment +
                   per-centroid partial sums inside map_batches (one
                   packed row per (batch, centroid)), tiny k*d driver
                   reduce per iteration.
  knn_ivf          IVF ANN: kmeans coarse quantizer -> per-vector list
                   assignment in map_batches -> queries probe their
                   nprobe nearest lists (pc.is_in pushdown filter) ->
                   local top-k within probed lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(col, dtype=np.float32) -> np.ndarray:
    """list<float> arrow column -> (n, d) matrix, zero-copy-ish."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    n = len(arr)
    return flat.reshape(n, -1)


def _final_topk(ds, k: int) -> pd.DataFrame:
    """Streaming driver-side final top-k merge: each upstream batch
    already holds at most n_queries*k candidate rows, so the driver
    keeps a bounded frontier while the dataset streams — no shuffle for
    a reduction whose result is tiny by construction."""
    frontier = None
    for b in ds.iter_batches(batch_size=65536, batch_format="pandas"):
        frontier = b if frontier is None else pd.concat([frontier, b])
        frontier = (
            frontier.sort_values(["query_idx", "score", "vec_id"],
                                 ascending=[True, False, True])
            .groupby("query_idx", as_index=False)
            .head(k)
        )
    if frontier is None:
        frontier = pd.DataFrame({"query_idx": pd.Series([], dtype="int32"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
    return frontier.reset_index(drop=True)


def _norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_bruteforce(emb_ds, query_vecs: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   dtype=np.float32):
    """Top-k cosine neighbors for each query row. Returns a Dataset
    (query_idx, vec_id, score) of exactly n_queries*k rows (global
    reduce done in one small aggregation)."""
    import ray

    q = _norm(np.asarray(query_vecs, dtype=dtype))
    qref = ray.put(q)

    def local_topk(t: pa.Table, qref=qref, k=k, dtype=dtype) -> pa.Table:
        qm = ray.get(qref)
        m = _norm(_matrix(t[emb_col], dtype))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        scores = qm @ m.T  # (nq, nb)
        kk = min(k, m.shape[0])
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows = {"query_idx": [], "vec_id": [], "score": []}
        for qi in range(qm.shape[0]):
            for j in top[qi]:
                rows["query_idx"].append(qi)
                rows["vec_id"].append(int(ids[j]))
                rows["score"].append(float(scores[qi, j]))
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], pa.int32()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )

    return _final_topk(emb_ds.map_batches(local_topk, batch_format="pyarrow"), k)


class LshIndexer:
    """Random-hyperplane signatures: bucket = sign bits of H projections.
    The hyperplanes are seeded constants rebuilt identically in every
    actor (no state shipping)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim)).astype(np.float32)

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes.T) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _norm(_matrix(t["embedding"]))
        return t.append_column("bucket", pa.array(self.bucket_of(m), pa.int64()))


def knn_lsh(emb_ds, query_vecs: np.ndarray, dim: int, k: int = 10,
            n_planes: int = 8, probes: int = 2, concurrency: int = 4):
    """Bucketed ANN: index side adds LSH bucket; query probes its own
    bucket plus single-bit-flip neighbors (multi-probe)."""
    import ray

    q = _norm(np.asarray(query_vecs, dtype=np.float32))
    idx = LshIndexer(dim, n_planes)
    qb = idx.bucket_of(q)
    probe_sets = []
    for b in qb:
        s = {int(b)}
        if probes > 1:
            s |= {int(b) ^ (1 << p) for p in range(n_planes)}
        probe_sets.append(s)
    wanted = set().union(*probe_sets) if probe_sets else set()
    # probe sets as sorted int64 arrays: the per-batch membership test
    # is a vectorized np.isin, not a per-row Python set lookup
    probe_arrays = [np.fromiter(sorted(s), np.int64, len(s)) for s in probe_sets]
    qref = ray.put((q, probe_arrays))

    import pyarrow.compute as pc

    wanted_arr = pa.array(sorted(wanted), pa.int64())
    bucketed = emb_ds.map_batches(
        LshIndexer, fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow", concurrency=concurrency,
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=wanted_arr)),
        batch_format="pyarrow",
    )

    def local_topk(t: pa.Table, qref=qref, k=k) -> pa.Table:
        qm, psets = ray.get(qref)
        m = _norm(_matrix(t["embedding"]))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        bks = t["bucket"].to_numpy(zero_copy_only=False)
        scores = qm @ m.T
        rows = {"query_idx": [], "vec_id": [], "score": []}
        for qi in range(qm.shape[0]):
            mask = np.isin(bks, psets[qi])
            if not mask.any():
                continue
            sc = scores[qi][mask]
            cand_ids = ids[mask]
            kk = min(k, len(sc))
            top = np.argpartition(-sc, kk - 1)[:kk]
            for j in top:
                rows["query_idx"].append(qi)
                rows["vec_id"].append(int(cand_ids[j]))
                rows["score"].append(float(sc[j]))
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], pa.int32()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )

    return _final_topk(bucketed.map_batches(local_topk, batch_format="pyarrow"), k)


def cosine_pairs(emb_ds, threshold: float,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
    """All (a, b) id pairs with cosine(a, b) >= threshold and a < b.
    Returns a Dataset of (vec_a, vec_b, score). The gather of the
    (n, d) float matrix streams through iter_batches (ids + vectors
    only — never any payload column) and is broadcast once; each batch
    then scores its own row-block against it, so the O(n^2) work is
    distributed and only matching pairs ever shuffle."""
    import ray

    ids_parts, mat_parts = [], []
    for t in emb_ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        ids_parts.append(t[id_col].to_numpy(zero_copy_only=False))
        mat_parts.append(_matrix(t[emb_col], np.float64))
    ids = np.concatenate(ids_parts)
    mn = _norm(np.vstack(mat_parts))
    order = np.argsort(ids)
    ref = ray.put((ids[order], mn[order]))

    def block(t: pa.Table, ref=ref, thr=threshold) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        bm = _norm(_matrix(t[emb_col], np.float64))
        bids = t[id_col].to_numpy(zero_copy_only=False)
        sims = bm @ all_m.T  # (batch, n)
        rows, cols = np.nonzero(sims >= thr)
        keep = bids[rows] < all_ids[cols]
        rows, cols = rows[keep], cols[keep]
        return pa.table(
            {
                "vec_a": pa.array(bids[rows], pa.int64()),
                "vec_b": pa.array(all_ids[cols], pa.int64()),
                "score": pa.array(sims[rows, cols], pa.float64()),
            }
        )

    return emb_ds.map_batches(block, batch_format="pyarrow")


def kmeans(emb_ds, n_centroids: int, dim: int, iters: int = 5,
           emb_col: str = "embedding", seed: int = 42) -> np.ndarray:
    """Distributed spherical k-means (cosine Lloyd). Per iteration the
    dataset streams once: each batch assigns its rows to the nearest
    current centroid and emits ONE packed partial row per non-empty
    centroid (sum vector + count); the driver reduce touches only
    k*d floats. Deterministic: seeded init, argmax tie-break by index."""
    import ray

    rng = np.random.default_rng(seed)
    cents = _norm(rng.standard_normal((n_centroids, dim)).astype(np.float64))

    for _ in range(iters):
        cref = ray.put(cents)

        def partials(t: pa.Table, cref=cref) -> pa.Table:
            c = ray.get(cref)
            m = _matrix(t[emb_col], np.float64)
            assign = np.argmax(_norm(m) @ c.T, axis=1)
            uniq = np.unique(assign)
            sums = np.zeros((len(uniq), m.shape[1]))
            cnts = np.zeros(len(uniq), np.int64)
            for j, u in enumerate(uniq):
                mask = assign == u
                sums[j] = m[mask].sum(axis=0)
                cnts[j] = int(mask.sum())
            return pa.table(
                {
                    "cid": pa.array(uniq.astype(np.int64), pa.int64()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "cnt": pa.array(cnts, pa.int64()),
                }
            )

        acc = np.zeros_like(cents)
        n = np.zeros(n_centroids, np.int64)
        for t in emb_ds.map_batches(partials, batch_format="pyarrow").iter_batches(
            batch_size=4096, batch_format="pyarrow"
        ):
            cid = t["cid"].to_numpy(zero_copy_only=False)
            vs = _matrix(t["vsum"], np.float64)
            np.add.at(acc, cid, vs)
            np.add.at(n, cid, t["cnt"].to_numpy(zero_copy_only=False))
        live = n > 0
        cents[live] = _norm(acc[live] / n[live, None])
        # dead centroids keep their previous position (stay seeded)
    return cents


class IvfAssigner:
    """Adds the IVF list id (nearest centroid) per vector. Centroids
    arrive via an object-store ref — fetched once per actor."""

    def __init__(self, cents_ref) -> None:
        import ray

        self.cents = ray.get(cents_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _norm(_matrix(t["embedding"], np.float64))
        assign = np.argmax(m @ self.cents.T, axis=1).astype(np.int64)
        return t.append_column("ivf_list", pa.array(assign, pa.int64()))


def knn_ivf(emb_ds, query_vecs: np.ndarray, dim: int, k: int = 10,
            n_centroids: int = 16, nprobe: int = 4, kmeans_iters: int = 5,
            concurrency: int = 4):
    """IVF ANN: coarse-quantize with distributed kmeans, assign each
    vector to its list, probe each query's nprobe nearest lists only
    (pc.is_in pushdown — non-probed lists never reach the scorer).
    Recall < 1 by construction; partitioning assumption: list sizes are
    balanced by the quantizer (re-train or split hot lists if skewed)."""
    import pyarrow.compute as pc
    import ray

    cents = kmeans(emb_ds, n_centroids, dim, iters=kmeans_iters)
    q = _norm(np.asarray(query_vecs, dtype=np.float64))
    qsims = q @ cents.T
    nprobe = min(nprobe, n_centroids)
    probe_lists = np.argsort(-qsims, axis=1)[:, :nprobe].astype(np.int64)
    wanted = np.unique(probe_lists)
    cref = ray.put(cents)
    qref = ray.put((q, [probe_lists[i] for i in range(len(q))]))
    wanted_arr = pa.array(wanted, pa.int64())

    listed = emb_ds.map_batches(
        IvfAssigner, fn_constructor_kwargs={"cents_ref": cref},
        batch_format="pyarrow", concurrency=concurrency,
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_list"], value_set=wanted_arr)),
        batch_format="pyarrow",
    )

    def local_topk(t: pa.Table, qref=qref, k=k) -> pa.Table:
        qm, plists = ray.get(qref)
        m = _norm(_matrix(t["embedding"], np.float64))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        lists = t["ivf_list"].to_numpy(zero_copy_only=False)
        scores = qm @ m.T
        rows = {"query_idx": [], "vec_id": [], "score": []}
        for qi in range(qm.shape[0]):
            mask = np.isin(lists, plists[qi])
            if not mask.any():
                continue
            sc = scores[qi][mask]
            cand_ids = ids[mask]
            kk = min(k, len(sc))
            top = np.argpartition(-sc, kk - 1)[:kk]
            rows["query_idx"].extend([qi] * kk)
            rows["vec_id"].extend(int(cand_ids[j]) for j in top)
            rows["score"].extend(float(sc[j]) for j in top)
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], pa.int32()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )

    return _final_topk(listed.map_batches(local_topk, batch_format="pyarrow"), k)
