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
