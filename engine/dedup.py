"""Deduplication family over document tables — exact, MinHash+LSH,
SimHash, and n-gram Jaccard verification (the large-scale training-data
operators; SURVEY.md D4/D5 generalized).

Scale shape:
  exact       vectorized content-hash in map_batches (combiner pre-dedup
              per batch) -> groupby(hash).map_groups(first). One shuffle
              on the 16-byte hash, never on the text.
  minhash_lsh shingle->minhash per batch (numpy, vectorized over perms)
              -> explode to (band_id, band_hash, doc_id) rows ->
              groupby(band) -> candidate pairs -> Jaccard verify ->
              connected components (engine.canon) -> cluster ids.
              Only candidate PAIRS (ids + shingle sets of the pair)
              are re-checked; texts never shuffle.
  simhash     64-bit simhash per batch; near-dup = hamming distance <=
              k via 4-way band blocking (exactness: any pair with
              distance<=3 shares one of 4 16-bit bands).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 3) -> set[int]:
    """k-word shingle set, FNV-hashed to 64-bit ints."""
    toks = text.lower().split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    out = set()
    for i in range(max(1, len(toks) - k + 1)):
        s = "\x1f".join(toks[i : i + k])
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out.add(h)
    return out


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep min(id) per distinct text. Returns (id, n_copies) rows."""
    import pyarrow as pa

    from .textstats import Fingerprinter

    fnv = Fingerprinter.fnv64

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame()
        out["h"] = [np.int64(np.uint64(fnv(t))) for t in df[text_col]]
        out[id_col] = df[id_col]
        # map-side combiner: one winner + local count per hash
        g = out.groupby("h", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_copies": (id_col, "size")}
        )
        g["part"] = (g["h"].astype("uint64") % np.uint64(64)).astype("int64")
        return g

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        # one call per PARTITION, vectorized pandas groupby inside —
        # never one Python call per distinct text
        out = g.groupby("h", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_copies": ("n_copies", "sum")}
        )
        return out[[id_col, "n_copies"]]

    return (
        ds.map_batches(hash_batch, batch_format="pandas")
        .groupby("part")
        .map_groups(finalize, batch_format="pandas")
    )


class MinHasher:
    """num_perm universal-hash minhash signatures, banded for LSH.
    Permutation parameters are seeded constants built once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k_shingle: int = 3,
                 seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        # multiply-shift universal hashing in native uint64 wraparound —
        # fully vectorized (no object-dtype big-int mod-prime math)
        self.a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k_shingle

    def signature(self, sh: set[int]) -> np.ndarray:
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * x[None, :] + self.b[:, None]
        return np.min(vals, axis=1)

    def band_hashes(self, sig: np.ndarray) -> list[int]:
        import zlib

        return [
            zlib.crc32(sig[b * self.rows : (b + 1) * self.rows].tobytes())
            for b in range(self.bands)
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """doc batch -> exploded (band, band_hash, doc_id, part) rows;
        part = shuffle bucket (band_hash mod 64) so the candidate
        grouping is a bounded-fan-out shuffle, not per-key groups."""
        bands, hashes, ids = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.signature(_shingles(text, self.k))
            for b, h in enumerate(self.band_hashes(sig)):
                bands.append(b)
                hashes.append(np.int64(h))
                ids.append(doc_id)
        out = pd.DataFrame({"band": bands, "band_hash": hashes, "doc_id": ids})
        out["part"] = out["band_hash"] % 64
        return out


def minhash_candidates(ds, num_perm: int = 64, bands: int = 16,
                       k_shingle: int = 3, concurrency: int = 4):
    """documents -> candidate duplicate pairs (doc_a < doc_b) from LSH
    band collisions (deduped)."""
    banded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "k_shingle": k_shingle},
        batch_format="pandas",
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one call per band_hash PARTITION: pandas-group by the actual
        # (band, band_hash) key inside, emit id chains (not cliques:
        # CC connects them), dedup pairs within the partition
        a, b = [], []
        for _, grp in g.groupby(["band", "band_hash"], sort=True):
            ids = sorted(grp["doc_id"].unique())
            for i in range(len(ids) - 1):
                a.append(ids[i])
                b.append(ids[i + 1])
        out = pd.DataFrame(
            {"doc_a": pd.Series(a, dtype="int64"),
             "doc_b": pd.Series(b, dtype="int64")}
        )
        return out.drop_duplicates()

    # pairs may repeat across bands — downstream verify and CC are
    # idempotent, so no extra dedup shuffle is spent here
    return banded.groupby("part").map_groups(bucket_pairs, batch_format="pandas")


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def verify_pairs(pairs_ds, docs_table, threshold: float = 0.8,
                 k_shingle: int = 3):
    """Verify candidate pairs with true n-gram Jaccard. The doc texts of
    the SMALL candidate set are broadcast (ray.put) — at 100TB scale
    this becomes a bucket join of pairs against the docs table keyed on
    doc_id; the broadcast path is correct while |candidates| << |docs|."""
    import ray

    texts = dict(zip(docs_table["doc_id"].to_pylist(), docs_table["text"].to_pylist()))
    ref = ray.put(texts)

    def verify(df: pd.DataFrame, ref=ref) -> pd.DataFrame:
        t = ray.get(ref)
        sims = [
            jaccard(_shingles(t[a], k_shingle), _shingles(t[b], k_shingle))
            for a, b in zip(df["doc_a"], df["doc_b"])
        ]
        df = df.copy()
        df["jaccard"] = sims
        return df[df["jaccard"] >= threshold]

    return pairs_ds.map_batches(verify, batch_format="pandas")


def minhash_dedup(docs_ds, docs_table, threshold: float = 0.8,
                  num_perm: int = 64, bands: int = 16, k_shingle: int = 3):
    """Full near-dup flow: LSH candidates -> Jaccard verify -> connected
    components -> (doc_id, cluster_id) rows; cluster root = min doc_id."""
    import pyarrow as pa

    from .canon import components_auto

    verified = verify_pairs(
        minhash_candidates(docs_ds, num_perm, bands, k_shingle),
        docs_table, threshold, k_shingle,
    )

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["doc_a"].astype("int64").map("{:020d}".format).astype("string"),
                "dst": df["doc_b"].astype("int64").map("{:020d}".format).astype("string"),
            }
        )

    edges = verified.map_batches(to_edges, batch_format="pandas")
    comp = components_auto(edges)  # handles empty edge sets

    def decode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([int(v) for v in t["node"].to_pylist()], pa.int64()),
                "cluster_id": pa.array([int(v) for v in t["root"].to_pylist()], pa.int64()),
            }
        )

    return comp.map_batches(decode, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash over word unigrams (FNV word hashes, +-1 bit
    votes), with 4x16-bit band keys for hamming<=3 blocking."""

    _BITS = np.arange(64, dtype=np.uint64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .textstats import Fingerprinter

        fnv = Fingerprinter.fnv64
        cache: dict[str, int] = {}
        sims, b0, b1, b2, b3 = [], [], [], [], []
        for text in df["text"]:
            toks = text.lower().split()
            hs = np.fromiter(
                (cache.get(t) or cache.setdefault(t, fnv(t)) for t in toks),
                dtype=np.uint64, count=len(toks),
            )
            # vectorized bit votes: (n_tokens, 64) sign matrix summed
            bits = ((hs[:, None] >> self._BITS[None, :]) & np.uint64(1)).astype(np.int32)
            acc = (2 * bits - 1).sum(axis=0)
            v = int(((acc > 0).astype(np.uint64) << self._BITS).sum())
            sims.append(np.int64(np.uint64(v)))
            b0.append(v & 0xFFFF)
            b1.append((v >> 16) & 0xFFFF)
            b2.append((v >> 32) & 0xFFFF)
            b3.append((v >> 48) & 0xFFFF)
        out = df[["doc_id"]].copy()
        out["simhash"] = sims
        out["band0"], out["band1"], out["band2"], out["band3"] = b0, b1, b2, b3
        return out


def simhash_dataset(ds, concurrency: int = 4):
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=concurrency)
