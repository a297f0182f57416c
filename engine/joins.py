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
                   Skewed hot keys: raise B or pre-salt the key.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def broadcast_join(ds, small: pa.Table | pd.DataFrame, on: list[str] | str,
                   how: str = "inner", columns: list[str] | None = None):
    """ds JOIN small on `on`. `small` is shipped to the object store once
    and read per actor/task, not per batch re-serialized from the driver
    closure (ray.put keeps it out of the task spec)."""
    import ray

    if isinstance(small, pa.Table):
        small = small.to_pandas()
    if columns:
        small = small[columns]
    ref = ray.put(small)

    def merge(batch: pd.DataFrame, ref=ref, on=on, how=how) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how)

    return ds.map_batches(merge, batch_format="pandas")


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

    num_buckets scales from rows_hint — the LARGER side's row count if
    the caller knows it (footer counts / materialized datasets) — via
    shuffle.auto_buckets, so per-bucket merge heap stays bounded by a
    constant at any corpus size (VERDICT r3 #1)."""
    import pickle

    import numpy as np

    from .shuffle import auto_buckets

    num_buckets = num_buckets or auto_buckets(rows_hint)

    on_cols = [on] if isinstance(on, str) else list(on)

    def _key_of(df: pd.DataFrame) -> pd.Series:
        key = df[on_cols[0]].astype("string").fillna("")
        for c in on_cols[1:]:
            key = key + "\x1f" + df[c].astype("string").fillna("")
        return key

    # existence joins consult the right side for KEY MEMBERSHIP only,
    # so only its distinct keys matter: below a threshold they ship
    # once via ray.put and the join is a map-side isin filter — no
    # exchange at all (in a flagship-tuned session each hash exchange
    # costs ~3 s of fixed wall). Above it, the packed bucket join runs.
    if how in ("semi", "anti"):
        import os

        import ray

        from .pathlog import note

        keys_ds = right.map_batches(
            lambda df: pd.DataFrame(
                {"__k": pd.unique(_key_of(df))}) if len(df)
            else pd.DataFrame({"__k": pd.Series([], dtype="string")}),
            batch_format="pandas",
        ).materialize()
        n_keys = keys_ds.count()
        bcast_max = int(os.environ.get("GRAFT_EXIST_BCAST", 2_000_000))
        if n_keys <= bcast_max:
            note("bucket_join", f"broadcast_{how}", n_keys=n_keys)
            kset = frozenset(keys_ds.to_pandas()["__k"])
            kref = ray.put(kset)

            def exist(df: pd.DataFrame, kref=kref) -> pd.DataFrame:
                if df.empty:
                    return df
                mask = _key_of(df).isin(ray.get(kref)).to_numpy()
                return df[mask] if how == "semi" else df[~mask]

            return left.map_batches(exist, batch_format="pandas")
        note("bucket_join", f"bucket_{how}", n_keys=n_keys,
             num_buckets=num_buckets)

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

    l_cols = list(left.schema().names)
    r_cols = list(right.schema().names)
    out_cols = (l_cols if how in ("semi", "anti")
                else l_cols + [c for c in r_cols if c not in l_cols])

    lds = left.map_batches(pack("l"), batch_format="pandas")
    rds = right.map_batches(pack("r"), batch_format="pandas")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        frames = {"l": [], "r": []}
        for side, blob in zip(g["__side"], g["__blob"]):
            frames[side].append(pickle.loads(blob))
        if not frames["l"]:
            if how == "full" and frames["r"]:
                # right-only bucket: full outer keeps these rows with
                # the left-only columns null
                rg = pd.concat(frames["r"], ignore_index=True)
                return rg.reindex(columns=out_cols)
            return pd.DataFrame(columns=out_cols)
        if how == "inner" and not frames["r"]:
            return pd.DataFrame(columns=out_cols)
        lg = pd.concat(frames["l"], ignore_index=True)
        if how in ("semi", "anti"):
            # existence joins: left rows with (semi) / without (anti) a
            # key match on the right — only the right KEY COLUMNS are
            # consulted, no payload widening, duplicates never multiply
            if not frames["r"]:
                return (lg[l_cols] if how == "anti"
                        else pd.DataFrame(columns=l_cols))
            rk = pd.concat(frames["r"], ignore_index=True)[on_cols]
            rk = rk.drop_duplicates()
            m = lg.merge(rk, on=on_cols, how="left", indicator=True)
            keep = m["_merge"] == ("both" if how == "semi" else "left_only")
            return m[keep][l_cols]
        rg = (pd.concat(frames["r"], ignore_index=True)
              if frames["r"] else pd.DataFrame(columns=r_cols))
        return lg.merge(rg, on=on_cols,
                        how="outer" if how == "full" else how)

    from .shuffle import bucket_partitions

    return lds.union(rds).groupby(
        "__bucket", num_partitions=bucket_partitions(num_buckets)
    ).map_groups(merge_bucket, batch_format="pandas")
