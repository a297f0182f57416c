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


def bucket_join(left, right, on: list[str] | str, num_buckets: int = 32,
                how: str = "inner"):
    """Explicit partitioned hash join: bucket both sides on the key
    hash, tag provenance, union, groupby bucket, merge within group."""
    on_cols = [on] if isinstance(on, str) else list(on)

    def add_bucket(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            key = df[on_cols[0]].astype("string").fillna("")
            for c in on_cols[1:]:
                key = key + "\x1f" + df[c].astype("string").fillna("")
            df = df.copy()
            df["__bucket"] = pd.util.hash_array(key.to_numpy(dtype=object)) % num_buckets
            df["__side"] = side
            return df

        return fn

    l_cols = list(left.schema().names)
    r_cols = list(right.schema().names)

    def pad(cols_missing):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            for c in cols_missing:
                df[c] = None
            return df

        return fn

    all_cols = l_cols + [c for c in r_cols if c not in l_cols]
    lds = left.map_batches(add_bucket("l"), batch_format="pandas").map_batches(
        pad([c for c in all_cols if c not in l_cols]), batch_format="pandas"
    )
    rds = right.map_batches(add_bucket("r"), batch_format="pandas").map_batches(
        pad([c for c in all_cols if c not in r_cols]), batch_format="pandas"
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == "l", l_cols]
        rg = g.loc[g["__side"] == "r", r_cols]
        return lg.merge(rg, on=on_cols, how=how)

    return lds.union(rds).groupby("__bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )
