"""Distributed range-partitioned sort.

The engine's queries mostly avoid global sorts (driver-side ordering of
small results, bucketed folds for keyed work), but a total order over a
corpus-scaled table is a real primitive (sorted exports, merge-join
prep, percentile scans). ``range_sort`` implements the classic
sample-sort shape on Ray Data:

1. sample the primary key per batch (bounded per-batch sample, so the
   driver sees ~`sample_target` values regardless of corpus size),
2. cut the key space into ``auto_buckets`` ranges at sampled quantiles
   (equal keys never straddle a cut: assignment is
   ``searchsorted(cuts, key, side='right')``),
3. one hash-free range exchange (groupby on the range id), full
   multi-key sort inside each range via ``map_groups`` — each task
   sorts ~|corpus|/B rows,
4. the driver merges by RANGE ID ONLY (a stable single-int-column
   sort over pre-sorted runs) — the expensive multi-key comparisons
   all happen distributed. At the 100-TB end step 4 becomes
   ``write_parquet`` with range-ordered file names instead of a driver
   merge; the in-memory shape here is the benchmark/driver-compare
   surface.

Skewed keys degrade gracefully: a value heavier than |corpus|/B lands
in one range (same contract as every keyed fold); the sample-based
cuts keep *distinct-value* skew bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .shuffle import auto_buckets, bucket_partitions


def range_sort(ds, keys, sample_target: int = 8192,
               rows_hint: int | None = None,
               num_buckets: int | None = None) -> pd.DataFrame:
    """Globally sort ``ds`` by ``keys`` (ascending, NaN-free primary
    key) and return the ordered pandas frame. The primary key drives
    the range partitioning; remaining keys order within ranges."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    primary = keys[0]

    mat = ds.materialize()
    n_rows = rows_hint or mat.count()
    nb = num_buckets or auto_buckets(n_rows)

    # bounded per-batch sample: ceil(sample_target / n_blocks) rows per
    # batch via a fixed stride, so driver-side sample size is constant
    per_batch = max(1, sample_target // max(1, mat.num_blocks()))

    def take_sample(df: pd.DataFrame) -> pd.DataFrame:
        step = max(1, len(df) // per_batch)
        return df.iloc[::step][[primary]]

    sample = (mat.map_batches(take_sample, batch_format="pandas")
              .to_pandas()[primary].to_numpy())
    if len(sample) == 0:
        return mat.to_pandas().sort_values(keys).reset_index(drop=True)
    qs = np.linspace(0, 1, nb + 1)[1:-1]
    cuts = np.unique(np.quantile(sample, qs))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rb"] = np.searchsorted(
            cuts, df[primary].to_numpy(), side="right").astype("int64")
        return df

    def sort_range(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(keys, kind="mergesort")

    out = (
        mat.map_batches(assign, batch_format="pandas")
        .groupby("__rb", num_partitions=bucket_partitions(len(cuts) + 1))
        .map_groups(sort_range, batch_format="pandas")
        .to_pandas()
    )
    # stable merge of pre-sorted runs: order by range id only
    out = (out.sort_values("__rb", kind="mergesort")
           .drop(columns="__rb").reset_index(drop=True))
    return out


def prefix_sum(ds, order_key: str, value_col: str, out_col: str = "cum",
               sample_target: int = 8192, rows_hint: int | None = None,
               num_buckets: int | None = None):
    """Distributed inclusive prefix sum of ``value_col`` in
    ``order_key`` order — the classic two-phase scan:

    1. range-cut the order key at sampled quantiles (same contract as
       range_sort: equal keys never straddle a cut),
    2. phase A: per-range PARTIAL SUMS only — B int64s reach the
       driver, never rows,
    3. driver: exclusive prefix offsets over the B partials,
    4. phase B: one range exchange; inside each range sort by the key,
       cumsum, add the range's offset.

    Returns ``(dataset-with-out_col, total)``. ``order_key`` must be
    unique per row (an id column) — equal keys would make "order"
    ambiguous — and ``value_col`` integer so the running sum is exact.
    Systematic sampling rides this; so would any ordered-scan op
    (quota fills, token-budget cutoffs, CDF positioning).
    """
    mat = ds.materialize()
    n_rows = rows_hint or mat.count()
    nb = num_buckets or auto_buckets(n_rows)

    per_batch = max(1, sample_target // max(1, mat.num_blocks()))

    def take_sample(df: pd.DataFrame) -> pd.DataFrame:
        step = max(1, len(df) // per_batch)
        return df.iloc[::step][[order_key]]

    sample = (mat.map_batches(take_sample, batch_format="pandas")
              .to_pandas()[order_key].to_numpy())
    if len(sample) == 0:
        import ray.data as rd

        empty = mat.to_pandas()
        empty[out_col] = pd.Series([], dtype="int64")
        return rd.from_pandas(empty), 0
    qs = np.linspace(0, 1, nb + 1)[1:-1]
    cuts = np.unique(np.quantile(sample, qs))
    n_ranges = len(cuts) + 1

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rb"] = np.searchsorted(
            cuts, df[order_key].to_numpy(), side="right").astype("int64")
        return df

    # phase A: per-(batch, range) partial sums — tiny rows
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        a = assign(df)
        g = a.groupby("__rb", sort=False)[value_col].sum()
        return pd.DataFrame({"__rb": g.index.to_numpy(dtype="int64"),
                             "__s": g.to_numpy(dtype="int64")})

    parts = mat.map_batches(partial, batch_format="pandas").to_pandas()
    sums = np.zeros(n_ranges, dtype=np.int64)
    np.add.at(sums, parts["__rb"].to_numpy(), parts["__s"].to_numpy())
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    total = int(sums.sum())

    # phase B: one range exchange, ordered cumsum + offset per range
    def scan_range(g: pd.DataFrame) -> pd.DataFrame:
        rb = int(g["__rb"].iloc[0])
        g = g.sort_values(order_key, kind="mergesort")
        g[out_col] = (g[value_col].to_numpy(dtype="int64").cumsum()
                      + offsets[rb])
        return g.drop(columns="__rb")

    out = (
        mat.map_batches(assign, batch_format="pandas")
        .groupby("__rb", num_partitions=bucket_partitions(n_ranges))
        .map_groups(scan_range, batch_format="pandas")
    )
    return out, total
