"""Temporal window operators over event streams — rolling (RANGE-frame)
window aggregates, as-of joins, and interval range joins.

The reference has no temporal algebra (its only ordering op is the
sort_index restore in utils/data.py); these are engine-native custom
operators per the training-data-pipeline extension list, built as
compositions Ray Data lacks natively:

  rolling_count   per-key trailing time-window counts. Shape: bucket by
                  hash(key) -> one co-located group per bucket -> sort
                  inside -> ONE vectorized np.searchsorted over a
                  composite (key_code * SPAN + ts_offset) int64 axis for
                  the whole bucket (no per-key Python loop). SQL
                  equivalent: COUNT(*) OVER (PARTITION BY key ORDER BY
                  ts RANGE BETWEEN w PRECEDING AND CURRENT ROW) — peers
                  (equal ts) are included, matching RANGE frames.
  asof_join       most-recent-at-or-before match per key. Shape: filter
                  both sides at the read, union with a side tag (one
                  shuffle total), bucket by hash(key), pandas
                  merge_asof (vectorized galloping merge) per bucket.
  range_join      count matches within [ts - w, ts] per key: same
                  bucket exchange, composite-key searchsorted for the
                  interval counts — an explicit partitioned band join.

Partitioning assumption (documented per the custom-operator rule): keys
are hash-distributed across `num_buckets`; a single hot key lands in
one bucket, so per-bucket work is O(rows of its keys) — raise
num_buckets or salt if one key dominates the stream. All three ops
shuffle each event row exactly once, carrying only the projected
columns, never the full events payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .shuffle import auto_buckets, bucket_partitions

def _ts_ns(series: pd.Series) -> np.ndarray:
    """Timestamps to int64 NANOSECONDS regardless of the series
    resolution (parquet reads land as datetime64[us], from_pandas as
    [ns] — a bare astype(int64) silently mixes units)."""
    return series.to_numpy().astype("datetime64[ns]").astype(np.int64)


def _composite_axis(key_codes: np.ndarray, ts_ns: np.ndarray,
                    window_ns: int) -> tuple[np.ndarray, np.int64]:
    """Map (key, ts) to a single sorted int64 axis: code * SPAN + offset.
    SPAN leaves window_ns + 2 of headroom so a query point
    (code, ts - w) can never collide into the previous key's range."""
    off = ts_ns - ts_ns.min()
    span = np.int64(off.max()) + np.int64(window_ns) + np.int64(2)
    return key_codes.astype(np.int64) * span + off + np.int64(window_ns) + np.int64(1), span


def _axis_fits(key_codes: np.ndarray, ts_ns: np.ndarray,
               window_ns: int) -> bool:
    """The composite axis silently WRAPS int64 once
    (max_code + 1) * span reaches 2^63 (e.g. ~3500 keys/bucket over a
    30-day span; ADVICE r2). Headroom-checked in Python ints (no wrap),
    against 2^62 for margin."""
    if not len(key_codes):
        return True
    span = int(ts_ns.max()) - int(ts_ns.min()) + int(window_ns) + 2
    return (int(key_codes.max()) + 1) * span < (1 << 62)


def _window_bounds_sorted(codes: np.ndarray, ts_ns: np.ndarray,
                          window_ns: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row trailing RANGE-frame bounds [lo, hi) as absolute row
    indices, for rows sorted by (key, ts): composite-axis searchsorted
    on the fast path, per-key-segment searchsorted when the axis would
    overflow (few big segments -> the segment loop is cheap; correctness
    never depends on the axis fitting)."""
    if _axis_fits(codes, ts_ns, window_ns):
        axis, _ = _composite_axis(codes, ts_ns, window_ns)
        lo = np.searchsorted(axis, axis - np.int64(window_ns), side="left")
        hi = np.searchsorted(axis, axis, side="right")
        return lo, hi
    from . import pathlog

    pathlog.note("windows", "segment_fallback", rows=len(codes),
                 n_keys=int(codes.max()) + 1 if len(codes) else 0)
    lo = np.empty(len(codes), np.int64)
    hi = np.empty(len(codes), np.int64)
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    ends = np.r_[starts[1:], len(codes)]
    w = np.int64(window_ns)
    for s, e in zip(starts, ends):
        seg = ts_ns[s:e]
        lo[s:e] = s + np.searchsorted(seg, seg - w, side="left")
        hi[s:e] = s + np.searchsorted(seg, seg, side="right")
    return lo, hi


def rolling_count(ds, key: str, ts: str, window: pd.Timedelta,
                  num_buckets: int | None = None,
                  rows_hint: int | None = None):
    """Per-row trailing-window event count, aggregated to
    (key, peak, n_events) per key. Matches the SQL RANGE frame exactly:
    the frame is [ts - window, last peer of ts] (equal-ts peers count).
    num_buckets scales from rows_hint (auto_buckets) unless forced.
    """
    window_ns = int(window / pd.Timedelta(1, "ns"))
    num_buckets = num_buckets or auto_buckets(rows_hint)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, ts]].copy()
        df["__b"] = pd.util.hash_array(df[key].to_numpy()) % num_buckets
        return df

    def peak(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts], kind="mergesort")
        codes = g[key].factorize(sort=False)[0]
        lo, hi = _window_bounds_sorted(codes, _ts_ns(g[ts]), window_ns)
        g = g.assign(__c=hi - lo)
        return g.groupby(key, as_index=False).agg(
            peak=("__c", "max"), n_events=("__c", "size")
        )

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("__b", num_partitions=bucket_partitions(num_buckets))
        .map_groups(peak, batch_format="pandas")
    )


def asof_join(left_ds, right_ds, key: str, ts: str,
              right_ts_out: str = "matched_ts",
              num_buckets: int | None = None,
              right_cols: list[str] | None = None,
              rows_hint: int | None = None):
    """For each left row, attach the greatest right ts <= left ts with
    the same key (backward as-of, exact matches allowed) — DuckDB
    `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts` semantics.

    Both sides are packed into one uniform (key, ts, side) stream so
    the exchange is a single shuffle; merge_asof inside each bucket is
    pandas' vectorized galloping merge, one call per BUCKET.

    `right_cols` attaches NUMERIC payload columns of the matched right
    row (cast float64 so the packed union stays uniform-schema; NaN
    where unmatched). For non-numeric payloads, equi-join the result's
    (key, matched_ts) back against the right side with
    engine.joins.bucket_join instead."""
    num_buckets = num_buckets or auto_buckets(rows_hint)

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[[key, ts]].copy()
            for c in right_cols or []:
                out[c] = (df[c].astype("float64") if side == "r"
                          else np.float64("nan"))
            out["__side"] = side
            out["__b"] = pd.util.hash_array(out[key].to_numpy()) % num_buckets
            return out

        return fn

    both = left_ds.map_batches(tag("l"), batch_format="pandas").union(
        right_ds.map_batches(tag("r"), batch_format="pandas")
    )
    return _asof_merge(both, key, ts, right_ts_out, right_cols,
                       num_buckets)


def asof_join_single(ds, key: str, ts: str, left_mask_fn, right_mask_fn,
                     right_ts_out: str = "matched_ts",
                     num_buckets: int | None = None,
                     right_cols: list[str] | None = None,
                     rows_hint: int | None = None):
    """asof_join when BOTH sides come from the same source dataset
    (e.g. two event types of one stream): ONE scan tags each row l/r
    via the vectorized mask callbacks (df -> bool mask; a row matching
    both emits twice), instead of two full reads + union. Same bucket
    exchange and per-bucket merge as asof_join."""
    num_buckets = num_buckets or auto_buckets(rows_hint)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        lm = left_mask_fn(df)
        rm = right_mask_fn(df)
        l = df[lm][[key, ts]].copy()
        for c in right_cols or []:
            l[c] = np.float64("nan")
        l["__side"] = "l"
        r = df[rm][[key, ts]].copy()
        for c in right_cols or []:
            r[c] = df[rm][c].astype("float64")
        r["__side"] = "r"
        out = pd.concat([l, r], ignore_index=True)
        out["__b"] = pd.util.hash_array(out[key].to_numpy()) % num_buckets
        return out

    both = ds.map_batches(tag, batch_format="pandas")
    return _asof_merge(both, key, ts, right_ts_out, right_cols,
                       num_buckets)


def _asof_merge(both, key: str, ts: str, right_ts_out: str,
                right_cols: list[str] | None = None,
                num_buckets: int = 64):
    rcols = list(right_cols or [])

    def merge(g: pd.DataFrame):
        import pyarrow as pa

        # emit a FIXED arrow schema even for empty groups: empty pandas
        # blocks are schema-less in Ray 2.49 and poison downstream concat
        kt = pa.Table.from_pandas(g[[key, ts]].head(0),
                                  preserve_index=False).schema
        schema = pa.schema([kt.field(key), kt.field(ts),
                            kt.field(ts).with_name(right_ts_out)]
                           + [(c, pa.float64()) for c in rcols])
        lg = g[g["__side"] == "l"][[key, ts]].sort_values(ts, kind="mergesort")
        rg = (
            g[g["__side"] == "r"][[key, ts] + rcols]
            .rename(columns={ts: right_ts_out})
            .sort_values(right_ts_out, kind="mergesort")
        )
        if lg.empty:
            return schema.empty_table()
        if rg.empty:
            out = lg.copy()
            out[right_ts_out] = pd.Series(pd.NaT, index=out.index,
                                          dtype=g[ts].dtype)
            for c in rcols:
                out[c] = np.float64("nan")
        else:
            out = pd.merge_asof(
                lg, rg, left_on=ts, right_on=right_ts_out, by=key,
                direction="backward", allow_exact_matches=True,
            )
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    return both.groupby("__b", num_partitions=bucket_partitions(num_buckets)).map_groups(merge, batch_format="pandas")



def range_join_count(left_ds, right_ds, key: str, ts: str,
                     window: pd.Timedelta,
                     num_buckets: int | None = None,
                     rows_hint: int | None = None):
    """Per key: number of (left, right) pairs with right.ts in
    [left.ts - window, left.ts] (inclusive band join), emitted as
    (key, n_pairs) for keys with n_pairs > 0. Same single-shuffle
    packed-union exchange as asof_join; counts via two composite-key
    searchsorted calls per bucket (no pair materialization)."""
    num_buckets = num_buckets or auto_buckets(rows_hint)

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[[key, ts]].copy()
            out["__side"] = side
            out["__b"] = pd.util.hash_array(out[key].to_numpy()) % num_buckets
            return out

        return fn

    both = left_ds.map_batches(tag("l"), batch_format="pandas").union(
        right_ds.map_batches(tag("r"), batch_format="pandas")
    )
    return _range_count(both, key, ts, window, num_buckets)


def range_join_count_single(ds, key: str, ts: str, window: pd.Timedelta,
                            left_mask_fn, right_mask_fn,
                            num_buckets: int | None = None,
                            rows_hint: int | None = None):
    """range_join_count when both sides come from one source dataset:
    ONE scan tags rows l/r via vectorized mask callbacks (see
    asof_join_single)."""
    num_buckets = num_buckets or auto_buckets(rows_hint)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        l = df[left_mask_fn(df)][[key, ts]].copy()
        l["__side"] = "l"
        r = df[right_mask_fn(df)][[key, ts]].copy()
        r["__side"] = "r"
        out = pd.concat([l, r], ignore_index=True)
        out["__b"] = pd.util.hash_array(out[key].to_numpy()) % num_buckets
        return out

    return _range_count(ds.map_batches(tag, batch_format="pandas"),
                        key, ts, window, num_buckets)


def _range_count(both, key: str, ts: str, window: pd.Timedelta,
                 num_buckets: int = 64):
    window_ns = int(window / pd.Timedelta(1, "ns"))

    def count(g: pd.DataFrame):
        import pyarrow as pa

        kt = pa.Table.from_pandas(g[[key]].head(0), preserve_index=False)
        schema = pa.schema([kt.schema.field(key), ("n_pairs", pa.int64())])
        codes, _uniq = pd.factorize(g[key], sort=False)
        is_l = (g["__side"] == "l").to_numpy()
        if not is_l.any() or is_l.all():
            return schema.empty_table()
        ts_all = _ts_ns(g[ts])
        if _axis_fits(codes, ts_all, window_ns):
            axis_all, _ = _composite_axis(codes, ts_all, window_ns)
            r_axis = np.sort(axis_all[~is_l])
            l_axis = axis_all[is_l]
            n = (
                np.searchsorted(r_axis, l_axis, side="right")
                - np.searchsorted(r_axis, l_axis - np.int64(window_ns),
                                  side="left")
            )
        else:
            # overflow-safe fallback (ADVICE r2): sort by (key, ts) and
            # count per key SEGMENT against its own sorted r slice
            from . import pathlog

            pathlog.note("windows", "segment_fallback_range",
                         rows=len(codes), n_keys=int(codes.max()) + 1)
            order = np.lexsort((ts_all, codes))
            oc, ot, ol = codes[order], ts_all[order], is_l[order]
            cnt_sorted = np.zeros(len(oc), np.int64)
            starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
            ends = np.r_[starts[1:], len(oc)]
            w = np.int64(window_ns)
            for s, e in zip(starts, ends):
                lm = ol[s:e]
                if not lm.any():
                    continue
                r_ts = ot[s:e][~lm]
                l_ts = ot[s:e][lm]
                cnt_sorted[np.arange(s, e)[lm]] = (
                    np.searchsorted(r_ts, l_ts, side="right")
                    - np.searchsorted(r_ts, l_ts - w, side="left")
                )
            cnt = np.zeros(len(oc), np.int64)
            cnt[order] = cnt_sorted
            n = cnt[is_l]
        out = pd.DataFrame({key: g[key].to_numpy()[is_l], "n_pairs": n})
        out = out.groupby(key, as_index=False)["n_pairs"].sum()
        out = out[out["n_pairs"] > 0]
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    return both.groupby("__b", num_partitions=bucket_partitions(num_buckets)).map_groups(count, batch_format="pandas")


def rolling_sum(ds, key: str, ts: str, val: str, window: pd.Timedelta,
                num_buckets: int | None = None,
                rows_hint: int | None = None):
    """Trailing-window SUM of a value column per key, aggregated to
    (key, peak_sum, n_events). Same RANGE-frame semantics and bucket
    exchange as rolling_count; the per-row window sum is a prefix-sum
    difference over the composite axis (two searchsorted + one cumsum
    per bucket — no per-key loop, no pair materialization).

    Float note: window sums are prefix-sum DIFFERENCES, so cancellation
    error can disagree with a direct per-window sum in the last ulp;
    the query layer keeps values integer-quantized (cents) to stay
    oracle-exact."""
    window_ns = int(window / pd.Timedelta(1, "ns"))
    num_buckets = num_buckets or auto_buckets(rows_hint)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, ts, val]].copy()
        df["__b"] = pd.util.hash_array(df[key].to_numpy()) % num_buckets
        return df

    def peak(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts], kind="mergesort")
        codes = g[key].factorize(sort=False)[0]
        lo, hi = _window_bounds_sorted(codes, _ts_ns(g[ts]), window_ns)
        pref = np.concatenate([[0], np.cumsum(g[val].to_numpy())])
        g = g.assign(__s=pref[hi] - pref[lo])
        return g.groupby(key, as_index=False).agg(
            peak_sum=("__s", "max"), n_events=("__s", "size")
        )

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("__b", num_partitions=bucket_partitions(num_buckets))
        .map_groups(peak, batch_format="pandas")
    )


def grouped_topk(ds, key: str, order_col: str, k: int = 3,
                 tie_cols: list[str] | None = None, ascending: bool = False,
                 num_buckets: int | None = None,
                 rows_hint: int | None = None):
    """Per-key top-k rows by ``order_col`` (descending by default),
    deterministic via ``tie_cols`` — the grouped-top-N shape (SQL
    QUALIFY row_number() OVER (PARTITION BY key ORDER BY ...) <= k)
    WITHOUT a global sort: a map-side per-batch top-k combiner prunes
    the exchange to <= k rows per (batch, key), then ONE hash exchange
    on the key and a vectorized per-partition sort + group-head. Emits
    the input columns plus ``rank`` (1-based). Top-k is a semilattice,
    so the batch-level combiner is exact."""
    num_buckets = num_buckets or auto_buckets(rows_hint)
    ties = list(tie_cols or [])
    order = [key, order_col] + ties
    asc = [True, ascending] + [True] * len(ties)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        df = df.groupby(key, as_index=False, sort=False).head(k)
        df = df.copy()
        df["__b"] = pd.util.hash_array(df[key].to_numpy()) % num_buckets
        return df

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values(order, ascending=asc,
                                              kind="mergesort")
        g = g.groupby(key, as_index=False, sort=False).head(k).copy()
        g["rank"] = g.groupby(key, sort=False).cumcount() + 1
        return g

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("__b", num_partitions=bucket_partitions(num_buckets))
        .map_groups(topk, batch_format="pandas")
    )
