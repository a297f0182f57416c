"""Second wave of TPC-H-shaped analogs (Q4/Q12/Q13/Q14/Q17/Q18/Q19/Q22)
over the /root/testdata star schema, adapted to its columns (no
commitdate/receiptdate/shipmode/container/phone — predicates swap to
shipdate-vs-orderdate lag, returnflag, p_type/p_size, mktsegment while
keeping each query's JOIN/AGG shape intact).

Every query follows the house dual-path idiom (engine/queries.py q7):
below a footer-row threshold the dimension side ships as ONE ray.put
sorted-array broadcast and the fact table streams through a single
fused map_batches (zero exchanges); above it the same semantics run as
map-side partial aggregation + one packed bucket join
(engine/joins.bucket_join), so per-bucket heap stays bounded at any
corpus size. All money/quantity math is exact-integer (cents or
1e-4-dollar units) so partial-sum order can never move a rounded
cent — each oracle in __ray_entry__ sums the identical integer
expression.

Reference shapes: TPC-H spec queries 4/12/13/14/17/18/19/22 (public);
alignment/eval discipline follows the repo conventions from
engine/queries.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _days(arr) -> np.ndarray:
    """timestamp[us] -> int64 days since epoch (dates in this corpus
    are midnight-aligned, so the floor is exact)."""
    return np.asarray(arr).astype("datetime64[D]").astype(np.int64)


def _day(s: str) -> int:
    return int(np.datetime64(s, "D").astype(np.int64))


def _put_sorted(df: pd.DataFrame, key: str, *vals: str):
    """ray.put a (sorted_keys, val_arrays...) broadcast tuple — the
    searchsorted side-attach payload every small path here uses."""
    import ray

    d = df.sort_values(key)
    keys = np.ascontiguousarray(d[key].to_numpy(np.int64))
    arrs = tuple(np.ascontiguousarray(d[v].to_numpy()) for v in vals)
    return ray.put((keys,) + arrs)


def _probe(keys: np.ndarray, sorted_keys: np.ndarray):
    """searchsorted membership probe: (positions, hit_mask)."""
    pos = np.minimum(np.searchsorted(sorted_keys, keys),
                     max(len(sorted_keys) - 1, 0))
    hit = (sorted_keys[pos] == keys) if len(sorted_keys) else np.zeros(
        len(keys), bool)
    return pos, hit


# --------------------------------------------------------------- Q4 --
def q4_order_priority(sf_dir: str, date_from: str = "1996-01-01",
                      date_to: str = "1996-04-01", late_days: int = 30,
                      small_threshold: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q4 shape: count orders per priority placed in a quarter
    that have at least one LATE lineitem (this schema has no
    commitdate/receiptdate, so "late" = shipped >= orderdate +
    late_days). EXISTS folds to max(l_shipdate) per order, so the
    lineitem side pre-aggregates map-side to one (orderkey, max_ship)
    row per batch-key before any exchange.

    Small path (orders footer under threshold): quarter orders become
    a sorted (orderkey -> orderdate_days) broadcast; ONE fused
    lineitem pass emits per-batch distinct qualifying orderkeys
    (bounded by the quarter's orders), folded on the driver. Large
    path: quarter-filtered orders stream through a packed bucket join
    against the lineitem max-shipdate partials; the per-bucket merge
    applies the EXISTS predicate and emits 5-slot priority counts."""
    import pyarrow.parquet as pq
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _tbl_rows

    lo, hi = _day(date_from), _day(date_to)
    n_orders = _tbl_rows(sf_dir, "orders")
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    if n_orders is not None and n_orders <= small_threshold:
        note("q4", "fused_broadcast", n_orders=n_orders)
        o = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ).to_pandas()
        o = o.assign(odays=_days(o["o_orderdate"]))
        o = o[(o["odays"] >= lo) & (o["odays"] < hi)]
        ref = _put_sorted(o, "o_orderkey", "odays")

        def qualifying(t: pa.Table) -> pd.DataFrame:
            ok, od = ray.get(ref)
            lk = t["l_orderkey"].to_numpy()
            pos, hit = _probe(lk, ok)
            # index od only on hit rows — od may be empty (window
            # matched no orders) while pos is zero-filled
            late = (_days(t["l_shipdate"].to_numpy())[hit]
                    >= od[pos[hit]] + late_days)
            return pd.DataFrame(
                {"o_orderkey": np.unique(lk[hit][late]).astype(np.int64)})

        parts = li.map_batches(qualifying, batch_format="pyarrow")
        # empty blocks bypass map_batches output conversion and can
        # arrive column-less — guard the driver fold
        q = np.unique(np.concatenate(
            [b["o_orderkey"].to_numpy()
             for b in parts.iter_batches(batch_format="pandas",
                                         batch_size=None)
             if "o_orderkey" in b.columns]
            or [np.empty(0, np.int64)]))
        counts = (o[o["o_orderkey"].isin(q)]
                  .groupby("o_orderpriority").size())
    else:
        note("q4", "bucket_join", n_orders=n_orders)
        orders = _rp(sf_dir, "orders",
                     ["o_orderkey", "o_orderdate", "o_orderpriority"])

        def window(df: pd.DataFrame) -> pd.DataFrame:
            d = _days(df["o_orderdate"].to_numpy())
            keep = (d >= lo) & (d < hi)
            return pd.DataFrame({
                "l_orderkey": df["o_orderkey"].to_numpy()[keep],
                "odays": d[keep],
                "prio": df["o_orderpriority"].to_numpy()[keep]})

        o_win = orders.map_batches(window, batch_format="pandas")

        def max_ship(t: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame({
                "l_orderkey": t["l_orderkey"].to_numpy(),
                "sdays": _days(t["l_shipdate"].to_numpy())})
            return df.groupby("l_orderkey", as_index=False)["sdays"].max()

        li_part = li.map_batches(max_ship, batch_format="pyarrow")

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"prio": pd.Series([], dtype="object"),
                                     "n": pd.Series([], dtype="int64")})
            g = (df.groupby(["l_orderkey", "prio", "odays"],
                            as_index=False)["sdays"].max())
            g = g[g["sdays"] >= g["odays"] + late_days]
            out = g.groupby("prio", as_index=False).size()
            return out.rename(columns={"size": "n"})

        parts = (bucket_join(o_win, li_part, on="l_orderkey",
                             rows_hint=n_orders)
                 .map_batches(fold, batch_format="pandas").to_pandas())
        counts = (pd.Series([], dtype="int64") if parts.empty
                  else parts.groupby("prio")["n"].sum())

    out = counts.rename_axis("o_orderpriority").reset_index(
        name="order_count")
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# -------------------------------------------------------------- Q12 --
def q12_priority_by_flag(sf_dir: str, year: int = 1997,
                         small_threshold: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q12 shape: lineitems shipped in `year`, classified by the
    parent order's priority (URGENT/HIGH vs rest), counted per
    l_returnflag (the schema's stand-in for shipmode). The fact scan
    folds to a 6-slot (flag x high/low) array per batch — the exchange
    moves 6 ints per batch regardless of corpus size.

    Small path: orders ship as a sorted (orderkey -> is_high int8)
    broadcast; a miss raises (FK violation — every lineitem must have
    an order, same guard as q10). Large path: per-batch
    (orderkey, flag) count partials bucket-join the priority map."""
    import pyarrow.parquet as pq
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _tbl_rows

    lo, hi = _day(f"{year}-01-01"), _day(f"{year + 1}-01-01")
    HIGH = ("1-URGENT", "2-HIGH")
    n_orders = _tbl_rows(sf_dir, "orders")
    li = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_returnflag", "l_shipdate"])

    def _flag_codes(arr) -> np.ndarray:
        # returnflag domain is {A, N, R} — first-byte code, guarded
        c = np.frombuffer("".join(arr).encode("ascii"), dtype=np.uint8)
        code = np.searchsorted(np.frombuffer(b"ANR", dtype=np.uint8), c)
        if len(c) and not (np.frombuffer(b"ANR", dtype=np.uint8)[
                np.minimum(code, 2)] == c).all():
            raise ValueError("q12: unexpected l_returnflag value")
        return code.astype(np.int64)

    if n_orders is not None and n_orders <= small_threshold:
        note("q12", "fused_broadcast", n_orders=n_orders)
        o = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"]).to_pandas()
        o["is_high"] = o["o_orderpriority"].isin(HIGH).astype(np.int8)
        ref = _put_sorted(o, "o_orderkey", "is_high")

        def fused(t: pa.Table) -> pd.DataFrame:
            ok, ih = ray.get(ref)
            d = _days(t["l_shipdate"].to_numpy())
            keep = (d >= lo) & (d < hi)
            lk = t["l_orderkey"].to_numpy()[keep]
            if not len(lk):
                return pd.DataFrame({"slot": pd.Series([], dtype="int64"),
                                     "n": pd.Series([], dtype="int64")})
            pos, hit = _probe(lk, ok)
            if not hit.all():
                raise ValueError(
                    "q12: lineitem orderkey missing from orders (FK)")
            flag = _flag_codes(
                t["l_returnflag"].to_pylist())[keep.nonzero()[0]]
            slot = flag * 2 + ih[pos].astype(np.int64)
            cnt = np.bincount(slot, minlength=6).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pd.DataFrame({"slot": nz, "n": cnt[nz]})

        parts = li.map_batches(fused, batch_format="pyarrow").to_pandas()
    else:
        note("q12", "bucket_join", n_orders=n_orders)
        orders = _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

        def prio_map(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "l_orderkey": df["o_orderkey"].to_numpy(),
                "is_high": df["o_orderpriority"].isin(HIGH)
                .to_numpy().astype(np.int8)})

        o_map = orders.map_batches(prio_map, batch_format="pandas")

        def li_partial(t: pa.Table) -> pd.DataFrame:
            d = _days(t["l_shipdate"].to_numpy())
            keep = (d >= lo) & (d < hi)
            if not keep.any():
                return pd.DataFrame({
                    "l_orderkey": pd.Series([], dtype="int64"),
                    "flag": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64")})
            df = pd.DataFrame({
                "l_orderkey": t["l_orderkey"].to_numpy()[keep],
                "flag": _flag_codes(
                    t["l_returnflag"].to_pylist())[keep.nonzero()[0]]})
            out = (df.groupby(["l_orderkey", "flag"], as_index=False)
                   .size().rename(columns={"size": "cnt"}))
            out["cnt"] = out["cnt"].astype("int64")
            return out

        li_part = li.map_batches(li_partial, batch_format="pyarrow")

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"slot": pd.Series([], dtype="int64"),
                                     "n": pd.Series([], dtype="int64")})
            df = df.assign(
                slot=df["flag"].to_numpy(np.int64) * 2
                + df["is_high"].to_numpy(np.int64))
            return (df.groupby("slot", as_index=False)["cnt"].sum()
                    .rename(columns={"cnt": "n"}))

        parts = (bucket_join(li_part, o_map, on="l_orderkey",
                             rows_hint=n_orders)
                 .map_batches(fold, batch_format="pandas").to_pandas())

    acc = np.zeros(6, dtype=np.int64)
    if not parts.empty:
        np.add.at(acc, parts["slot"].to_numpy(np.int64),
                  parts["n"].to_numpy(np.int64))
    flags = np.array(["A", "N", "R"])
    present = acc.reshape(3, 2).sum(axis=1) > 0
    return pd.DataFrame({
        "l_returnflag": flags[present],
        "high_line_count": acc.reshape(3, 2)[present, 1],
        "low_line_count": acc.reshape(3, 2)[present, 0]})


# -------------------------------------------------------------- Q13 --
def q13_order_distribution(sf_dir: str,
                           exclude_priority: str = "5-LOW") -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts
    (customers with zero kept via the footer row count — every
    o_custkey is a valid customer FK, so zero-customers = total minus
    distinct custkeys seen). The per-custkey count uses
    shuffle.grouped_sum (corpus-scaled key space — Ray's hash
    aggregate pays per-group overhead, see that docstring); the
    count-of-counts histogram folds per batch to at most
    max_orders_per_customer rows, driver-merged."""
    from .queries import _rp, _tbl_rows
    from .shuffle import grouped_sum

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def ones(t: pa.Table) -> pd.DataFrame:
        keep = pc.not_equal(t["o_orderpriority"],
                            exclude_priority).to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "o_custkey": t["o_custkey"].to_numpy()[keep],
            "cnt": np.ones(int(keep.sum()), dtype=np.int64)})

    per_cust = grouped_sum(
        orders.map_batches(ones, batch_format="pyarrow"),
        keys="o_custkey", sum_cols="cnt",
        rows_hint=_tbl_rows(sf_dir, "orders"))

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("cnt", as_index=False).size()
        return pd.DataFrame({"c_count": h["cnt"].to_numpy(np.int64),
                             "custdist": h["size"].to_numpy(np.int64)})

    parts = per_cust.map_batches(hist, batch_format="pandas").to_pandas()
    agg = (parts.groupby("c_count", as_index=False)["custdist"].sum()
           if not parts.empty
           else pd.DataFrame({"c_count": pd.Series([], dtype="int64"),
                              "custdist": pd.Series([], dtype="int64")}))
    n_cust = _tbl_rows(sf_dir, "customer") or 0
    zero = n_cust - int(agg["custdist"].sum())
    if zero > 0:
        agg = pd.concat(
            [agg, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True)
    agg["c_count"] = agg["c_count"].astype("int64")
    agg["custdist"] = agg["custdist"].astype("int64")
    return (agg.sort_values(["custdist", "c_count"],
                            ascending=[False, False])
            .reset_index(drop=True))


# -------------------------------------------------------------- Q14 --
def q14_promo_revenue(sf_dir: str, month: str = "1997-09",
                      promo_type: str = "PROMO",
                      small_threshold: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q14 shape: share of a month's revenue from promo parts.
    Small path: promo partkeys ship as one sorted-array broadcast and
    the month's lineitems fold to TWO int64 sums per batch (promo /
    total, exact 1e-4-dollar units). Large path: per-batch
    (partkey -> rev_units) partials bucket-join the part type map.
    The final ratio divides the two exact integer sums in float64 —
    the oracle casts the identical integer sums to DOUBLE, so the
    quotient is bit-identical."""
    import pyarrow.parquet as pq
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _rev_units, _tbl_rows

    m0 = np.datetime64(month, "M")
    lo = int(m0.astype("datetime64[D]").astype(np.int64))
    hi = int((m0 + 1).astype("datetime64[D]").astype(np.int64))
    n_part = _tbl_rows(sf_dir, "part")
    li = _rp(sf_dir, "lineitem",
             ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    if n_part is not None and n_part <= small_threshold:
        note("q14", "fused_broadcast", n_part=n_part)
        p = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                          columns=["p_partkey", "p_type"]).to_pandas()
        promo = np.sort(p.loc[p["p_type"] == promo_type, "p_partkey"]
                        .to_numpy(np.int64))
        ref = ray.put(promo)

        def fused(t: pa.Table) -> pd.DataFrame:
            pk = ray.get(ref)
            d = _days(t["l_shipdate"].to_numpy())
            keep = (d >= lo) & (d < hi)
            if not keep.any():
                return pd.DataFrame(
                    {"promo_units": pd.Series([], dtype="int64"),
                     "total_units": pd.Series([], dtype="int64")})
            rev = _rev_units(t["l_extendedprice"].to_numpy()[keep],
                             t["l_discount"].to_numpy()[keep])
            _, hit = _probe(t["l_partkey"].to_numpy()[keep], pk)
            return pd.DataFrame({"promo_units": [int(rev[hit].sum())],
                                 "total_units": [int(rev.sum())]})

        parts = li.map_batches(fused, batch_format="pyarrow").to_pandas()
        # all-empty-block to_pandas drops columns — treat as zero
        promo_u = (int(parts["promo_units"].sum())
                   if "promo_units" in parts.columns else 0)
        total_u = (int(parts["total_units"].sum())
                   if "total_units" in parts.columns else 0)
    else:
        note("q14", "bucket_join", n_part=n_part)
        part = _rp(sf_dir, "part", ["p_partkey", "p_type"])

        def type_map(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "l_partkey": df["p_partkey"].to_numpy(),
                "is_promo": (df["p_type"].to_numpy() == promo_type)
                .astype(np.int8)})

        p_map = part.map_batches(type_map, batch_format="pandas")

        def li_partial(t: pa.Table) -> pd.DataFrame:
            d = _days(t["l_shipdate"].to_numpy())
            keep = (d >= lo) & (d < hi)
            if not keep.any():
                return pd.DataFrame({
                    "l_partkey": pd.Series([], dtype="int64"),
                    "rev_units": pd.Series([], dtype="int64")})
            df = pd.DataFrame({
                "l_partkey": t["l_partkey"].to_numpy()[keep],
                "rev_units": _rev_units(
                    t["l_extendedprice"].to_numpy()[keep],
                    t["l_discount"].to_numpy()[keep])})
            return df.groupby("l_partkey", as_index=False).sum()

        li_part = li.map_batches(li_partial, batch_format="pyarrow")

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {"promo_units": pd.Series([], dtype="int64"),
                     "total_units": pd.Series([], dtype="int64")})
            rev = df["rev_units"].to_numpy(np.int64)
            ip = df["is_promo"].to_numpy() == 1
            return pd.DataFrame({"promo_units": [int(rev[ip].sum())],
                                 "total_units": [int(rev.sum())]})

        parts = (bucket_join(li_part, p_map, on="l_partkey",
                             rows_hint=n_part)
                 .map_batches(fold, batch_format="pandas").to_pandas())
        promo_u = (int(parts["promo_units"].sum())
                   if "promo_units" in parts.columns else 0)
        total_u = (int(parts["total_units"].sum())
                   if "total_units" in parts.columns else 0)

    pct = (100.0 * promo_u / total_u) if total_u else float("nan")
    return pd.DataFrame({"promo_pct": [pct]})


# -------------------------------------------------------------- Q17 --
def q17_small_qty_revenue(sf_dir: str, part_type: str = "SMALL",
                          max_size: int = 25,
                          frac_num: int = 1, frac_den: int = 2
                          ) -> pd.DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below frac x the part's mean quantity) for a filtered part
    family were dropped. Two fused lineitem passes, zero exchanges:
    pass A folds (sum_q100, cnt) per candidate partkey map-side
    (partials bounded by candidates x blocks, driver-merged); pass B
    re-scans with the per-part thresholds broadcast and sums cents.
    The avg comparison is EXACT integer cross-multiplication —
    q100 * cnt * den < num * sum_q100 — mirrored verbatim in the
    oracle, so no float boundary can flip a row."""
    import pyarrow.parquet as pq
    import ray

    from .pathlog import note
    from .queries import _rp

    p = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_type", "p_size"]).to_pandas()
    cand = np.sort(p.loc[(p["p_type"] == part_type)
                         & (p["p_size"] < max_size), "p_partkey"]
                   .to_numpy(np.int64))
    note("q17", "two_pass_broadcast", n_cand=len(cand))
    cref = ray.put(cand)

    li = _rp(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice"])

    def pass_a(t: pa.Table) -> pd.DataFrame:
        ck = ray.get(cref)
        pk = t["l_partkey"].to_numpy()
        _, hit = _probe(pk, ck)
        if not hit.any():
            return pd.DataFrame({
                "l_partkey": pd.Series([], dtype="int64"),
                "sum_q100": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64")})
        q100 = np.rint(t["l_quantity"].to_numpy()[hit] * 100
                       ).astype(np.int64)
        df = pd.DataFrame({"l_partkey": pk[hit], "sum_q100": q100,
                           "cnt": np.ones(len(q100), dtype=np.int64)})
        return df.groupby("l_partkey", as_index=False).sum()

    partials = li.map_batches(pass_a, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return pd.DataFrame({"avg_yearly": [float("nan")]})
    stats = partials.groupby("l_partkey", as_index=False).sum()
    sref = _put_sorted(stats, "l_partkey", "sum_q100", "cnt")

    def pass_b(t: pa.Table) -> pd.DataFrame:
        sk, sq, sc = ray.get(sref)
        pk = t["l_partkey"].to_numpy()
        pos, hit = _probe(pk, sk)
        if not hit.any():
            return pd.DataFrame({"cents": pd.Series([], dtype="int64")})
        q100 = np.rint(t["l_quantity"].to_numpy()[hit] * 100
                       ).astype(np.int64)
        small = (q100 * sc[pos[hit]] * frac_den
                 < frac_num * sq[pos[hit]])
        cents = np.rint(t["l_extendedprice"].to_numpy()[hit][small] * 100
                        ).astype(np.int64)
        return pd.DataFrame({"cents": [int(cents.sum())]})

    parts_b = li.map_batches(pass_b, batch_format="pyarrow").to_pandas()
    cents = (int(parts_b["cents"].sum())
             if "cents" in parts_b.columns else 0)
    return pd.DataFrame({"avg_yearly": [float(cents) / 100 / 7]})


# -------------------------------------------------------------- Q18 --
def q18_large_orders(sf_dir: str, min_qty: int = 180,
                     k: int = 100) -> pd.DataFrame:
    """TPC-H Q18 shape: top-k largest-volume orders. The HAVING
    sum(l_quantity) > min_qty group-by runs as shuffle.grouped_sum
    over the corpus-scaled orderkey space; survivors (rare by
    construction) come to the driver, and the orders/customer
    attribute lookups run as fused broadcast probes over the two
    scans — only surviving keys ship. Quantities are integral doubles
    (sum is exact in float64); ordering is (totalprice DESC, orderdate
    ASC, orderkey ASC) with the explicit key tiebreak so the driver
    hash is order-stable."""
    from .pathlog import note
    from .queries import _rp, _tbl_rows
    from .shuffle import grouped_sum
    import ray

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    per_order = grouped_sum(li, keys="l_orderkey", sum_cols="l_quantity",
                            rows_hint=_tbl_rows(sf_dir, "lineitem"))

    def big(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["l_quantity"] > min_qty]

    surv = per_order.map_batches(big, batch_format="pandas").to_pandas()
    note("q18", "grouped_sum+broadcast_probe", n_surv=len(surv))
    if surv.empty:
        return pd.DataFrame({
            "c_name": pd.Series([], dtype="object"),
            "c_custkey": pd.Series([], dtype="int64"),
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "o_totalprice": pd.Series([], dtype="float64"),
            "sum_qty": pd.Series([], dtype="float64")})
    okeys = np.sort(surv["l_orderkey"].to_numpy(np.int64))
    oref = ray.put(okeys)

    orders = _rp(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def pick_orders(t: pa.Table) -> pd.DataFrame:
        ok = ray.get(oref)
        _, hit = _probe(t["o_orderkey"].to_numpy(), ok)
        return t.to_pandas()[hit]

    od = orders.map_batches(pick_orders,
                            batch_format="pyarrow").to_pandas()
    ckeys = np.sort(od["o_custkey"].unique().astype(np.int64))
    cref = ray.put(ckeys)

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_name"])

    def pick_cust(t: pa.Table) -> pd.DataFrame:
        ck = ray.get(cref)
        _, hit = _probe(t["c_custkey"].to_numpy(), ck)
        return t.to_pandas()[hit]

    cd = cust.map_batches(pick_cust, batch_format="pyarrow").to_pandas()

    out = (od.merge(surv.rename(columns={"l_orderkey": "o_orderkey",
                                         "l_quantity": "sum_qty"}),
                    on="o_orderkey")
           .merge(cd, left_on="o_custkey", right_on="c_custkey"))
    out = (out.sort_values(["o_totalprice", "o_orderdate", "o_orderkey"],
                           ascending=[False, True, True])
           .head(k).reset_index(drop=True))
    out["sum_qty"] = out["sum_qty"].astype("float64")
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]]


# -------------------------------------------------------------- Q19 --
_Q19_BRANCHES = (  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#34", 1, 35, 20, 30),
)


def q19_bracket_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue from an OR of three (brand, size
    range, quantity range) brackets. The part side prefilters to the
    three brands (a constant fraction of the dimension) and ships as
    ONE sorted broadcast of (partkey, branch_code, size); the fact
    scan evaluates all three brackets vectorized and folds to one
    int64 revenue per batch. No exchange at any scale — the broadcast
    is bounded by the brand selectivity, not the corpus."""
    import pyarrow.parquet as pq
    import ray

    from .pathlog import note
    from .queries import _rp, _rev_units, _units_2dec

    p = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    brands = {b: i for i, (b, *_) in enumerate(_Q19_BRANCHES)}
    p = p[p["p_brand"].isin(brands)].assign(
        code=lambda d: d["p_brand"].map(brands).astype(np.int64))
    note("q19", "fused_broadcast", n_cand=len(p))
    ref = _put_sorted(p, "p_partkey", "code", "p_size")
    sizes = np.array([(lo, hi) for _, lo, hi, _, _ in _Q19_BRANCHES],
                     dtype=np.int64)
    qtys = np.array([(lo, hi) for _, _, _, lo, hi in _Q19_BRANCHES],
                    dtype=np.int64)

    li = _rp(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def fused(t: pa.Table) -> pd.DataFrame:
        pk, code, size = ray.get(ref)
        lk = t["l_partkey"].to_numpy()
        pos, hit = _probe(lk, pk)
        if not hit.any():
            return pd.DataFrame({"rev_units": pd.Series([], dtype="int64")})
        c = code[pos[hit]]
        s = size[pos[hit]].astype(np.int64)
        q = t["l_quantity"].to_numpy()[hit]
        ok = ((s >= sizes[c, 0]) & (s <= sizes[c, 1])
              & (q >= qtys[c, 0]) & (q <= qtys[c, 1]))
        if not ok.any():
            return pd.DataFrame({"rev_units": pd.Series([], dtype="int64")})
        rev = _rev_units(t["l_extendedprice"].to_numpy()[hit][ok],
                         t["l_discount"].to_numpy()[hit][ok])
        return pd.DataFrame({"rev_units": [int(rev.sum())]})

    parts = li.map_batches(fused, batch_format="pyarrow").to_pandas()
    units = (int(parts["rev_units"].sum())
             if "rev_units" in parts.columns else 0)
    return pd.DataFrame(
        {"revenue": [float(_units_2dec(np.array([units]))[0])]})


# -------------------------------------------------------------- Q22 --
def q22_idle_balances(sf_dir: str, priority: str = "1-URGENT",
                      small_threshold: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q22 shape: per market segment, count + total balance of
    above-average-balance customers with no `priority` orders (the
    schema has no phone, so country-code becomes mktsegment and the
    anti-join target is priority-filtered orders). Phase 1 folds the
    positive-balance (sum_cents, n) scalars map-side; the
    above-average test is the exact integer cross-multiply
    cents * n > sum_cents. Small path: distinct urgent custkeys fold
    to a driver set (bounded by customers) and the customer scan
    fuses filter + anti-probe + segment fold; large path: the
    balance-filtered customers anti-bucket-join the urgent custkey
    stream."""
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _tbl_rows

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_acctbal",
                                    "c_mktsegment"])

    def bal_partial(t: pa.Table) -> pd.DataFrame:
        cents = np.rint(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = cents > 0
        return pd.DataFrame({"sum_cents": [int(cents[pos].sum())],
                             "n": [int(pos.sum())]})

    totals = cust.map_batches(bal_partial,
                              batch_format="pyarrow").to_pandas()
    S, N = int(totals["sum_cents"].sum()), int(totals["n"].sum())

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    n_orders = _tbl_rows(sf_dir, "orders")

    def seg_fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "c_mktsegment": pd.Series([], dtype="object"),
                "numcust": pd.Series([], dtype="int64"),
                "tot_cents": pd.Series([], dtype="int64")})
        g = df.groupby("c_mktsegment", as_index=False).agg(
            numcust=("c_custkey", "size"), tot_cents=("cents", "sum"))
        g["numcust"] = g["numcust"].astype("int64")
        return g

    if n_orders is not None and n_orders <= small_threshold:
        note("q22", "driver_anti_set", n_orders=n_orders)

        def urgent(t: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc
            keep = pc.equal(t["o_orderpriority"], priority).to_numpy(
                zero_copy_only=False)
            return pd.DataFrame({"c_custkey": np.unique(
                t["o_custkey"].to_numpy()[keep]).astype(np.int64)})

        parts = orders.map_batches(urgent, batch_format="pyarrow")
        bad = np.unique(np.concatenate(
            [b["c_custkey"].to_numpy()
             for b in parts.iter_batches(batch_format="pandas",
                                         batch_size=None)
             if "c_custkey" in b.columns]
            or [np.empty(0, np.int64)]))
        bref = ray.put(bad)

        def fused(t: pa.Table) -> pd.DataFrame:
            bk = ray.get(bref)
            cents = np.rint(t["c_acctbal"].to_numpy() * 100
                            ).astype(np.int64)
            rich = cents * N > S
            _, hit = _probe(t["c_custkey"].to_numpy(), bk)
            keep = rich & ~hit
            return seg_fold(pd.DataFrame({
                "c_custkey": t["c_custkey"].to_numpy()[keep],
                "c_mktsegment": np.asarray(
                    t["c_mktsegment"].to_pylist(), dtype=object)[keep],
                "cents": cents[keep]}))

        parts = cust.map_batches(fused, batch_format="pyarrow").to_pandas()
    else:
        note("q22", "anti_bucket_join", n_orders=n_orders)

        def rich_rows(t: pa.Table) -> pd.DataFrame:
            cents = np.rint(t["c_acctbal"].to_numpy() * 100
                            ).astype(np.int64)
            keep = cents * N > S
            return pd.DataFrame({
                "c_custkey": t["c_custkey"].to_numpy()[keep],
                "c_mktsegment": np.asarray(
                    t["c_mktsegment"].to_pylist(), dtype=object)[keep],
                "cents": cents[keep]})

        rich = cust.map_batches(rich_rows, batch_format="pyarrow")

        def urgent_keys(df: pd.DataFrame) -> pd.DataFrame:
            keep = df["o_orderpriority"].to_numpy() == priority
            return pd.DataFrame({"c_custkey": np.unique(
                df["o_custkey"].to_numpy()[keep]).astype(np.int64)})

        urgent = orders.map_batches(urgent_keys, batch_format="pandas")
        kept = bucket_join(rich, urgent, on="c_custkey", how="anti",
                           rows_hint=n_orders)
        parts = (kept.map_batches(seg_fold, batch_format="pandas")
                 .to_pandas())

    if parts.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="object"),
                             "numcust": pd.Series([], dtype="int64"),
                             "totacctbal": pd.Series([], dtype="float64")})
    agg = parts.groupby("c_mktsegment", as_index=False).sum()
    agg["totacctbal"] = agg["tot_cents"].map(lambda c: float(c) / 100)
    agg["numcust"] = agg["numcust"].astype("int64")
    return (agg[["c_mktsegment", "numcust", "totacctbal"]]
            .sort_values("c_mktsegment").reset_index(drop=True))


# -------------------------------------------------------------- Q15 --
def q15_top_supplier(sf_dir: str, date_from: str = "1996-01-01",
                     date_to: str = "1996-04-01") -> pd.DataFrame:
    """TPC-H Q15 shape: supplier(s) with the MAXIMUM quarter revenue —
    all ties emitted (the view+max subquery, not a LIMIT 1). Revenue
    per supplier runs as shuffle.grouped_sum over exact int64 units;
    the global max folds from per-block partial maxima (each block
    emits only its own argmax rows, so the driver sees blocks, not
    suppliers); equality against the max is integer-exact, so ties are
    bit-deterministic. Name lookup is a broadcast probe of the
    surviving keys only."""
    import ray

    from .pathlog import note
    from .queries import _rp, _rev_units, _tbl_rows, _units_2dec
    from .shuffle import grouped_sum

    lo, hi = _day(date_from), _day(date_to)
    li = _rp(sf_dir, "lineitem",
             ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        d = _days(t["l_shipdate"].to_numpy())
        keep = (d >= lo) & (d < hi)
        if not keep.any():
            return pd.DataFrame({
                "l_suppkey": pd.Series([], dtype="int64"),
                "rev_units": pd.Series([], dtype="int64")})
        df = pd.DataFrame({
            "l_suppkey": t["l_suppkey"].to_numpy()[keep],
            "rev_units": _rev_units(t["l_extendedprice"].to_numpy()[keep],
                                    t["l_discount"].to_numpy()[keep])})
        return df.groupby("l_suppkey", as_index=False).sum()

    per_supp = grouped_sum(li.map_batches(partial, batch_format="pyarrow"),
                           keys="l_suppkey", sum_cols="rev_units",
                           rows_hint=_tbl_rows(sf_dir, "lineitem"))

    def block_max(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df[df["rev_units"] == df["rev_units"].max()]

    cand = (per_supp.map_batches(block_max, batch_format="pandas")
            .to_pandas())
    note("q15", "grouped_sum+blockmax", n_cand=len(cand))
    if cand.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "total_revenue": pd.Series([], dtype="float64")})
    best = int(cand["rev_units"].max())
    win = cand[cand["rev_units"] == best]
    skeys = np.sort(win["l_suppkey"].to_numpy(np.int64))
    sref = ray.put(skeys)

    supp = _rp(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def pick(t: pa.Table) -> pd.DataFrame:
        sk = ray.get(sref)
        _, hit = _probe(t["s_suppkey"].to_numpy(), sk)
        return t.to_pandas()[hit]

    names = supp.map_batches(pick, batch_format="pyarrow").to_pandas()
    out = names.merge(win.rename(columns={"l_suppkey": "s_suppkey"}),
                      on="s_suppkey")
    out["total_revenue"] = np.asarray(
        _units_2dec(out["rev_units"].to_numpy()), dtype=np.float64)
    return (out[["s_suppkey", "s_name", "total_revenue"]]
            .sort_values("s_suppkey").reset_index(drop=True))


# -------------------------------------------------------------- Q21 --
def q21_suppliers_kept_waiting(sf_dir: str, late_days: int = 30,
                               k: int = 100,
                               small_threshold: int = 5_000_000
                               ) -> pd.DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finished ('F') orders ("late" = shipped >=
    orderdate + late_days; this schema has no receipt/commit dates).
    The triple-EXISTS collapses to two chained grouped_sum exchanges
    with a masked-key trick — per (order, supplier): late_cnt; per
    order: n_supp, n_late_supp, and winner = SUM(suppkey * is_late)
    (exactly the sole late supplier when n_late_supp == 1, the only
    case consulted) — so the whole query is three SUM aggregations, no
    per-order co-group materialization. The oracle mirrors the same
    masked-sum formulation (provably equivalent to the EXISTS form).
    Order attach is the dual-path broadcast / bucket-join idiom; the
    top-k cut orders by (numwait DESC, s_suppkey) — supplier names are
    zero-padded, so name order IS key order."""
    import pyarrow.parquet as pq
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _tbl_rows
    from .shuffle import grouped_sum

    n_orders = _tbl_rows(sf_dir, "orders")
    li = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_shipdate"])

    if n_orders is not None and n_orders <= small_threshold:
        note("q21", "fused_broadcast", n_orders=n_orders)
        o = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
        ).to_pandas()
        o = o[o["o_orderstatus"] == "F"]
        o = o.assign(odays=_days(o["o_orderdate"]))
        ref = _put_sorted(o, "o_orderkey", "odays")

        def annotate(t: pa.Table) -> pd.DataFrame:
            ok, od = ray.get(ref)
            lk = t["l_orderkey"].to_numpy()
            pos, hit = _probe(lk, ok)
            if not hit.any():
                return pd.DataFrame({
                    "l_orderkey": pd.Series([], dtype="int64"),
                    "l_suppkey": pd.Series([], dtype="int64"),
                    "late": pd.Series([], dtype="int64")})
            late = (_days(t["l_shipdate"].to_numpy())[hit]
                    >= od[pos[hit]] + late_days).astype(np.int64)
            return pd.DataFrame({
                "l_orderkey": lk[hit],
                "l_suppkey": t["l_suppkey"].to_numpy()[hit],
                "late": late})

        ann = li.map_batches(annotate, batch_format="pyarrow")
    else:
        note("q21", "bucket_join", n_orders=n_orders)
        orders = _rp(sf_dir, "orders",
                     ["o_orderkey", "o_orderdate", "o_orderstatus"])

        def omap(df: pd.DataFrame) -> pd.DataFrame:
            keep = df["o_orderstatus"].to_numpy() == "F"
            return pd.DataFrame({
                "l_orderkey": df["o_orderkey"].to_numpy()[keep],
                "odays": _days(df["o_orderdate"].to_numpy())[keep]})

        o_map = orders.map_batches(omap, batch_format="pandas")

        def lrows(t: pa.Table) -> pd.DataFrame:
            return pd.DataFrame({
                "l_orderkey": t["l_orderkey"].to_numpy(),
                "l_suppkey": t["l_suppkey"].to_numpy(),
                "sdays": _days(t["l_shipdate"].to_numpy())})

        def mark(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "l_suppkey": df["l_suppkey"].to_numpy(),
                "late": (df["sdays"].to_numpy()
                         >= df["odays"].to_numpy()
                         + late_days).astype(np.int64)})

        ann = (bucket_join(li.map_batches(lrows, batch_format="pyarrow"),
                           o_map, on="l_orderkey", rows_hint=n_orders)
               .map_batches(mark, batch_format="pandas"))

    per_os = grouped_sum(ann, keys=["l_orderkey", "l_suppkey"],
                         sum_cols="late",
                         rows_hint=_tbl_rows(sf_dir, "lineitem"))

    def order_stats(df: pd.DataFrame) -> pd.DataFrame:
        is_late = (df["late"].to_numpy(np.int64) > 0).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(),
            "n_supp": np.ones(len(df), dtype=np.int64),
            "n_late": is_late,
            "wsupp": df["l_suppkey"].to_numpy(np.int64) * is_late})

    per_o = grouped_sum(
        per_os.map_batches(order_stats, batch_format="pandas"),
        keys="l_orderkey", sum_cols=["n_supp", "n_late", "wsupp"],
        rows_hint=n_orders)

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        q = df[(df["n_supp"] > 1) & (df["n_late"] == 1)]
        out = (q.groupby("wsupp", as_index=False).size()
               .rename(columns={"wsupp": "s_suppkey", "size": "numwait"}))
        out["numwait"] = out["numwait"].astype("int64")
        return out

    per_supp = grouped_sum(
        per_o.map_batches(winners, batch_format="pandas"),
        keys="s_suppkey", sum_cols="numwait",
        rows_hint=_tbl_rows(sf_dir, "supplier"))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["numwait", "s_suppkey"],
                              ascending=[False, True]).head(k)

    cand = (per_supp.map_batches(topk, batch_format="pandas")
            .to_pandas())
    if cand.empty:
        return pd.DataFrame({"s_name": pd.Series([], dtype="object"),
                             "numwait": pd.Series([], dtype="int64")})
    cand = (cand.sort_values(["numwait", "s_suppkey"],
                             ascending=[False, True])
            .head(k).reset_index(drop=True))
    skeys = np.sort(cand["s_suppkey"].to_numpy(np.int64))
    sref = ray.put(skeys)

    supp = _rp(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def pick(t: pa.Table) -> pd.DataFrame:
        sk = ray.get(sref)
        _, hit = _probe(t["s_suppkey"].to_numpy(), sk)
        return t.to_pandas()[hit]

    names = supp.map_batches(pick, batch_format="pyarrow").to_pandas()
    out = cand.merge(names, on="s_suppkey")
    return (out[["s_name", "numwait"]]
            .sort_values(["numwait", "s_name"], ascending=[False, True])
            .reset_index(drop=True))


# -------------------------------------------------------------- Q16 --
_Q16_SIZES = (1, 4, 9, 14, 19, 24, 29, 34)


def q16_part_supplier_counts(sf_dir: str, exclude_type: str = "PROMO",
                             small_threshold: int = 5_000_000
                             ) -> pd.DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers shipped parts of
    each (brand, type, size) cell — excluding negative-balance
    suppliers (the schema has no supplier comments, so the "complaint"
    exclusion becomes s_acctbal < 0) and an excluded part type +
    size-IN list. lineitem is the partsupp stand-in. Two grouped_sum
    exchanges do all the work: distinct (partkey, suppkey) pairs
    first (raw rows collapse map-side), then distinct (cell, suppkey)
    after the attr attach; the per-cell COUNT(DISTINCT) is then a plain
    row count. The exclusion set is a driver fold over the scanned
    negative-balance keys (a constant fraction of suppliers); part
    attrs attach via the dual broadcast / bucket-join path."""
    import pyarrow.parquet as pq
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _tbl_rows
    from .shuffle import grouped_sum

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pair_ones(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"l_partkey": t["l_partkey"].to_numpy(),
                           "l_suppkey": t["l_suppkey"].to_numpy()})
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False).size()
        return (g.rename(columns={"size": "one"})
                .astype({"one": "int64"}).assign(one=1))

    pairs = grouped_sum(li.map_batches(pair_ones, batch_format="pyarrow"),
                        keys=["l_partkey", "l_suppkey"], sum_cols="one",
                        rows_hint=_tbl_rows(sf_dir, "lineitem"))

    # negative-balance supplier keys: distributed scan, driver fold
    supp = _rp(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])

    def neg_keys(t: pa.Table) -> pd.DataFrame:
        bal = t["s_acctbal"].to_numpy()
        return pd.DataFrame({"s_suppkey": np.unique(
            t["s_suppkey"].to_numpy()[bal < 0]).astype(np.int64)})

    bad = np.unique(np.concatenate(
        [b["s_suppkey"].to_numpy()
         for b in supp.map_batches(neg_keys, batch_format="pyarrow")
         .iter_batches(batch_format="pandas", batch_size=None)
         if "s_suppkey" in b.columns] or [np.empty(0, np.int64)]))
    bref = ray.put(bad)

    def drop_bad(df: pd.DataFrame) -> pd.DataFrame:
        bk = ray.get(bref)
        _, hit = _probe(df["l_suppkey"].to_numpy(np.int64), bk)
        return df[~hit][["l_partkey", "l_suppkey"]]

    good = pairs.map_batches(drop_bad, batch_format="pandas")

    sizes = np.array(_Q16_SIZES, dtype=np.int64)
    n_part = _tbl_rows(sf_dir, "part")

    def attr_filter(df: pd.DataFrame) -> pd.DataFrame:
        keep = ((df["p_type"].to_numpy() != exclude_type)
                & np.isin(df["p_size"].to_numpy(np.int64), sizes))
        out = df[keep]
        return pd.DataFrame({
            "l_partkey": out["p_partkey"].to_numpy(),
            "p_brand": out["p_brand"].to_numpy(),
            "p_type": out["p_type"].to_numpy(),
            "p_size": out["p_size"].to_numpy(np.int64)})

    if n_part is not None and n_part <= small_threshold:
        note("q16", "broadcast_attrs", n_part=n_part)
        p = attr_filter(pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_type",
                     "p_size"]).to_pandas())
        pref = ray.put(p)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(ray.get(pref), on="l_partkey")

        cells_rows = good.map_batches(attach, batch_format="pandas")
    else:
        note("q16", "bucket_join_attrs", n_part=n_part)
        part = _rp(sf_dir, "part",
                   ["p_partkey", "p_brand", "p_type", "p_size"])
        attrs = part.map_batches(attr_filter, batch_format="pandas")
        cells_rows = bucket_join(good, attrs, on="l_partkey",
                                 rows_hint=n_part)

    def cell_ones(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "p_brand" not in df.columns:
            return pd.DataFrame({
                "p_brand": pd.Series([], dtype="object"),
                "p_type": pd.Series([], dtype="object"),
                "p_size": pd.Series([], dtype="int64"),
                "l_suppkey": pd.Series([], dtype="int64"),
                "one": pd.Series([], dtype="int64")})
        g = (df.groupby(["p_brand", "p_type", "p_size", "l_suppkey"],
                        as_index=False).size()
             .rename(columns={"size": "one"}))
        return g.astype({"one": "int64"}).assign(one=1)

    cell_supp = grouped_sum(
        cells_rows.map_batches(cell_ones, batch_format="pandas"),
        keys=["p_brand", "p_type", "p_size", "l_suppkey"],
        sum_cols="one", rows_hint=n_part)

    def cell_count(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["p_brand", "p_type", "p_size"], as_index=False)
             .size().rename(columns={"size": "supplier_cnt"}))
        return g.astype({"supplier_cnt": "int64"})

    parts = (cell_supp.map_batches(cell_count, batch_format="pandas")
             .to_pandas())
    if parts.empty or "p_brand" not in parts.columns:
        return pd.DataFrame({
            "p_brand": pd.Series([], dtype="object"),
            "p_type": pd.Series([], dtype="object"),
            "p_size": pd.Series([], dtype="int64"),
            "supplier_cnt": pd.Series([], dtype="int64")})
    agg = (parts.groupby(["p_brand", "p_type", "p_size"], as_index=False)
           ["supplier_cnt"].sum())
    agg["supplier_cnt"] = agg["supplier_cnt"].astype("int64")
    agg["p_size"] = agg["p_size"].astype("int64")
    return (agg.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True))


# -------------------------------------------------------------- Q20 --
def q20_excess_shippers(sf_dir: str, part_type: str = "SMALL",
                        year: int = 1996, nationkey: int = 3,
                        small_threshold: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped MORE THAN
    HALF of some candidate part's total `year` volume (the available-
    quantity comparison, re-expressed over lineitem since the schema
    has no partsupp). Per-(part, supplier) volumes and per-part totals
    are two grouped_sum exchanges in exact q100 integer units; the
    majority test 2*q > total is integer-exact. Totals attach via the
    dual driver-broadcast / bucket-join path; the nation+name lookup
    ships only the one nation's suppliers."""
    import pyarrow.parquet as pq
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _tbl_rows
    from .shuffle import grouped_sum

    lo, hi = _day(f"{year}-01-01"), _day(f"{year + 1}-01-01")
    p = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_type"]).to_pandas()
    cand = np.sort(p.loc[p["p_type"] == part_type, "p_partkey"]
                   .to_numpy(np.int64))
    cref = ray.put(cand)

    li = _rp(sf_dir, "lineitem",
             ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ck = ray.get(cref)
        d = _days(t["l_shipdate"].to_numpy())
        keep = (d >= lo) & (d < hi)
        pk = t["l_partkey"].to_numpy()
        _, hit = _probe(pk, ck)
        keep &= hit
        if not keep.any():
            return pd.DataFrame({
                "l_partkey": pd.Series([], dtype="int64"),
                "l_suppkey": pd.Series([], dtype="int64"),
                "q": pd.Series([], dtype="int64")})
        df = pd.DataFrame({
            "l_partkey": pk[keep],
            "l_suppkey": t["l_suppkey"].to_numpy()[keep],
            "q": np.rint(t["l_quantity"].to_numpy()[keep] * 100)
            .astype(np.int64)})
        return df.groupby(["l_partkey", "l_suppkey"],
                          as_index=False).sum()

    agg = grouped_sum(li.map_batches(partial, batch_format="pyarrow"),
                      keys=["l_partkey", "l_suppkey"], sum_cols="q",
                      rows_hint=_tbl_rows(sf_dir, "lineitem"))

    n_part = _tbl_rows(sf_dir, "part")
    totals = grouped_sum(
        agg.map_batches(
            lambda df: df[["l_partkey", "q"]].rename(
                columns={"q": "tq"}),
            batch_format="pandas"),
        keys="l_partkey", sum_cols="tq", rows_hint=n_part)

    if n_part is not None and n_part <= small_threshold:
        note("q20", "broadcast_totals", n_part=n_part)
        tdf = totals.to_pandas()
        if tdf.empty or "l_partkey" not in tdf.columns:
            win = np.empty(0, np.int64)
        else:
            tdf = tdf.sort_values("l_partkey")
            tref = ray.put((
                np.ascontiguousarray(tdf["l_partkey"].to_numpy(np.int64)),
                np.ascontiguousarray(tdf["tq"].to_numpy(np.int64))))

            def majority(df: pd.DataFrame) -> pd.DataFrame:
                tk, tq = ray.get(tref)
                pos, hit = _probe(df["l_partkey"].to_numpy(np.int64), tk)
                big = hit & (2 * df["q"].to_numpy(np.int64) > tq[pos])
                return pd.DataFrame({"l_suppkey": np.unique(
                    df["l_suppkey"].to_numpy(np.int64)[big])})

            win = np.unique(np.concatenate(
                [b["l_suppkey"].to_numpy()
                 for b in agg.map_batches(majority, batch_format="pandas")
                 .iter_batches(batch_format="pandas", batch_size=None)
                 if "l_suppkey" in b.columns] or [np.empty(0, np.int64)]))
    else:
        note("q20", "bucket_join_totals", n_part=n_part)
        joined = bucket_join(agg, totals, on="l_partkey",
                             rows_hint=n_part)

        def majority(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "tq" not in df.columns:
                return pd.DataFrame(
                    {"l_suppkey": pd.Series([], dtype="int64")})
            big = 2 * df["q"].to_numpy(np.int64) > df["tq"].to_numpy(
                np.int64)
            return pd.DataFrame({"l_suppkey": np.unique(
                df["l_suppkey"].to_numpy(np.int64)[big])})

        win = np.unique(np.concatenate(
            [b["l_suppkey"].to_numpy()
             for b in joined.map_batches(majority, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=None)
             if "l_suppkey" in b.columns] or [np.empty(0, np.int64)]))

    s = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                      columns=["s_suppkey", "s_name",
                               "s_nationkey"]).to_pandas()
    s = s[(s["s_nationkey"] == nationkey)
          & s["s_suppkey"].isin(win)]
    return (s[["s_suppkey", "s_name"]].sort_values("s_suppkey")
            .reset_index(drop=True))


# --------------------------------------------------------------- Q6 --
def q6_forecast_revenue(sf_dir: str, year: int = 1996,
                        disc_lo: int = 5, disc_hi: int = 7,
                        max_qty: int = 24) -> pd.DataFrame:
    """TPC-H Q6 shape: revenue increase if small-quantity discounts in
    a band were dropped — SUM(extendedprice * discount) under three
    scan predicates. One fused pass, one int64 per batch, zero
    exchanges at any scale; the discount band compares exact
    hundredths (rint(d*100)), and revenue accumulates in exact
    1e-4-dollar units (cents x discount-hundredths), mirrored by the
    identical integer SQL."""
    from .queries import _rp, _units_2dec

    lo, hi = _day(f"{year}-01-01"), _day(f"{year + 1}-01-01")
    li = _rp(sf_dir, "lineitem",
             ["l_quantity", "l_extendedprice", "l_discount",
              "l_shipdate"])

    def fused(t: pa.Table) -> pd.DataFrame:
        d = _days(t["l_shipdate"].to_numpy())
        d100 = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        keep = ((d >= lo) & (d < hi)
                & (d100 >= disc_lo) & (d100 <= disc_hi)
                & (t["l_quantity"].to_numpy() < max_qty))
        if not keep.any():
            return pd.DataFrame({"u": pd.Series([], dtype="int64")})
        cents = np.rint(t["l_extendedprice"].to_numpy()[keep] * 100
                        ).astype(np.int64)
        return pd.DataFrame({"u": [int((cents * d100[keep]).sum())]})

    parts = li.map_batches(fused, batch_format="pyarrow").to_pandas()
    units = int(parts["u"].sum()) if "u" in parts.columns else 0
    return pd.DataFrame(
        {"revenue": [float(_units_2dec(np.array([units]))[0])]})


# --------------------------------------------------------------- Q8 --
def q8_market_share(sf_dir: str, region: str = "MIDDLE EAST",
                    nationkey: int = 3, part_type: str = "STANDARD",
                    year_lo: int = 1995, year_hi: int = 1996,
                    small_threshold: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q8 shape: per order-year, the share of one nation's
    suppliers in a region's market for one part type (the only
    remaining TPC-H query expressible without partsupp). Numerator and
    denominator are exact int64 unit sums per (year, is_nation) slot;
    the share divides them in float64 with a DOUBLE-cast mirror.
    Small path: three broadcasts (candidate partkeys; orderkey ->
    (year, customer-in-region); suppkey -> is-nation) and ONE fused
    lineitem pass, zero exchanges. Large path: lineitem partials
    bucket-join the region-filtered order map on orderkey, then the
    supplier map on suppkey — two packed exchanges, both keyed on
    corpus-partitioned ids."""
    import pyarrow.parquet as pq
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _rev_units, _tbl_rows

    NY = year_hi - year_lo + 1
    lo, hi = _day(f"{year_lo}-01-01"), _day(f"{year_hi + 1}-01-01")

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")
                           ).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")
                        ).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    in_region = set(nation.loc[nation["n_regionkey"] == rkey,
                               "n_nationkey"])

    p = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_type"]).to_pandas()
    cand = np.sort(p.loc[p["p_type"] == part_type, "p_partkey"]
                   .to_numpy(np.int64))
    pref = ray.put(cand)

    # customer -> in-region flag feeds the order map on both paths
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(in_region)][["c_custkey"]]

    n_orders = _tbl_rows(sf_dir, "orders")
    li = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_partkey", "l_suppkey",
              "l_extendedprice", "l_discount"])

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp.assign(
        isn=(supp["s_nationkey"].to_numpy() == nationkey)
        .astype(np.int8))[["s_suppkey", "isn"]]
    sref = _put_sorted(supp, "s_suppkey", "isn")

    def _order_map_frame() -> pd.DataFrame:
        o = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                          columns=["o_orderkey", "o_custkey",
                                   "o_orderdate"]).to_pandas()
        d = _days(o["o_orderdate"].to_numpy())
        o = o[(d >= lo) & (d < hi)]
        o = o.merge(cust, left_on="o_custkey", right_on="c_custkey")
        return pd.DataFrame({
            "l_orderkey": o["o_orderkey"].to_numpy(np.int64),
            "oyear": (o["o_orderdate"].to_numpy()
                      .astype("datetime64[Y]").astype(np.int64)
                      + 1970)})

    def _slots(year, isn, rev) -> pd.DataFrame:
        slot = (year - year_lo) * 2 + isn
        acc = np.zeros(2 * NY, dtype=np.int64)
        np.add.at(acc, slot, rev)
        nz = np.flatnonzero(acc)
        return pd.DataFrame({"slot": nz, "u": acc[nz]})

    if n_orders is not None and n_orders <= small_threshold:
        note("q8", "fused_broadcast", n_orders=n_orders)
        om = _order_map_frame().sort_values("l_orderkey")
        oref = ray.put((
            np.ascontiguousarray(om["l_orderkey"].to_numpy(np.int64)),
            np.ascontiguousarray(om["oyear"].to_numpy(np.int64))))

        def fused(t: pa.Table) -> pd.DataFrame:
            pk = ray.get(pref)
            ok, oy = ray.get(oref)
            sk, isn = ray.get(sref)
            _, phit = _probe(t["l_partkey"].to_numpy(), pk)
            opos, ohit = _probe(t["l_orderkey"].to_numpy(), ok)
            keep = phit & ohit
            if not keep.any():
                return pd.DataFrame({"slot": pd.Series([], dtype="int64"),
                                     "u": pd.Series([], dtype="int64")})
            spos, shit = _probe(t["l_suppkey"].to_numpy()[keep], sk)
            if not shit.all():
                raise ValueError(
                    "q8: lineitem suppkey missing from supplier (FK)")
            rev = _rev_units(t["l_extendedprice"].to_numpy()[keep],
                             t["l_discount"].to_numpy()[keep])
            return _slots(oy[opos[keep]], isn[spos].astype(np.int64),
                          rev)

        parts = li.map_batches(fused, batch_format="pyarrow").to_pandas()
    else:
        note("q8", "bucket_join", n_orders=n_orders)
        orders = _rp(sf_dir, "orders",
                     ["o_orderkey", "o_custkey", "o_orderdate"])
        crf = ray.put(cust)

        def omap(df: pd.DataFrame) -> pd.DataFrame:
            d = _days(df["o_orderdate"].to_numpy())
            keep = (d >= lo) & (d < hi)
            o = df[keep].merge(ray.get(crf), left_on="o_custkey",
                               right_on="c_custkey")
            return pd.DataFrame({
                "l_orderkey": o["o_orderkey"].to_numpy(np.int64),
                "oyear": (o["o_orderdate"].to_numpy()
                          .astype("datetime64[Y]").astype(np.int64)
                          + 1970)})

        o_map = orders.map_batches(omap, batch_format="pandas")

        def li_rows(t: pa.Table) -> pd.DataFrame:
            pk = ray.get(pref)
            _, phit = _probe(t["l_partkey"].to_numpy(), pk)
            return pd.DataFrame({
                "l_orderkey": t["l_orderkey"].to_numpy()[phit],
                "l_suppkey": t["l_suppkey"].to_numpy()[phit],
                "rev": _rev_units(t["l_extendedprice"].to_numpy()[phit],
                                  t["l_discount"].to_numpy()[phit])})

        with_year = bucket_join(
            li.map_batches(li_rows, batch_format="pyarrow"), o_map,
            on="l_orderkey", rows_hint=n_orders)

        import ray.data as rd

        smap = supp.rename(columns={"s_suppkey": "l_suppkey"})
        with_supp = bucket_join(
            with_year, rd.from_pandas(smap),
            on="l_suppkey", rows_hint=_tbl_rows(sf_dir, "supplier"))

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "oyear" not in df.columns:
                return pd.DataFrame({"slot": pd.Series([], dtype="int64"),
                                     "u": pd.Series([], dtype="int64")})
            return _slots(df["oyear"].to_numpy(np.int64),
                          df["isn"].to_numpy(np.int64),
                          df["rev"].to_numpy(np.int64))

        parts = (with_supp.map_batches(fold, batch_format="pandas")
                 .to_pandas())

    acc = np.zeros(2 * NY, dtype=np.int64)
    if not parts.empty and "slot" in parts.columns:
        np.add.at(acc, parts["slot"].to_numpy(np.int64),
                  parts["u"].to_numpy(np.int64))
    pairs = acc.reshape(NY, 2)
    tot = pairs.sum(axis=1)
    keep = tot > 0
    years = (np.arange(NY, dtype=np.int64) + year_lo)[keep]
    share = pairs[keep, 1].astype(np.float64) / tot[keep].astype(
        np.float64)
    return pd.DataFrame({"o_year": years, "mkt_share": share})


# ------------------------------------------------- derived partsupp --
# The corpus has no partsupp table, so the three remaining TPC-H
# shapes (Q2/Q9/Q11) run over a DERIVED partsupp relation that both
# sides can compute exactly:
#   pairs:       SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
#   supplycost:  a pure integer function of the keys (cents), so no
#                side ever has to ship or re-aggregate it
#   availqty:    SUM(CAST(l_quantity AS BIGINT)) per pair (quantities
#                are integral 1..50 doubles in this corpus)
# The oracle SQL inlines the identical expressions, so the derivation
# itself is hash-checked, not just the query on top of it.
_PS_A, _PS_B, _PS_M, _PS_C = 7919, 104729, 99991, 100


def _ps_cost_cents(partkey, suppkey) -> np.ndarray:
    """Key-derived supplycost (cents) of the derived partsupp. Keys
    are non-negative ids, so numpy % and DuckDB % agree; at 1e9-scale
    ids the products stay ~1e14, far inside int64."""
    return (np.asarray(partkey, np.int64) * _PS_A
            + np.asarray(suppkey, np.int64) * _PS_B) % _PS_M + _PS_C


def _pack_pair(partkey, suppkey) -> np.ndarray:
    """(partkey, suppkey) -> one int64 exchange key. Same [0, 2^31)
    guard as the triangle-closure pack (engine/queries.py,
    parts_coorder_triangles): a partkey >= 2^31 would overflow the
    int64 shift, and the arithmetic right-shift in the unpack would
    then sign-extend to a negative partkey — remap ids first."""
    pk = np.asarray(partkey, np.int64)
    sk = np.asarray(suppkey, np.int64)
    if len(pk) and (int(pk.max()) >= 2**31 or int(sk.max()) >= 2**31
                    or int(pk.min()) < 0 or int(sk.min()) < 0):
        raise ValueError(
            "partsupp pack: key outside [0, 2^31) breaks the packed "
            "(partkey<<32)|suppkey exchange key — remap ids first")
    return (pk << np.int64(32)) | sk


# --------------------------------------------------------------- Q2 --
def q2_min_cost_supplier(sf_dir: str, size_max: int = 10,
                         part_type: str = "STANDARD",
                         region: str = "EUROPE",
                         limit: int = 100) -> pd.DataFrame:
    """TPC-H Q2 shape: for small STANDARD parts, every EUROPE supplier
    whose (derived) supplycost is the region minimum for that part.
    Candidate partkeys and region suppkeys ship as two sorted-array
    broadcasts (both are filtered dimensions); ONE fused lineitem pass
    emits per-batch-distinct packed pairs, deduped across batches by a
    grouped_sum bucket exchange whose volume is bounded by
    |candidate parts| x |region suppliers| per batch — never raw rows.
    The min-per-part / tie-keeping / dimension decorate runs on the
    gathered pair set, which is the query's own output precursor
    (Q2's result is proportional to it by construction)."""
    import pyarrow.parquet as pq
    import ray

    from .queries import _rp, _tbl_rows
    from .shuffle import grouped_sum

    p = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_name", "p_type",
                               "p_size"]).to_pandas()
    cand = p[(p["p_size"] <= size_max) & (p["p_type"] == part_type)]
    cand = cand[["p_partkey", "p_name"]]

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")
                           ).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")
                        ).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nat = nation[nation["n_regionkey"] == rkey][["n_nationkey",
                                                 "n_name"]]
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet")
                         ).to_pandas()
    rs = supp.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    rs = rs[["s_suppkey", "s_name", "s_acctbal", "n_name"]]

    pref = ray.put(np.sort(cand["p_partkey"].to_numpy(np.int64)))
    sref = ray.put(np.sort(rs["s_suppkey"].to_numpy(np.int64)))

    n_li = _tbl_rows(sf_dir, "lineitem")
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        _, phit = _probe(t["l_partkey"].to_numpy(), ray.get(pref))
        _, shit = _probe(t["l_suppkey"].to_numpy(), ray.get(sref))
        keep = phit & shit
        pk = np.unique(_pack_pair(t["l_partkey"].to_numpy()[keep],
                                  t["l_suppkey"].to_numpy()[keep]))
        return pd.DataFrame({"pk": pk,
                             "one": np.ones(len(pk), np.int64)})

    dist = grouped_sum(li.map_batches(pairs, batch_format="pyarrow"),
                       keys="pk", sum_cols="one", rows_hint=n_li)
    got = dist.to_pandas()
    if got.empty or "pk" not in got.columns:
        return pd.DataFrame({
            "s_acctbal": pd.Series([], dtype="float64"),
            "s_name": pd.Series([], dtype="object"),
            "n_name": pd.Series([], dtype="object"),
            "p_partkey": pd.Series([], dtype="int64"),
            "p_name": pd.Series([], dtype="object"),
            "ps_supplycost": pd.Series([], dtype="float64")})
    pk = got["pk"].to_numpy(np.int64)
    d = pd.DataFrame({"p_partkey": pk >> np.int64(32),
                      "s_suppkey": pk & np.int64(0xFFFFFFFF)})
    d["cents"] = _ps_cost_cents(d["p_partkey"], d["s_suppkey"])
    d = d[d["cents"] == d.groupby("p_partkey")["cents"]
          .transform("min")]
    d = (d.merge(rs, on="s_suppkey").merge(cand, on="p_partkey"))
    d["ps_supplycost"] = d["cents"] / 100.0
    d = d.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                      ascending=[False, True, True, True],
                      kind="mergesort").head(limit)
    return d[["s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
              "ps_supplycost"]].reset_index(drop=True)


# --------------------------------------------------------------- Q9 --
def q9_product_profit(sf_dir: str, name_sub: str = "widget",
                      small_threshold: int = 5_000_000
                      ) -> pd.DataFrame:
    """TPC-H Q9 shape: profit by supplier nation x order year over one
    product line, where profit = revenue - (derived) supplycost x qty,
    all in exact 1e-4-dollar integer units. Because supplycost is a
    pure key function, Q9 needs NO partsupp aggregation at all — each
    lineitem row computes its own cost term in the same fused pass
    that computes revenue. Group count is bounded (25 nations x a few
    years), so per-batch partials fold on the driver on both paths.
    Small path (orders footer under threshold): orderkey->year and
    suppkey->nationkey ship as sorted broadcasts, ONE fused lineitem
    pass, zero exchanges. Large path: q8's two packed bucket joins
    (orderkey, then suppkey)."""
    import pyarrow.parquet as pq
    import ray

    from .joins import bucket_join
    from .pathlog import note
    from .queries import _rp, _rev_units, _tbl_rows

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"]
                           ).to_pandas()
    p = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_name"]).to_pandas()
    cand = np.sort(p.loc[p["p_name"].str.contains(name_sub,
                                                  regex=False),
                         "p_partkey"].to_numpy(np.int64))
    pref = ray.put(cand)

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"]
                         ).to_pandas()
    supp = supp.assign(nk=supp["s_nationkey"].astype("int64"))[
        ["s_suppkey", "nk"]]
    sref = _put_sorted(supp, "s_suppkey", "nk")

    n_orders = _tbl_rows(sf_dir, "orders")
    li = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
              "l_extendedprice", "l_discount"])

    def _units(t_or_df, keep=None) -> np.ndarray:
        g = (lambda c: t_or_df[c].to_numpy() if keep is None
             else t_or_df[c].to_numpy()[keep])
        rev = _rev_units(g("l_extendedprice"), g("l_discount"))
        cost = (_ps_cost_cents(g("l_partkey"), g("l_suppkey"))
                * np.rint(g("l_quantity")).astype(np.int64) * 100)
        return rev - cost

    def _partial(nk, oy, u) -> pd.DataFrame:
        df = pd.DataFrame({"nk": nk, "o_year": oy, "u": u})
        return df.groupby(["nk", "o_year"], as_index=False)["u"].sum()

    if n_orders is not None and n_orders <= small_threshold:
        note("q9", "fused_broadcast", n_orders=n_orders)
        o = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                          columns=["o_orderkey", "o_orderdate"]
                          ).to_pandas()
        om = pd.DataFrame({
            "k": o["o_orderkey"].to_numpy(np.int64),
            "oyear": (o["o_orderdate"].to_numpy()
                      .astype("datetime64[Y]").astype(np.int64)
                      + 1970)}).sort_values("k")
        oref = ray.put((np.ascontiguousarray(om["k"].to_numpy()),
                        np.ascontiguousarray(om["oyear"].to_numpy())))

        def fused(t: pa.Table) -> pd.DataFrame:
            _, phit = _probe(t["l_partkey"].to_numpy(),
                             ray.get(pref))
            if not phit.any():
                return _partial(np.array([], np.int64),
                                np.array([], np.int64),
                                np.array([], np.int64))
            ok, oy = ray.get(oref)
            opos, ohit = _probe(t["l_orderkey"].to_numpy()[phit], ok)
            sk, nk = ray.get(sref)
            spos, shit = _probe(t["l_suppkey"].to_numpy()[phit], sk)
            if not (ohit.all() and shit.all()):
                raise ValueError("q9: lineitem FK missing from "
                                 "orders/supplier")
            return _partial(nk[spos], oy[opos], _units(t, phit))

        parts = li.map_batches(fused, batch_format="pyarrow"
                               ).to_pandas()
    else:
        note("q9", "bucket_join", n_orders=n_orders)
        import ray.data as rd

        orders = _rp(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

        def omap(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "oyear": (df["o_orderdate"].to_numpy()
                          .astype("datetime64[Y]").astype(np.int64)
                          + 1970)})

        def li_rows(t: pa.Table) -> pd.DataFrame:
            _, phit = _probe(t["l_partkey"].to_numpy(),
                             ray.get(pref))
            return pd.DataFrame({
                "l_orderkey": t["l_orderkey"].to_numpy()[phit],
                "l_suppkey": t["l_suppkey"].to_numpy()[phit],
                "u": _units(t, phit)})

        with_year = bucket_join(
            li.map_batches(li_rows, batch_format="pyarrow"),
            orders.map_batches(omap, batch_format="pandas"),
            on="l_orderkey", rows_hint=n_orders)
        smap = supp.rename(columns={"s_suppkey": "l_suppkey"})
        with_supp = bucket_join(
            with_year, rd.from_pandas(smap), on="l_suppkey",
            rows_hint=_tbl_rows(sf_dir, "supplier"))

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "oyear" not in df.columns:
                return _partial(np.array([], np.int64),
                                np.array([], np.int64),
                                np.array([], np.int64))
            return _partial(df["nk"].to_numpy(np.int64),
                            df["oyear"].to_numpy(np.int64),
                            df["u"].to_numpy(np.int64))

        parts = (with_supp.map_batches(fold, batch_format="pandas")
                 .to_pandas())

    if parts.empty or "nk" not in parts.columns:
        return pd.DataFrame({
            "n_name": pd.Series([], dtype="object"),
            "o_year": pd.Series([], dtype="int64"),
            "sum_profit": pd.Series([], dtype="float64")})
    agg = parts.groupby(["nk", "o_year"], as_index=False)["u"].sum()
    agg = agg.merge(nation, left_on="nk", right_on="n_nationkey")
    agg["sum_profit"] = agg["u"].to_numpy(np.int64) / 10000.0
    agg = agg.sort_values(["n_name", "o_year"],
                          ascending=[True, False], kind="mergesort")
    return agg[["n_name", "o_year", "sum_profit"]].reset_index(
        drop=True)


# -------------------------------------------------------------- Q11 --
def q11_important_stock(sf_dir: str, nation: str = "NATION_18",
                        mult: int = 2) -> pd.DataFrame:
    """TPC-H Q11 shape: parts whose (derived) stock value held by one
    nation's suppliers exceeds mult x the nation's AVERAGE per-part
    value. TPC-H scales its fixed fraction by 1/SF for exactly this
    reason — a constant fraction degenerates as the part space grows
    (1/1000 kept 162 parts at sf0.001 and ZERO at sf0.1); the
    average-relative form is scale-free at any corpus size.
    availqty = SUM(qty) per (part, supplier) pair runs as per-batch
    Arrow partials -> ONE grouped_sum bucket exchange on the packed
    pair key; a second grouped_sum folds pair values (cost x qty
    cents) per part. The global total and part count fold from
    per-batch one-row partials, then the threshold compares EXACT
    integers (value * count > mult * total), so partial-sum order can
    never flip a boundary part. Only qualifying rows (the query's
    actual output) gather."""
    import pyarrow.parquet as pq
    import ray

    from .queries import _rp, _tbl_rows
    from .shuffle import grouped_sum

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")
                        ).to_pandas()
    nkey = int(nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0])
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"]
                         ).to_pandas()
    sref = ray.put(np.sort(
        supp.loc[supp["s_nationkey"] == nkey, "s_suppkey"]
        .to_numpy(np.int64)))

    n_li = _tbl_rows(sf_dir, "lineitem")
    li = _rp(sf_dir, "lineitem",
             ["l_partkey", "l_suppkey", "l_quantity"])

    def pair_qty(t: pa.Table) -> pd.DataFrame:
        _, shit = _probe(t["l_suppkey"].to_numpy(), ray.get(sref))
        pk = _pack_pair(t["l_partkey"].to_numpy()[shit],
                        t["l_suppkey"].to_numpy()[shit])
        qty = np.rint(t["l_quantity"].to_numpy()[shit]).astype(
            np.int64)
        df = pd.DataFrame({"pk": pk, "qty": qty})
        return df.groupby("pk", as_index=False)["qty"].sum()

    pairs = grouped_sum(
        li.map_batches(pair_qty, batch_format="pyarrow"),
        keys="pk", sum_cols="qty", rows_hint=n_li)

    def pair_value(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "pk" not in df.columns:
            return pd.DataFrame({
                "ps_partkey": pd.Series([], dtype="int64"),
                "cents": pd.Series([], dtype="int64")})
        pk = df["pk"].to_numpy(np.int64)
        part = pk >> np.int64(32)
        cost = _ps_cost_cents(part, pk & np.int64(0xFFFFFFFF))
        return pd.DataFrame({"ps_partkey": part,
                             "cents": cost * df["qty"]
                             .to_numpy(np.int64)})

    per_part = grouped_sum(
        pairs.map_batches(pair_value, batch_format="pandas"),
        keys="ps_partkey", sum_cols="cents",
        rows_hint=n_li).materialize()

    def tot_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "cents" not in df.columns:
            return pd.DataFrame({"t": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.DataFrame({"t": [int(df["cents"].sum())],
                             "n": [len(df)]})

    tp = per_part.map_batches(tot_partial, batch_format="pandas"
                              ).to_pandas()
    total = int(tp["t"].sum()) if "t" in tp.columns else 0
    count = int(tp["n"].sum()) if "n" in tp.columns else 0

    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "cents" not in df.columns:
            return pd.DataFrame({
                "ps_partkey": pd.Series([], dtype="int64"),
                "value": pd.Series([], dtype="float64")})
        keep = (df["cents"].to_numpy(np.int64) * count
                > mult * total)
        d = df[keep]
        return pd.DataFrame({
            "ps_partkey": d["ps_partkey"].to_numpy(np.int64),
            "value": d["cents"].to_numpy(np.int64) / 100.0})

    out = per_part.map_batches(qualify, batch_format="pandas"
                               ).to_pandas()
    if out.empty or "value" not in out.columns:
        return pd.DataFrame({
            "ps_partkey": pd.Series([], dtype="int64"),
            "value": pd.Series([], dtype="float64")})
    return out.sort_values(["value", "ps_partkey"],
                           ascending=[False, True], kind="mergesort"
                           ).reset_index(drop=True)


TPCH2_QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q12_priority_by_flag": q12_priority_by_flag,
    "q13_order_distribution": q13_order_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_bracket_revenue": q19_bracket_revenue,
    "q22_idle_balances": q22_idle_balances,
    "q15_top_supplier": q15_top_supplier,
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q20_excess_shippers": q20_excess_shippers,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q8_market_share": q8_market_share,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
}
