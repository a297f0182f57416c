"""Branch-equality and edge-case tests for the second-wave TPC-H
analogs (engine/tpch2.py). The oracle equality itself is covered by
the auto-parameterized driver mimic in test_queries_oracle.py — these
tests force the non-default execution paths."""

import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("fn_name", [
    "q4_order_priority", "q12_priority_by_flag",
    "q14_promo_revenue", "q22_idle_balances",
    "q16_part_supplier_counts", "q20_excess_shippers",
    "q8_market_share", "q9_product_profit",
])
def test_distributed_branch_matches(ray_session, fn_name):
    """small_threshold=0 forces the packed bucket-join / anti-join
    branch; result must equal the fused broadcast path (whose oracle
    equality test_queries_oracle already proves)."""
    import engine.tpch2 as t

    fn = getattr(t, fn_name)
    fast = fn(SF_DIR)
    dist = fn(SF_DIR, small_threshold=0)
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, dist)


def test_q18_empty_survivor_schema(ray_session):
    """An unreachable quantity threshold returns the typed empty frame
    (stable schema for the driver), not a KeyError on missing cols."""
    from engine.tpch2 import q18_large_orders

    out = q18_large_orders(SF_DIR, min_qty=10**9)
    assert len(out) == 0
    assert list(out.columns) == ["c_name", "c_custkey", "o_orderkey",
                                 "o_orderdate", "o_totalprice", "sum_qty"]


def test_q18_tiebreak_is_orderkey_stable(ray_session):
    """The k-boundary cut is deterministic: re-running yields the
    identical frame (ORDER BY totalprice DESC, orderdate, orderkey)."""
    from engine.tpch2 import q18_large_orders

    a = q18_large_orders(SF_DIR, min_qty=100, k=20)
    b = q18_large_orders(SF_DIR, min_qty=100, k=20)
    pd.testing.assert_frame_equal(a, b)
    assert (a["o_totalprice"].to_numpy()[:-1]
            >= a["o_totalprice"].to_numpy()[1:]).all()


def test_q17_integer_threshold_vs_float_reference(ray_session):
    """The exact cross-multiply small-quantity test agrees with a
    direct float evaluation on this data (quantities are integral, so
    no boundary ambiguity exists here) — guards the scaling math."""
    import pyarrow.parquet as pq

    from engine.tpch2 import q17_small_qty_revenue

    got = float(q17_small_qty_revenue(SF_DIR)["avg_yearly"].iloc[0])

    li = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"),
                       columns=["l_partkey", "l_quantity",
                                "l_extendedprice"]).to_pandas()
    p = pq.read_table(os.path.join(SF_DIR, "part.parquet"),
                      columns=["p_partkey", "p_type",
                               "p_size"]).to_pandas()
    cand = set(p.loc[(p["p_type"] == "SMALL")
                     & (p["p_size"] < 25), "p_partkey"])
    li = li[li["l_partkey"].isin(cand)]
    avg = li.groupby("l_partkey")["l_quantity"].transform("mean")
    ref = li.loc[li["l_quantity"] < 0.5 * avg, "l_extendedprice"].sum() / 7
    assert got == pytest.approx(ref, abs=1e-6)


def test_q12_fk_violation_raises(ray_session, tmp_path):
    """A lineitem orderkey absent from orders must raise, not count
    silently under an arbitrary priority (q10's FK guard discipline)."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    from engine.tpch2 import q12_priority_by_flag

    d = tmp_path / "sf"
    d.mkdir()
    for t in ["orders", "lineitem"]:
        tbl = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        pq.write_table(tbl, d / f"{t}.parquet")
    li = pq.read_table(d / "lineitem.parquet").to_pandas()
    li.loc[li.index[:1], "l_orderkey"] = 10**12  # orphan key
    # make sure the orphan row passes the year filter
    li.loc[li.index[:1], "l_shipdate"] = np.datetime64("1997-06-01", "us")
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   d / "lineitem.parquet")
    # Ray surfaces worker exceptions as RayTaskError wrapping the
    # original — match on the message, not the leaf type
    with pytest.raises(Exception, match="FK"):
        q12_priority_by_flag(str(d))


def test_q21_distributed_branch_matches(ray_session):
    """small_threshold=0 forces the bucket-join order-attach branch;
    the two chained grouped_sum stages must produce the identical
    top-k frame."""
    from engine.tpch2 import q21_suppliers_kept_waiting

    fast = q21_suppliers_kept_waiting(SF_DIR)
    dist = q21_suppliers_kept_waiting(SF_DIR, small_threshold=0)
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, dist)


def test_q15_emits_all_max_ties(ray_session):
    """Q15's contract is ALL suppliers at the max (view + subquery,
    not LIMIT 1): with the window widened to the whole corpus every
    returned row must carry the same revenue, and that revenue must be
    the global per-supplier max."""
    from engine.tpch2 import q15_top_supplier

    out = q15_top_supplier(SF_DIR, date_from="1995-01-01",
                           date_to="2002-01-01")
    assert len(out) >= 1
    assert out["total_revenue"].nunique() == 1
    assert (out["s_suppkey"].to_numpy()[:-1]
            < out["s_suppkey"].to_numpy()[1:]).all()


def test_grouped_sum_survives_empty_pandas_blocks(ray_session):
    """Ray passes EMPTY pandas blocks through map_batches output
    conversion untouched, so to_arrow_refs can hand grouped_sum's
    driver fold a raw DataFrame (observed via bucket_join's pandas
    merge output in q21's forced branch) — the fold must skip/convert,
    not crash on .num_rows."""
    import ray.data as rd

    from engine.shuffle import grouped_sum

    ds = rd.from_pandas([pd.DataFrame({"k": [1, 1, 2], "v": [1, 2, 3]}),
                         pd.DataFrame({"k": [], "v": []})])
    out = grouped_sum(ds, keys="k", sum_cols="v").to_pandas()
    got = dict(zip(out["k"].astype(int), out["v"].astype(int)))
    assert got == {1: 3, 2: 3}


def test_empty_result_paths_are_typed(ray_session):
    """Predicates that match nothing must return the typed empty/NaN
    shape, not crash on the all-empty-block to_pandas column drop or
    on column-less passthrough blocks in the driver folds."""
    from engine.tpch2 import (q4_order_priority, q14_promo_revenue,
                              q15_top_supplier, q17_small_qty_revenue)

    out4 = q4_order_priority(SF_DIR, date_from="1970-01-01",
                             date_to="1970-02-01")
    assert len(out4) == 0
    assert list(out4.columns) == ["o_orderpriority", "order_count"]

    out14 = q14_promo_revenue(SF_DIR, month="1970-01")
    assert len(out14) == 1 and np.isnan(out14["promo_pct"].iloc[0])

    out15 = q15_top_supplier(SF_DIR, date_from="1970-01-01",
                             date_to="1970-02-01")
    assert len(out15) == 0

    out17 = q17_small_qty_revenue(SF_DIR, part_type="NO_SUCH_TYPE")
    assert len(out17) == 1 and np.isnan(out17["avg_yearly"].iloc[0])


@pytest.mark.parametrize("fn_name", [
    "q13_order_distribution", "q18_large_orders",
    "q21_suppliers_kept_waiting", "q2_min_cost_supplier",
    "q11_important_stock",
])
def test_gsum_bucket_exchange_matches(ray_session, fn_name,
                                      monkeypatch):
    """GRAFT_GSUM_DRIVER=0 forces grouped_sum's bucketed hash exchange
    (instead of the driver fold) for every aggregation stage inside
    the query — results must be identical."""
    import engine.tpch2 as t

    fn = getattr(t, fn_name)
    fast = fn(SF_DIR)
    monkeypatch.setenv("GRAFT_GSUM_DRIVER", "0")
    dist = fn(SF_DIR)
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, dist)


def test_q13_zero_order_customers_counted(ray_session):
    """custdist totals must cover EVERY customer (zero-count bucket
    synthesized from the footer row count)."""
    import pyarrow.parquet as pq

    from engine.tpch2 import q13_order_distribution

    out = q13_order_distribution(SF_DIR)
    n_cust = pq.read_metadata(
        os.path.join(SF_DIR, "customer.parquet")).num_rows
    assert int(out["custdist"].sum()) == n_cust


def test_pack_pair_guards_32bit_keys():
    """The packed (partkey, suppkey) exchange key must refuse ids that
    would collide in the 32/32 split (same discipline as the triangle
    pack in engine/graphalgo.py)."""
    from engine.tpch2 import _pack_pair

    ok = _pack_pair(np.array([1, 2]), np.array([3, 4]))
    assert ok.tolist() == [(1 << 32) | 3, (2 << 32) | 4]
    # 2^31 would overflow the int64 shift and sign-extend on unpack
    with pytest.raises(ValueError):
        _pack_pair(np.array([2**31]), np.array([0]))
    with pytest.raises(ValueError):
        _pack_pair(np.array([0]), np.array([2**31]))
    with pytest.raises(ValueError):
        _pack_pair(np.array([0]), np.array([-1]))
    # the largest legal pair round-trips through pack/unpack exactly
    big = _pack_pair(np.array([2**31 - 1]), np.array([2**31 - 1]))
    assert int(big[0]) >> 32 == 2**31 - 1
    assert int(big[0]) & 0xFFFFFFFF == 2**31 - 1


def test_q2_keeps_all_min_cost_ties(ray_session):
    """Every supplier attaining a part's regional minimum supplycost
    appears — per part, all emitted costs equal that part's min."""
    from engine.tpch2 import q2_min_cost_supplier

    out = q2_min_cost_supplier(SF_DIR, size_max=30)
    assert len(out) > 0
    per_part = out.groupby("p_partkey")["ps_supplycost"]
    assert (per_part.transform("min") == out["ps_supplycost"]).all()


def test_q11_threshold_is_exact_and_ordered(ray_session):
    """The qualifying set matches a direct integer recomputation, and
    output is value-desc / partkey-asc ordered."""
    import pyarrow.parquet as pq

    from engine.tpch2 import q11_important_stock

    out = q11_important_stock(SF_DIR)
    assert len(out) > 0
    v = out["value"].to_numpy()
    assert (v[:-1] >= v[1:]).all()

    li = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"),
                       columns=["l_partkey", "l_suppkey",
                                "l_quantity"]).to_pandas()
    supp = pq.read_table(os.path.join(SF_DIR, "supplier.parquet")
                         ).to_pandas()
    nat = pq.read_table(os.path.join(SF_DIR, "nation.parquet")
                        ).to_pandas()
    nk = int(nat.loc[nat["n_name"] == "NATION_18",
                     "n_nationkey"].iloc[0])
    sk = set(supp.loc[supp["s_nationkey"] == nk, "s_suppkey"])
    d = li[li["l_suppkey"].isin(sk)]
    ps = d.groupby(["l_partkey", "l_suppkey"], as_index=False)[
        "l_quantity"].sum()
    cost = ((ps["l_partkey"] * 7919 + ps["l_suppkey"] * 104729)
            % 99991 + 100).astype("int64")
    cents = (cost * ps["l_quantity"].astype("int64")).groupby(
        ps["l_partkey"]).sum()
    total = int(cents.sum())
    want = cents[cents * len(cents) > 2 * total]
    assert set(out["ps_partkey"]) == set(want.index)
