"""Driver-mimic: run each queries() entry at sf0.001 and compare with
its oracle_sql() DuckDB result (row count, column names, sorted
values) — the same discipline the graft driver applies at sf0.01."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # columns sorted by name, rows kept IN RETURNED ORDER — the driver
    # hashes rows in order, so sorting rows here would hide ORDER BY
    # mismatches (bit us in round 1: top_suppliers)
    return df[sorted(df.columns)].reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def sql_checked_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", sql_checked_names())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    got = _canon(_to_df(e.queries()[name](SF_DIR)))
    want = _canon(_oracle(e.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype(float), w.astype(float), check_names=False,
                rtol=0, atol=1e-9,
            )
        elif "datetime" in str(g.dtype) or "datetime" in str(w.dtype):
            assert list(pd.to_datetime(g)) == list(pd.to_datetime(w)), c
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), c


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e

    qs = e.queries()
    rows_only = sorted(set(qs) - set(e.oracle_sql()))
    for name in rows_only:
        df = _to_df(qs[name](SF_DIR))
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_df(res)
    assert len(df) >= 0
    assert {"subj", "pred", "obj"} <= set(df.columns)


def test_q5_distributed_branch_matches(ray_session):
    """small_threshold=0 forces the packed bucket-join branch; result
    must equal the broadcast fast path (and hence the oracle)."""
    import __ray_entry__ as e
    from engine.queries import q5_region_revenue

    fast = q5_region_revenue(SF_DIR)
    dist = q5_region_revenue(SF_DIR, small_threshold=0)
    import pandas as pd

    pd.testing.assert_frame_equal(fast, dist)


def test_orders_left_lineitem_distributed_branch_matches(ray_session):
    """small_threshold=0 forces the bucket_join left-attach branch;
    result must equal the driver-merge fast path (and the oracle)."""
    from engine.queries import orders_left_lineitem

    fast = orders_left_lineitem(SF_DIR)
    dist = orders_left_lineitem(SF_DIR, small_threshold=0)
    import pandas as pd

    pd.testing.assert_frame_equal(fast, dist)


def test_q10_distributed_branch_matches(ray_session):
    """small_threshold=0 forces the packed bucket-join branch of q10;
    result must equal the fused broadcast path (and the oracle)."""
    from engine.queries import q10_returned_customers

    fast = q10_returned_customers(SF_DIR)
    dist = q10_returned_customers(SF_DIR, small_threshold=0)
    import pandas as pd

    pd.testing.assert_frame_equal(fast, dist)


def test_q7_distributed_branch_matches(ray_session):
    """small_threshold=0 forces the packed bucket-join branch of q7;
    result must equal the fused broadcast path (and the oracle)."""
    from engine.queries import q7_nation_volume

    fast = q7_nation_volume(SF_DIR)
    dist = q7_nation_volume(SF_DIR, small_threshold=0)
    import pandas as pd

    assert len(fast) > 0  # pair (3,19) is bidirectional at sf0.001
    pd.testing.assert_frame_equal(fast, dist)


def test_cms_matches_brute_force_with_collisions(ray_session):
    """Shrink the sketch width so buckets genuinely collide, then
    check the distributed fold against a single-pass numpy CMS built
    from the whole table: same counters, estimate = min over rows,
    and every estimate >= the exact count (CMS one-sided error)."""
    import numpy as np
    import pyarrow.parquet as pq

    import engine.queries as q

    uid = (pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                         columns=["user_id"])
           .to_pandas()["user_id"].to_numpy(np.int64))
    old_w = q._CMS_W
    q._CMS_W = 4  # 15 distinct users into 4 buckets: forced collisions
    try:
        out = q.events_user_cms(SF_DIR, k=10)
    finally:
        q._CMS_W = old_w

    w = 4
    cms = np.zeros(len(q._CMS_SEEDS) * w, dtype=np.int64)
    for i, s in enumerate(q._CMS_SEEDS):
        h = q._splitmix64(uid.view(np.uint64) + np.uint64(s))
        np.add.at(cms, i * w + (h % np.uint64(w)).astype(np.int64), 1)
    probe = out["user_id"].to_numpy(np.int64).view(np.uint64)
    est = np.full(len(probe), np.iinfo(np.int64).max, dtype=np.int64)
    for i, s in enumerate(q._CMS_SEEDS):
        h = q._splitmix64(probe + np.uint64(s))
        est = np.minimum(
            est, cms[i * w + (h % np.uint64(w)).astype(np.int64)])
    assert (out["est_cnt"].to_numpy() == est).all()
    assert (out["est_cnt"].to_numpy() >= out["exact_cnt"].to_numpy()).all()
    assert (out["est_cnt"].to_numpy() > out["exact_cnt"].to_numpy()).any()


def test_drift_degenerate_group_matches_oracle(ray_session, tmp_path):
    """A type with one event (or a constant timestamp) has a zero OLS
    denominator: the oracle's double division yields NULL, the engine
    must emit NaN, not raise."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from engine.queries import events_type_drift

    ts = np.array(["2024-01-01T00:00:01", "2024-01-02T00:00:02",
                   "2024-01-03T00:00:03", "2024-01-05T00:00:00",
                   "2024-01-05T00:00:00"], dtype="datetime64[us]")
    t = pa.table({
        "event_type": ["a", "a", "a", "single", "const"],
        "ts": ts[[0, 1, 2, 3, 3]],
        "value": [1.25, 2.50, 3.75, 9.99, 7.00],
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = events_type_drift(str(tmp_path))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    want = con.sql(e.oracle_sql()["events_type_drift"]).df()
    assert got["slope_cents_s"].isna().tolist() == \
        want["slope_cents_s"].isna().tolist()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns], check_exact=False,
        rtol=0, atol=0)
