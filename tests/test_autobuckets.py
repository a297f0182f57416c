"""Bucket-count independence + auto-sizing of the operator-library
exchanges (VERDICT r3 #1): every bucketed co-group operator must produce
IDENTICAL results with num_buckets forced far above its old fixed
default — the bucket count is a pure partitioning choice, and it now
scales from input row counts (engine.shuffle.auto_buckets) so per-bucket
heap is bounded by a target-rows constant, not corpus size."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_auto_buckets_sizing():
    from engine.shuffle import auto_buckets

    # floor: 2x cpus when the size is unknown or small
    assert auto_buckets(None, cpus=32) == 64
    assert auto_buckets(1_000, cpus=32) == 64
    assert auto_buckets(None, cpus=8) == 16
    # scaling region: one bucket per ~262k rows
    assert auto_buckets(2_621_440, cpus=2) == 10
    assert auto_buckets(100_000_000, cpus=32) == 382
    # per-bucket heap bounded by the target, NOT the corpus
    assert auto_buckets(10**12, cpus=32) == 1 << 20  # cap


def _events(n_users=9, per_user=30, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2024-03-01")
    for u in range(n_users):
        t = base
        for _ in range(per_user):
            t = t + pd.Timedelta(seconds=int(rng.integers(0, 80)) * 60)
            rows.append({"user_id": u, "ts": t, "cents": int(rng.integers(1, 500)),
                         "event_type": ["a", "b"][int(rng.integers(0, 2))]})
    return pd.DataFrame(rows)


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


def test_windows_bucket_count_invariant(ray_session):
    """rolling_count / rolling_sum / asof_join / range_join_count with
    num_buckets >> the old fixed 64 match the small-bucket answer."""
    from engine.windows import (asof_join_single, range_join_count_single,
                                rolling_count, rolling_sum)

    df = _events()
    w = pd.Timedelta(hours=1)

    for nb_hi in (997,):
        small = rolling_count(rd.from_pandas(df[["user_id", "ts"]]),
                              "user_id", "ts", w, num_buckets=4).to_pandas()
        big = rolling_count(rd.from_pandas(df[["user_id", "ts"]]),
                            "user_id", "ts", w, num_buckets=nb_hi).to_pandas()
        pd.testing.assert_frame_equal(_sorted(small, ["user_id"]),
                                      _sorted(big, ["user_id"]))

        s2 = rolling_sum(rd.from_pandas(df[["user_id", "ts", "cents"]]),
                         "user_id", "ts", "cents", w, num_buckets=4).to_pandas()
        b2 = rolling_sum(rd.from_pandas(df[["user_id", "ts", "cents"]]),
                         "user_id", "ts", "cents", w,
                         num_buckets=nb_hi).to_pandas()
        pd.testing.assert_frame_equal(_sorted(s2, ["user_id"]),
                                      _sorted(b2, ["user_id"]))

        lm = lambda d: d["event_type"].eq("a")  # noqa: E731
        rm = lambda d: d["event_type"].eq("b")  # noqa: E731
        s3 = asof_join_single(rd.from_pandas(df), "user_id", "ts", lm, rm,
                              num_buckets=4).to_pandas()
        b3 = asof_join_single(rd.from_pandas(df), "user_id", "ts", lm, rm,
                              num_buckets=nb_hi).to_pandas()
        pd.testing.assert_frame_equal(_sorted(s3, ["user_id", "ts"]),
                                      _sorted(b3, ["user_id", "ts"]))

        s4 = range_join_count_single(rd.from_pandas(df), "user_id", "ts", w,
                                     lm, rm, num_buckets=4).to_pandas()
        b4 = range_join_count_single(rd.from_pandas(df), "user_id", "ts", w,
                                     lm, rm, num_buckets=nb_hi).to_pandas()
        pd.testing.assert_frame_equal(_sorted(s4, ["user_id"]),
                                      _sorted(b4, ["user_id"]))


def test_bucket_join_bucket_count_invariant(ray_session):
    from engine.joins import bucket_join

    rng = np.random.default_rng(7)
    l = pd.DataFrame({"k": rng.integers(0, 50, 300),
                      "a": rng.integers(0, 9, 300)})
    r = pd.DataFrame({"k": np.arange(50), "b": np.arange(50) * 10})
    small = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                        num_buckets=4).to_pandas()
    big = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      num_buckets=769).to_pandas()
    auto = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                       rows_hint=300).to_pandas()
    key = ["k", "a", "b"]
    pd.testing.assert_frame_equal(_sorted(small, key), _sorted(big, key))
    pd.testing.assert_frame_equal(_sorted(small, key), _sorted(auto, key))


def _dup_docs(n=60):
    texts = []
    for i in range(n):
        base = f"alpha beta gamma delta epsilon zeta eta theta doc {i % 12}"
        texts.append(base)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_verify_pairs_bucket_count_invariant(ray_session):
    """Distributed verify (small_threshold=0 forces it) with forced huge
    num_buckets matches the driver fast path."""
    from engine.dedup import minhash_candidates, verify_pairs

    docs = _dup_docs()
    dd = rd.from_pandas(docs)
    cands = minhash_candidates(dd, pairs="clique", rows_hint=len(docs))
    fast = (verify_pairs(cands, dd, 0.5, emit_counts=True)
            .to_pandas().drop_duplicates(["doc_a", "doc_b"]))
    cands2 = minhash_candidates(dd, pairs="clique", rows_hint=len(docs))
    dist = (verify_pairs(cands2, dd, 0.5, emit_counts=True,
                         small_threshold=0, num_buckets=521)
            .to_pandas().drop_duplicates(["doc_a", "doc_b"]))
    key = ["doc_a", "doc_b"]
    pd.testing.assert_frame_equal(
        _sorted(fast, key).astype("int64"), _sorted(dist, key).astype("int64"))


def test_cosine_blocked_bucket_count_invariant(ray_session):
    from engine.simsearch import cosine_pairs_blocked

    rng = np.random.default_rng(11)
    m = rng.standard_normal((120, 12))
    m[60:] = m[:60] + 0.01 * rng.standard_normal((60, 12))  # planted dups
    emb = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                        "embedding": [row.tolist() for row in m]})
    small = cosine_pairs_blocked(rd.from_pandas(emb), 0.99, 12,
                                 num_buckets=8).to_pandas()
    big = cosine_pairs_blocked(rd.from_pandas(emb), 0.99, 12,
                               num_buckets=1021).to_pandas()
    auto = cosine_pairs_blocked(rd.from_pandas(emb), 0.99, 12,
                                rows_hint=120).to_pandas()
    key = ["vec_a", "vec_b"]
    for df in (small, big, auto):
        df["score"] = df["score"].round(9)
    pd.testing.assert_frame_equal(_sorted(small, key), _sorted(big, key))
    pd.testing.assert_frame_equal(_sorted(small, key), _sorted(auto, key))


def test_exact_dedup_bucket_count_invariant(ray_session):
    from engine.dedup import exact_dedup

    docs = _dup_docs()
    a = exact_dedup(rd.from_pandas(docs)).to_pandas()
    b = exact_dedup(rd.from_pandas(docs),
                    rows_hint=500_000_000).to_pandas()  # forces huge nb
    key = ["doc_id"]
    pd.testing.assert_frame_equal(_sorted(a, key), _sorted(b, key))


def test_grouped_sum_matches_pandas_any_buckets(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.shuffle import grouped_sum

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k1": rng.integers(0, 500, 20000),
        "k2": rng.choice(["a", "b", "c"], 20000),
        "v1": rng.integers(-50, 50, 20000),
        "v2": rng.integers(0, 1000, 20000),
    })
    want = (df.groupby(["k1", "k2"], as_index=False)[["v1", "v2"]].sum()
            .sort_values(["k1", "k2"]).reset_index(drop=True))
    ds = rd.from_pandas([df.iloc[i::7].reset_index(drop=True)
                         for i in range(7)])
    # driver-fold path (default threshold) and FORCED bucket path
    # (driver_threshold=0) across bucket counts must all agree
    for nb, thresh in ((1, 0), (4, 0), (257, 0), (16, None)):
        got = (grouped_sum(ds, ["k1", "k2"], ["v1", "v2"],
                           num_buckets=nb, driver_threshold=thresh)
               .to_pandas()
               .sort_values(["k1", "k2"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k1", "k2", "v1", "v2"]], want, check_dtype=False)


def test_dedup_keep_bucket_path_matches_broadcast(ray_session, monkeypatch):
    import pandas as pd

    from engine.queries import dedup_keep_docs

    sf = "/root/testdata/sf0.001"
    bcast = dedup_keep_docs(sf)
    monkeypatch.setenv("GRAFT_KEEP_BCAST", "0")   # force bucket_join anti
    forced = dedup_keep_docs(sf)
    pd.testing.assert_frame_equal(bcast, forced)


def test_pack_sequences_invariants(ray_session):
    from engine.queries import pack_sequences

    out = pack_sequences("/root/testdata/sf0.001")
    for (_, b), g in out.groupby(["bucket", "bin"]):
        # a bin respects the budget unless it holds a single oversized doc
        assert g["n_tokens"].sum() <= 256 or len(g) == 1
    for _, g in out.groupby("bucket"):
        g = g.sort_values("doc_id")
        bins = g["bin"].to_numpy()
        assert bins[0] == 0
        # bins are consecutive and nondecreasing in doc_id order
        import numpy as np
        d = np.diff(bins)
        assert ((d == 0) | (d == 1)).all()


def test_events_funnel_stage_semantics(ray_session):
    import duckdb

    from engine.queries import events_funnel

    sf = "/root/testdata/sf0.001"
    out = events_funnel(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{sf}/events.parquet')")
    n_users = con.execute("SELECT COUNT(DISTINCT user_id) FROM events") \
        .fetchone()[0]
    assert len(out) == n_users
    assert out["funnel_stage"].between(0, 3).all()
    # stage >= 1 iff the user has at least one view
    viewers = {r[0] for r in con.execute(
        "SELECT DISTINCT user_id FROM events WHERE event_type='view'")
        .fetchall()}
    got = set(out.loc[out["funnel_stage"] >= 1, "user_id"])
    assert got == viewers


def test_kg_two_hop_matches_brute_force(ray_session):
    import pandas as pd

    from engine.pipeline import triples_dataset
    from engine.queries import kg_two_hop, transcripts_path

    sf = "/root/testdata/sf0.001"
    got = kg_two_hop(sf)
    t = triples_dataset(transcripts_path(sf)).to_pandas()
    e = t[["subj", "obj"]].drop_duplicates()
    j = e.rename(columns={"subj": "src", "obj": "mid"}).merge(
        e.rename(columns={"subj": "mid", "obj": "dst"}), on="mid")
    j = j[j["src"] != j["dst"]].drop_duplicates()
    want = (j.groupby(["src", "dst"], as_index=False)
            .agg(n_paths=("mid", "size"))
            .sort_values(["n_paths", "src", "dst"],
                         ascending=[False, True, True])
            .head(50).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_grouped_fold_paths_agree(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.shuffle import grouped_fold

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 300, 10000),
                       "m": rng.integers(0, 40, 10000)})

    def fold(g):
        d = g.drop_duplicates(["k", "m"])
        return d.groupby("k", as_index=False).agg(n=("m", "size"))

    ds = rd.from_pandas([df.iloc[i::5].reset_index(drop=True)
                         for i in range(5)])
    driver = (grouped_fold(ds, "k", fold).to_pandas()
              .sort_values("k").reset_index(drop=True))
    forced = (grouped_fold(ds, "k", fold, driver_threshold=0,
                           num_buckets=13).to_pandas()
              .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(driver, forced, check_dtype=False)
    want = (df.drop_duplicates().groupby("k", as_index=False)
            .agg(n=("m", "size")).sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(driver, want, check_dtype=False)


def test_existence_join_paths_agree(ray_session, monkeypatch):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.joins import bucket_join

    rng = np.random.default_rng(9)
    l = pd.DataFrame({"k": rng.integers(0, 80, 500),
                      "a": rng.integers(0, 9, 500)})
    r = pd.DataFrame({"k": rng.integers(0, 80, 200)})
    for how in ("semi", "anti"):
        bcast = (bucket_join(rd.from_pandas(l), rd.from_pandas(r),
                             on="k", how=how).to_pandas()
                 .sort_values(["k", "a"]).reset_index(drop=True))
        # force the packed bucket path (skip broadcast AND bloom)
        monkeypatch.setenv("GRAFT_EXIST_BCAST", "0")
        monkeypatch.setenv("GRAFT_EXIST_BLOOM", "0")
        forced = (bucket_join(rd.from_pandas(l), rd.from_pandas(r),
                              on="k", how=how, num_buckets=17).to_pandas()
                  .sort_values(["k", "a"]).reset_index(drop=True))
        # force the bloom prefilter + exact-verify path
        monkeypatch.setenv("GRAFT_EXIST_BLOOM", "1000000")
        bloom = (bucket_join(rd.from_pandas(l), rd.from_pandas(r),
                             on="k", how=how, num_buckets=17).to_pandas()
                 .sort_values(["k", "a"]).reset_index(drop=True))
        monkeypatch.delenv("GRAFT_EXIST_BCAST")
        monkeypatch.delenv("GRAFT_EXIST_BLOOM")
        pd.testing.assert_frame_equal(bcast, forced)
        pd.testing.assert_frame_equal(bcast, bloom)
        keys = set(r["k"])
        want = (l[l["k"].isin(keys)] if how == "semi"
                else l[~l["k"].isin(keys)])
        want = want.sort_values(["k", "a"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(bcast, want)


def test_range_sort_skew_and_duplicates(ray_session):
    """range_sort totals-orders a skewed input where one value holds
    40% of rows (straddles any equal-frequency cut) and the rest are
    duplicated — equal primary keys must land in ONE range bucket and
    the multi-key order must match pandas exactly, at a forced bucket
    count far above the default."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.sortop import range_sort

    rng = np.random.RandomState(7)
    n = 20_000
    v = np.where(rng.rand(n) < 0.4, 42.0, rng.randint(0, 50, n) * 1.5)
    df = pd.DataFrame({"k": v, "i": np.arange(n)[::-1]})
    got = range_sort(rd.from_pandas(df, override_num_blocks=16),
                     ["k", "i"], num_buckets=64)
    want = df.sort_values(["k", "i"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "i"]], want)


def test_bloom_no_false_negatives_and_fpr():
    """The bloom primitive itself: every inserted key probes positive
    (correctness of the prefilter rests on zero false negatives), and
    the false-positive rate on disjoint keys stays near the designed
    ~0.24% (16 bits/key, k=4) — well under 2%."""
    import numpy as np
    import pandas as pd

    from engine.joins import _bloom_m_bits, _bloom_positions

    n = 50_000
    members = np.array([f"key:{i}" for i in range(n)], dtype=object)
    others = np.array([f"other:{i}" for i in range(n)], dtype=object)
    m_bits = _bloom_m_bits(n)
    bits = np.zeros(m_bits >> 6, dtype=np.uint64)
    for p in _bloom_positions(members, m_bits):
        np.bitwise_or.at(bits, (p >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (p & np.uint64(63)))

    def probe(keys):
        keep = np.ones(len(keys), dtype=bool)
        for p in _bloom_positions(keys, m_bits):
            word = (p >> np.uint64(6)).astype(np.int64)
            keep &= ((bits[word] >> (p & np.uint64(63)))
                     & np.uint64(1)).astype(bool)
        return keep

    assert probe(members).all()          # no false negatives, ever
    fpr = probe(others).mean()
    assert fpr < 0.02, fpr


def test_bloom_existence_join_composite_key(ray_session, monkeypatch):
    """Bloom path with a composite (int, string) key: equals the exact
    broadcast-path answer for semi and anti."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.joins import bucket_join

    rng = np.random.default_rng(11)
    l = pd.DataFrame({"k1": rng.integers(0, 40, 600),
                      "k2": rng.choice(list("abcd"), 600),
                      "v": np.arange(600)})
    r = pd.DataFrame({"k1": rng.integers(0, 40, 150),
                      "k2": rng.choice(list("abcd"), 150)})
    for how in ("semi", "anti"):
        exact = (bucket_join(rd.from_pandas(l), rd.from_pandas(r),
                             on=["k1", "k2"], how=how).to_pandas()
                 .sort_values("v").reset_index(drop=True))
        monkeypatch.setenv("GRAFT_EXIST_BCAST", "0")
        monkeypatch.setenv("GRAFT_EXIST_BLOOM", "1000000")
        bloom = (bucket_join(rd.from_pandas(l), rd.from_pandas(r),
                             on=["k1", "k2"], how=how,
                             num_buckets=13).to_pandas()
                 .sort_values("v").reset_index(drop=True))
        monkeypatch.delenv("GRAFT_EXIST_BCAST")
        monkeypatch.delenv("GRAFT_EXIST_BLOOM")
        pd.testing.assert_frame_equal(exact, bloom)


def test_prefix_sum_matches_pandas_forced_buckets(ray_session):
    """Distributed two-phase scan equals the single-core cumsum at a
    forced bucket count far above the default, on shuffled input order
    with zero and duplicate weights."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.sortop import prefix_sum

    rng = np.random.default_rng(13)
    n = 25_000
    df = pd.DataFrame({"id": rng.permutation(n).astype("int64"),
                       "w": rng.integers(0, 7, n).astype("int64")})
    ds, total = prefix_sum(rd.from_pandas(df, override_num_blocks=16),
                           "id", "w", out_col="c", num_buckets=97)
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    want = df.sort_values("id").reset_index(drop=True)
    want["c"] = want["w"].cumsum()
    pd.testing.assert_frame_equal(got[["id", "w", "c"]],
                                  want[["id", "w", "c"]])
    assert total == int(df["w"].sum())


def test_events_user_paths_bucket_exchange_matches(ray_session,
                                                   monkeypatch):
    """The ordered string-agg's keep-smallest-n partial must be
    merge-exact: the forced bucketed grouped_fold path produces the
    identical per-user paths as the driver fold."""
    import pandas as pd

    from engine.queries import events_user_paths

    sf = "/root/testdata/sf0.001"
    fast = events_user_paths(sf)
    monkeypatch.setenv("GRAFT_GSUM_DRIVER", "0")
    dist = events_user_paths(sf)
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, dist)
    # the cap binds: no path exceeds n types, and at least one user
    # has a multi-event path (the join separator does real work)
    assert fast["path_len"].max() <= 8
    assert fast["path"].str.contains(">").any()


def test_orders_daily_cum_share_bucket_exchange(ray_session,
                                                monkeypatch):
    """Forced bucketed grouped_sum path must yield the identical ramp,
    and the ramp must be a valid CDF (monotone, ends at 1.0)."""
    import numpy as np
    import pandas as pd

    from engine.queries import orders_daily_cum_share

    sf = "/root/testdata/sf0.001"
    fast = orders_daily_cum_share(sf)
    monkeypatch.setenv("GRAFT_GSUM_DRIVER", "0")
    dist = orders_daily_cum_share(sf)
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, dist)
    cs = fast["cum_share"].to_numpy()
    assert (np.diff(cs) >= 0).all() and cs[-1] == 1.0


def test_rfm_segments_bucket_exchange_and_totals(ray_session,
                                                 monkeypatch):
    """The forced bucketed grouped_fold path must yield identical
    segment counts, and the 8 classes must partition every customer
    exactly once (counts sum to the customer footer)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from engine.queries import customer_rfm_segments

    sf = "/root/testdata/sf0.001"
    fast = customer_rfm_segments(sf)
    monkeypatch.setenv("GRAFT_GSUM_DRIVER", "0")
    dist = customer_rfm_segments(sf)
    pd.testing.assert_frame_equal(fast, dist)
    import os as _os

    n_cust = pq.read_table(
        _os.path.join(sf, "orders.parquet"),
        columns=["o_custkey"]).column(0).to_pandas().nunique()
    assert int(fast["n_customers"].sum()) == n_cust


def test_cume_dist_bucket_exchange_and_bounds(ray_session,
                                              monkeypatch):
    """Forced bucketed histogram path must yield the identical CDF;
    every cume_dist lies in (0, 1] and each type's max value maps to
    exactly 1.0."""
    import pandas as pd

    from engine.queries import events_value_cume_dist

    sf = "/root/testdata/sf0.001"
    fast = events_value_cume_dist(sf)
    monkeypatch.setenv("GRAFT_GSUM_DRIVER", "0")
    dist = events_value_cume_dist(sf)
    pd.testing.assert_frame_equal(fast, dist)
    cd = fast["cume_dist"]
    assert ((cd > 0) & (cd <= 1.0)).all()
    top = fast.loc[fast.groupby("event_type")["value"].idxmax(),
                   "cume_dist"]
    assert (top == 1.0).all()
