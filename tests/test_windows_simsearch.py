"""Unit tests for the temporal window operators (engine/windows.py) and
the similarity-search extensions (cosine_pairs / kmeans / knn_ivf),
checked against in-process brute-force references."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _events(n_users=7, per_user=40, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2024-01-01")
    for u in range(n_users):
        t = base
        for i in range(per_user):
            # occasional zero gap to exercise RANGE peer semantics
            step = int(rng.integers(0, 90)) * 60
            t = t + pd.Timedelta(seconds=step)
            rows.append({"user_id": u, "ts": t,
                         "event_type": ["a", "b"][int(rng.integers(0, 2))]})
    return pd.DataFrame(rows)


def test_rolling_count_matches_bruteforce(ray_session):
    from engine.windows import rolling_count

    df = _events()
    w = pd.Timedelta(hours=1)
    got = (
        rolling_count(rd.from_pandas(df[["user_id", "ts"]]), "user_id", "ts",
                      w, num_buckets=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # brute force: RANGE frame = [ts - w, last peer of ts]
    exp_rows = []
    for u, g in df.groupby("user_id"):
        ts = g["ts"].sort_values().to_numpy()
        cnt = [
            int(((ts >= t - w.to_timedelta64()) & (ts <= t)).sum()) for t in ts
        ]
        exp_rows.append({"user_id": u, "peak": max(cnt), "n_events": len(ts)})
    exp = pd.DataFrame(exp_rows)
    pd.testing.assert_frame_equal(
        got.astype({"peak": "int64", "n_events": "int64"}), exp,
        check_dtype=False,
    )


def test_asof_join_matches_merge_asof(ray_session):
    from engine.windows import asof_join

    df = _events()
    left = df[df["event_type"] == "a"][["user_id", "ts"]]
    right = df[df["event_type"] == "b"][["user_id", "ts"]]
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="user_id", ts="ts", right_ts_out="m", num_buckets=4)
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts"), right.rename(columns={"ts": "m"}).sort_values("m"),
        left_on="ts", right_on="m", by="user_id", direction="backward",
    ).sort_values(["user_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_join_count_matches_bruteforce(ray_session):
    from engine.windows import range_join_count

    df = _events()
    w = pd.Timedelta(hours=2)
    left = df[df["event_type"] == "a"][["user_id", "ts"]]
    right = df[df["event_type"] == "b"][["user_id", "ts"]]
    got = (
        range_join_count(rd.from_pandas(left), rd.from_pandas(right),
                         key="user_id", ts="ts", window=w, num_buckets=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    m = left.merge(right, on="user_id", suffixes=("_l", "_r"))
    m = m[(m["ts_r"] >= m["ts_l"] - w) & (m["ts_r"] <= m["ts_l"])]
    exp = (
        m.groupby("user_id", as_index=False)
        .size()
        .rename(columns={"size": "n_pairs"})
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _vecs(n=200, d=16, seed=11):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    # plant near-dup pairs
    for i in range(0, 20, 2):
        m[i + 1] = m[i] + 0.01 * rng.standard_normal(d)
    ids = np.arange(n, dtype=np.int64)
    return pd.DataFrame({"vec_id": ids, "embedding": [list(map(float, r)) for r in m]}), m


def test_cosine_pairs_exact(ray_session):
    from engine.simsearch import cosine_pairs

    df, m = _vecs()
    got = (
        cosine_pairs(rd.from_pandas(df), threshold=0.9)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu = np.triu_indices(len(m), k=1)
    mask = sims[iu] >= 0.9
    exp = set(zip(iu[0][mask], iu[1][mask]))
    assert set(zip(got["vec_a"], got["vec_b"])) == exp
    assert len(exp) >= 10  # the planted pairs exist


def test_kmeans_deterministic_and_assigns(ray_session):
    from engine.simsearch import kmeans

    df, m = _vecs(n=120, d=8)
    ds = rd.from_pandas(df)
    c1 = kmeans(ds, n_centroids=6, dim=8, iters=3)
    c2 = kmeans(ds, n_centroids=6, dim=8, iters=3)
    np.testing.assert_allclose(c1, c2)  # deterministic across runs
    assert c1.shape == (6, 8)
    norms = np.linalg.norm(c1, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-9)


def test_knn_ivf_recall_floor(ray_session):
    from engine.simsearch import knn_bruteforce, knn_ivf

    df, m = _vecs(n=300, d=16)
    ds = rd.from_pandas(df)
    q = m[:3]
    exact = knn_bruteforce(ds, q, k=10, dtype=np.float64)
    approx = knn_ivf(ds, q, dim=16, k=10, n_centroids=8, nprobe=4)
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls


def test_ngram_jaccard_clique_completeness(ray_session):
    from engine.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [base, base, base + " extra", "completely different words here entirely now ok yes"],
        }
    )
    got = (
        ngram_jaccard_pairs(rd.from_pandas(docs), threshold=0.5)
        .to_pandas()
        .drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # all three pairwise combinations of {0,1,2} must be present
    # (clique candidates — a chain would drop one of them)
    assert {(0, 1), (0, 2), (1, 2)} <= set(zip(got["doc_a"], got["doc_b"]))
    exact = got[(got["doc_a"] == 0) & (got["doc_b"] == 1)]
    assert (exact["n_inter"] == exact["n_union"]).all()


def test_asof_join_right_payload(ray_session):
    from engine.windows import asof_join

    df = _events()
    rng = np.random.default_rng(4)
    df["value"] = np.round(rng.uniform(0, 10, len(df)), 2)
    left = df[df["event_type"] == "a"][["user_id", "ts"]]
    right = df[df["event_type"] == "b"][["user_id", "ts", "value"]]
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="user_id", ts="ts", right_ts_out="m",
                  right_cols=["value"], num_buckets=4)
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.rename(columns={"ts": "m"}).sort_values("m"),
        left_on="ts", right_on="m", by="user_id", direction="backward",
    ).sort_values(["user_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["value"].notna().sum() > 0


def test_embed_dup_clusters_match_local_uf(ray_session):
    """Cluster roots from the distributed CC equal a local union-find
    over the oracle-checked cosine pairs."""
    from engine.queries import embed_dup_clusters, embed_dup_pairs

    sf = "/root/testdata/sf0.001"
    c = embed_dup_clusters(sf)
    p = embed_dup_pairs(sf)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(p["vec_a"], p["vec_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {v: int(find(v)) for v in set(p["vec_a"]) | set(p["vec_b"])}
    got = dict(zip(c["vec_id"], c["cluster_id"]))
    assert got == exp and len(got) > 0


def test_window_bounds_overflow_fallback():
    """(max_code+1) * span >= 2^62 forces the per-segment path; bounds
    must equal the composite-axis answer computed on a SAFE subset and a
    brute-force reference on the full set (ADVICE r2: int64 wrap)."""
    from engine import pathlog
    from engine.windows import _axis_fits, _window_bounds_sorted

    rng = np.random.default_rng(7)
    n_keys, per_key = 60, 25
    w = int(pd.Timedelta(hours=1) / pd.Timedelta(1, "ns"))
    # ~10-year span in ns: 60 keys x 3.2e17 ns >> 2^62
    ts, codes = [], []
    for k in range(n_keys):
        t = np.sort(rng.integers(0, int(3.15e17), size=per_key))
        ts.extend(t.tolist())
        codes.extend([k] * per_key)
    codes = np.asarray(codes, np.int64)
    ts = np.asarray(ts, np.int64)
    assert not _axis_fits(codes, ts, w)

    pathlog.reset()
    lo, hi = _window_bounds_sorted(codes, ts, w)
    assert pathlog.count("windows", "segment_fallback") == 1

    # brute force per row
    for i in rng.choice(len(ts), size=200, replace=False):
        seg = codes == codes[i]
        exp_lo = np.flatnonzero(seg & (ts >= ts[i] - w)).min()
        exp_hi = np.flatnonzero(seg & (ts <= ts[i])).max() + 1
        assert (lo[i], hi[i]) == (exp_lo, exp_hi), i

    # safe-scale equivalence: same codes, compressed span -> fast path
    ts_small = ts % (1 << 40)
    order = np.lexsort((ts_small, codes))
    ts_small, codes_small = ts_small[order], codes[order]
    assert _axis_fits(codes_small, ts_small, w)
    lo_f, hi_f = _window_bounds_sorted(codes_small, ts_small, w)
    # compare against brute force again (fast path correctness anchor)
    for i in rng.choice(len(ts_small), size=100, replace=False):
        seg = codes_small == codes_small[i]
        exp_lo = np.flatnonzero(seg & (ts_small >= ts_small[i] - w)).min()
        exp_hi = np.flatnonzero(seg & (ts_small <= ts_small[i])).max() + 1
        assert (lo_f[i], hi_f[i]) == (exp_lo, exp_hi), i


def test_cosine_pairs_blocked_matches_exact(ray_session):
    """small_threshold=0 forces the LSH-blocked scale path (no driver
    gather); on a crisp near-dup corpus (planted pairs at cosine ~0.999,
    background pairs far below threshold) the blocked result equals the
    exact all-pairs answer — miss odds ~1e-8 at H=8, L=16 (MultiLsh
    docstring), and the planes are seeded so the run is deterministic."""
    from engine import pathlog
    from engine.simsearch import cosine_pairs

    df, m = _vecs(n=300, d=16, seed=23)
    pathlog.reset()
    got = (
        cosine_pairs(rd.from_pandas(df), threshold=0.98, small_threshold=0)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    assert pathlog.count("cosine_pairs", "lsh_blocked") == 1

    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu = np.triu_indices(len(m), k=1)
    mask = sims[iu] >= 0.98
    exp = set(zip(iu[0][mask], iu[1][mask]))
    assert set(zip(got["vec_a"], got["vec_b"])) == exp
    assert len(exp) >= 10
    # scores are the exact cosine, not an approximation
    exp_scores = {(a, b): sims[a, b] for a, b in exp}
    for a, b, s in zip(got["vec_a"], got["vec_b"], got["score"]):
        assert abs(exp_scores[(a, b)] - s) < 1e-12


def test_blocked_cosine_recall_bound(ray_session):
    """Measured LSH recall >= the documented probabilistic bound on a
    dup-heavy corpus (VERDICT r3 #8; full-size probe:
    scripts/lsh_recall.py, recorded in BASELINE.md)."""
    import numpy as np
    import pandas as pd

    from engine.simsearch import cosine_pairs_blocked

    rng = np.random.default_rng(99)
    half, d = 600, 16
    base = rng.standard_normal((half, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    eps = rng.uniform(0.03, 0.47, size=(half, 1))
    noise = rng.standard_normal((half, d))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    dup = base + eps * noise
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    m = np.vstack([base, dup])
    n = len(m)
    sims = m @ m.T
    for thr, bound in ((0.95, 0.999862), (0.99, 0.999999)):
        rows, cols = np.nonzero(np.triu(sims >= thr, k=1))
        truth = set(zip(rows.tolist(), cols.tolist()))
        emb = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                            "embedding": [r.tolist() for r in m]})
        got = cosine_pairs_blocked(rd.from_pandas(emb), thr, d,
                                   rows_hint=n).to_pandas()
        found = set(zip(got["vec_a"].astype(int), got["vec_b"].astype(int)))
        assert not (found - truth), "blocked path emitted false positives"
        recall = len(truth & found) / len(truth)
        # small-sample slack: one missed pair at ~200 true pairs
        assert recall >= bound - 0.01, (thr, recall)


# --- graphalgo: PageRank ---------------------------------------------------
def test_pagerank_distributed_matches_local(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.graphalgo import local_pagerank, pagerank

    rng = np.random.default_rng(7)
    nodes = [f"n{i:03d}" for i in range(200)]
    edges = sorted({(nodes[a], nodes[b])
                    for a, b in zip(rng.integers(0, 200, 800),
                                    rng.integers(0, 200, 800)) if a != b})
    loc = pd.Series(local_pagerank(edges)).sort_index()
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    dist = pagerank(ds, num_buckets=4).set_index("node")["rank"]
    assert float((dist - loc).abs().max()) < 1e-12
    assert abs(dist.sum() - 1.0) < 1e-9


def test_pagerank_dangling_and_hub(ray_session):
    # star graph: every node points at hub; hub is dangling
    from engine.graphalgo import local_pagerank

    edges = [(f"s{i}", "hub") for i in range(10)]
    r = local_pagerank(edges)
    assert r["hub"] > max(v for k, v in r.items() if k != "hub")
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_pagerank_auto_paths_agree(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.graphalgo import pagerank, pagerank_auto

    rng = np.random.default_rng(11)
    edges = sorted({(f"a{a}", f"b{b}")
                    for a, b in zip(rng.integers(0, 40, 150),
                                    rng.integers(0, 40, 150))})
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    auto = pagerank_auto(ds).set_index("node")["rank"]     # driver path
    forced = pagerank(ds, num_buckets=3).set_index("node")["rank"]
    assert float((auto - forced).abs().max()) < 1e-12


def test_parts_coorder_triangles_bruteforce(ray_session, tmp_path, monkeypatch):
    """Degree-ordered wedge counting on a synthetic basket table must
    equal the O(n^3) brute-force triangle count of the co-order graph,
    on BOTH the broadcast-closure and the forced bucket-semi paths."""
    import itertools

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.queries import parts_coorder_triangles

    rng = np.random.default_rng(5)
    rows = []
    for ok in range(120):
        parts = rng.choice(40, size=rng.integers(1, 7), replace=False)
        rows += [(ok, int(p)) for p in parts]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "lineitem.parquet")

    edges = set()
    for _, g in df.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(set(g["l_partkey"])), 2):
            edges.add((a, b))
    nodes = {p for e in edges for p in e}
    tri = sum((a, b) in edges and (b, c) in edges and (a, c) in edges
              for a, b, c in itertools.combinations(sorted(nodes), 3))

    got = parts_coorder_triangles(str(tmp_path))
    assert got.values.tolist() == [[len(nodes), len(edges), tri]]

    # forced paths: bucket-semi closure, and the bucket-parallel wedge
    # fold (driver threshold 0) on both closure regimes
    monkeypatch.setenv("GRAFT_TRI_WEDGE_DRIVER", "0")
    got2 = parts_coorder_triangles(str(tmp_path))
    assert got2.values.tolist() == [[len(nodes), len(edges), tri]]
    monkeypatch.setenv("GRAFT_TRI_BCAST", "1")
    got3 = parts_coorder_triangles(str(tmp_path))
    assert got3.values.tolist() == [[len(nodes), len(edges), tri]]


def test_embed_dim_stats_matches_numpy(ray_session):
    """The constant-size (n, sum, sumsq) partials must reproduce the
    direct two-pass numpy statistics exactly at 6 dp, for every
    dimension."""
    import numpy as np
    import pyarrow.parquet as pq

    from engine.queries import embed_dim_stats

    sf = "/root/testdata/sf0.001"
    out = embed_dim_stats(sf)
    emb = pq.read_table(sf + "/embeddings.parquet",
                        columns=["embedding"])["embedding"]
    m = np.asarray(emb.to_pylist(), dtype=np.float64)
    assert list(out["dim"]) == list(range(1, m.shape[1] + 1))
    assert (out["n"] == m.shape[0]).all()
    np.testing.assert_allclose(out["mean"], np.round(m.mean(axis=0), 6),
                               atol=1e-9)
    np.testing.assert_allclose(out["var"],
                               np.round(m.var(axis=0, ddof=1), 6),
                               atol=1e-9)
