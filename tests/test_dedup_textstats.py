"""Dedup family + text analysis + similarity search + multimodal
plumbing — the training-data-pipeline operator extensions."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def dup_docs():
    """Documents with exact dupes and near-dupes."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and once"
    other = "completely different text about ray data pipelines at scale"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},          # exact dup of 1
        {"doc_id": 3, "text": near},          # near dup of 1
        {"doc_id": 4, "text": other},
        {"doc_id": 5, "text": base},          # exact dup of 1
    ]
    return pa.Table.from_pylist(rows)


def test_exact_dedup(ray_session, dup_docs):
    import ray.data as rd

    from engine.dedup import exact_dedup

    out = exact_dedup(rd.from_arrow(dup_docs)).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 3, 4]
    assert out.set_index("doc_id")["n_copies"].to_dict() == {1: 3, 3: 1, 4: 1}


def test_minhash_dedup_clusters(ray_session, dup_docs):
    import ray.data as rd

    from engine.dedup import minhash_dedup

    out = minhash_dedup(rd.from_arrow(dup_docs), threshold=0.5)
    df = out.to_pandas()
    clusters = df.set_index("doc_id")["cluster_id"].to_dict()
    # 1,2,5 exact dups and 3 near dup -> one cluster rooted at 1
    assert clusters.get(1) == 1 and clusters.get(2) == 1 and clusters.get(5) == 1
    assert clusters.get(3) == 1
    assert 4 not in clusters  # singleton never appears in an edge


def test_jaccard_and_shingles():
    from engine.dedup import _shingles, jaccard

    a = _shingles("a b c d e", 3)
    b = _shingles("a b c d f", 3)
    assert 0 < jaccard(a, b) < 1
    assert jaccard(a, a) == 1.0


def test_simhash_near_vs_far(ray_session, dup_docs):
    import ray.data as rd

    from engine.dedup import simhash_dataset

    df = simhash_dataset(rd.from_arrow(dup_docs)).to_pandas().set_index("doc_id")
    h1, h3, h4 = df.loc[1, "simhash"], df.loc[3, "simhash"], df.loc[4, "simhash"]
    d13 = bin(np.uint64(h1) ^ np.uint64(h3)).count("1")
    d14 = bin(np.uint64(h1) ^ np.uint64(h4)).count("1")
    assert d13 < d14  # near-dup closer in hamming space
    assert df.loc[1, "simhash"] == df.loc[2, "simhash"]  # exact dup identical


def test_langid_and_fingerprint(ray_session):
    import ray.data as rd

    from engine.textstats import Fingerprinter, LangId

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat is on the mat and it is happy",
                "der Hund ist im Haus und das ist gut",
                "xyzzy plugh 12345",
            ],
        }
    )
    out = LangId()(docs)
    assert out["lang_pred"].tolist() == ["en", "de", "und"]
    fp = Fingerprinter()(docs)
    assert fp["fp_exact"].nunique() == 3
    # determinism
    fp2 = Fingerprinter()(docs)
    assert fp["fp_min_rolling"].tolist() == fp2["fp_min_rolling"].tolist()


def test_knn_bruteforce_exact(ray_session):
    import ray.data as rd

    from engine.simsearch import knn_bruteforce

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    q = vecs[:2].astype(np.float64)
    out = knn_bruteforce(rd.from_arrow(t), q, k=5, dtype=np.float64)
    # numpy oracle
    def cos_topk(qv):
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = qv / np.linalg.norm(qv)
        s = vn @ qn
        return set(np.argsort(-s)[:5])

    for qi in (0, 1):
        got = set(out[out["query_idx"] == qi]["vec_id"])
        assert got == cos_topk(q[qi].astype(np.float32).astype(np.float64))
        assert out[out["query_idx"] == qi]["score"].max() == pytest.approx(1.0)


def test_knn_lsh_returns_self(ray_session):
    import ray.data as rd

    from engine.simsearch import knn_lsh

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    out = knn_lsh(rd.from_arrow(t), vecs[:3], dim=16, k=5)
    for qi in (0, 1, 2):
        sub = out[out["query_idx"] == qi]
        assert qi in set(sub["vec_id"])  # own bucket always probed


def test_multimodal_stub_plumbing(ray_session):
    import ray.data as rd

    from engine.multimodal import decode_images, resample_audio, synth_media_table

    media = synth_media_table(30)
    ds = rd.from_arrow(media)
    imgs = decode_images(ds, fake=True).to_pandas()
    assert len(imgs) == 30 and {"pix_mean", "pix_std"} <= set(imgs.columns)
    # determinism of the fake decoder
    imgs2 = decode_images(rd.from_arrow(media), fake=True).to_pandas()
    assert imgs.sort_values("media_id")["pix_mean"].tolist() == \
           imgs2.sort_values("media_id")["pix_mean"].tolist()
    aud = resample_audio(ds, fake=True).to_pandas()
    assert (aud["rate"] == 8000).all()
    # the non-fake path is an explicit stub
    from engine.multimodal import DecodeImage

    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(media)


def test_bucket_join_matches_pandas(ray_session):
    import ray.data as rd

    from engine.joins import bucket_join

    rng = np.random.default_rng(3)
    l = pd.DataFrame({"k": rng.integers(0, 20, 200), "x": np.arange(200)})
    r = pd.DataFrame({"k": np.arange(20), "y": np.arange(20) * 10})
    got = (
        bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k", num_buckets=8)
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    want = l.merge(r, on="k").sort_values(["k", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "x", "y"]].astype("int64"),
                                  want.astype("int64"))


def test_verify_pairs_local_matches_distributed(ray_session):
    """The small-candidates driver fast path and the bucket-join
    distributed path score identically (small_threshold=0 forces the
    distributed shape on the same input)."""
    import ray.data as rd

    from engine.dedup import minhash_candidates, verify_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3],
         "text": [base, base, base + " extra tail", "totally different words here now"]})
    dd = rd.from_pandas(docs)
    cands = minhash_candidates(dd, pairs="clique")
    fast = (verify_pairs(cands, dd, 0.5, emit_counts=True)
            .to_pandas().drop_duplicates(["doc_a", "doc_b"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    cands2 = minhash_candidates(dd, pairs="clique")
    dist = (verify_pairs(cands2, dd, 0.5, emit_counts=True,
                         small_threshold=0)
            .to_pandas().drop_duplicates(["doc_a", "doc_b"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist, check_dtype=False)
    assert len(fast) >= 3


def test_bucket_join_semi_anti(ray_session):
    """Existence joins: semi keeps left rows with a key match, anti the
    complement; right-side duplicates never multiply rows."""
    import ray.data as rd

    from engine.joins import bucket_join

    l = pd.DataFrame({"k": [1, 2, 3, 4, 5], "a": list("abcde")})
    r = pd.DataFrame({"k": [2, 2, 2, 4, 9], "junk": range(5)})  # dup keys
    semi = (bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                        how="semi", num_buckets=8)
            .to_pandas().sort_values("k").reset_index(drop=True))
    anti = (bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                        how="anti", num_buckets=8)
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(semi.columns) == ["k", "a"]
    assert semi["k"].tolist() == [2, 4]          # no multiplication
    assert anti["k"].tolist() == [1, 3, 5]
    assert anti["a"].tolist() == ["a", "c", "e"]


def test_grouped_topk_matches_bruteforce(ray_session):
    import ray.data as rd

    from engine.windows import grouped_topk

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, 400),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, 400), unit="s"),
        "event_id": np.arange(400, dtype="int64"),
        "value": rng.integers(0, 50, 400).astype("float64"),  # forces ties
    })
    got = (grouped_topk(rd.from_pandas(df), key="user_id",
                        order_col="value", k=3,
                        tie_cols=["ts", "event_id"], num_buckets=8)
           .to_pandas()
           .sort_values(["user_id", "rank"]).reset_index(drop=True))
    exp = (df.sort_values(["user_id", "value", "ts", "event_id"],
                          ascending=[True, False, True, True],
                          kind="mergesort")
           .groupby("user_id", as_index=False, sort=False).head(3))
    exp = exp.assign(rank=exp.groupby("user_id", sort=False).cumcount() + 1)
    exp = exp.sort_values(["user_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "rank", "event_id", "value"]].astype({"rank": "int64"}),
        exp[["user_id", "rank", "event_id", "value"]].astype({"rank": "int64"}),
        check_dtype=False,
    )


def test_bucket_join_full_outer_matches_pandas(ray_session):
    """how='full' keeps unmatched rows of BOTH sides: left-only rows
    null-fill right columns, right-only buckets (no left rows at all)
    still emit — the branch a left join never exercises."""
    import ray.data as rd

    from engine.joins import bucket_join

    l = pd.DataFrame({"k": [1, 2, 3, 3], "x": [10, 20, 30, 31]})
    r = pd.DataFrame({"k": [2, 3, 99, 100], "y": [200, 300, 990, 991]})
    got = (
        bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                    num_buckets=7, how="full")
        .to_pandas()
        .sort_values(["k", "x", "y"])
        .reset_index(drop=True)
    )
    want = (l.merge(r, on="k", how="outer")
            .sort_values(["k", "x", "y"]).reset_index(drop=True))
    for c in ("k", "x", "y"):
        pd.testing.assert_series_equal(
            got[c].astype("float64"), want[c].astype("float64"),
            check_names=False)


def test_hll_sketch_accuracy_raw_branch(ray_session, tmp_path):
    """events_user_hll on a synthetic table with 500k distinct users —
    far past the linear-counting range of a p=14 sketch — must land
    within 2.5% of the true cardinality (3 sigma of the 0.81% HLL
    standard error); the small oracle corpora only exercise the
    linear-counting branch."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.queries import events_user_hll

    n = 500_000
    uid = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "event_id": pa.array(uid),
        "ts": pa.array(np.full(n, 1_600_000_000_000), type=pa.timestamp("ms")),
        "user_id": pa.array(uid),
        "event_type": pa.array(np.where(uid % 2 == 0, "click", "view")),
        "value": pa.array(np.zeros(n)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = events_user_hll(str(tmp_path))
    want = {"click": n // 2, "view": n // 2}
    for _, row in got.iterrows():
        rel = abs(row.est_users - want[row.event_type]) / want[row.event_type]
        assert rel < 0.025, (row.event_type, row.est_users, rel)


def test_splitmix64_dispersion():
    """Register-index dispersion of the vectorized splitmix64 over
    sequential ids: all 16384 registers hit for 1M keys (a biased
    hash would leave zero registers and skew the HLL estimate)."""
    import numpy as np

    from engine.queries import _splitmix64

    h = _splitmix64(np.arange(1_000_000, dtype=np.int64).view(np.uint64))
    idx = (h >> np.uint64(50)).astype(np.int64)
    assert len(np.unique(idx)) == 1 << 14


def test_mg_heavy_hitters_guarantees(ray_session, tmp_path):
    """Two-pass heavy hitters on a zipf-skewed synthetic events table:
    (a) with a capacity where per-batch trims DO occur, the sketch-
    verified path still returns the EXACT top-k (candidates recounted
    exactly; kth > err proves no dropped key can reach the top-k),
    (b) the MG candidate pass's error bound is honest (survivor
    counters underestimate by <= err),
    (c) a capacity too small for the skew forces the pathlog'd
    exact-fallback branch, and the result is identical."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine import pathlog
    from engine.queries import (_mg_candidates, _rp,
                                events_heavy_users_sketch)

    rng = np.random.default_rng(21)
    # zipf over 30k keys, 300k rows: a handful of keys dominate
    uid = rng.zipf(1.3, 300_000).astype(np.int64) % 30_000
    n = len(uid)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 1_600_000_000_000),
                       type=pa.timestamp("ms")),
        "user_id": pa.array(uid),
        "event_type": pa.array(["click"] * n),
        "value": pa.array(np.zeros(n)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    true = pd.Series(uid).value_counts()
    want = (true.rename_axis("user_id").reset_index(name="cnt")
            .sort_values(["cnt", "user_id"], ascending=[False, True])
            .head(10).reset_index(drop=True))

    pathlog.reset()
    got = events_heavy_users_sketch(str(tmp_path), capacity=1024, k=10)
    assert pathlog.count("heavy_users_sketch", "sketch_verified") == 1
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))

    # (b) honest MG bound: every survivor underestimates by <= err,
    # and trims genuinely happened at this capacity (err > 0)
    merged, err = _mg_candidates(
        _rp(str(tmp_path), "events", ["user_id"]), 1024)
    assert err > 0
    for _, row in merged.iterrows():
        t = int(true[row.user_id])
        assert row.cnt <= t <= row.cnt + err, (row.user_id, row.cnt,
                                               t, err)

    # (c) capacity far below the skew: guarantee fails, exact
    # fallback branch runs, result unchanged
    pathlog.reset()
    fb = events_heavy_users_sketch(str(tmp_path), capacity=4, k=10)
    assert pathlog.count("heavy_users_sketch", "exact_fallback") == 1
    pd.testing.assert_frame_equal(fb.astype("int64"), want.astype("int64"))


def test_loglinear_quantile_sketch(ray_session, tmp_path):
    """events_value_quantiles_sketch on a lognormal synthetic spanning
    ~9 octaves: (a) every estimated quantile is within the guaranteed
    relative error 1/(2L) of the exact percentile_disc value, (b) the
    sketch is batch-boundary-invariant (the (k, sub) histogram of the
    distributed run equals a single-pass local histogram), and (c) the
    positive-domain guard raises on nonpositive values."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from engine.queries import events_value_quantiles_sketch

    rng = np.random.default_rng(11)
    n = 200_000
    v = np.exp(rng.normal(0.0, 2.0, n)) + 0.001
    et = np.where(np.arange(n) % 3 == 0, "click", "view")
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 1_600_000_000_000),
                       type=pa.timestamp("ms")),
        "user_id": pa.array(np.arange(n, dtype=np.int64)),
        "event_type": pa.array(et),
        "value": pa.array(v),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = events_value_quantiles_sketch(str(tmp_path))
    L = 64
    for _, row in got.iterrows():
        sub = v[et == row.event_type]
        sub.sort()
        for p, col in [(0.5, "p50_est"), (0.9, "p90_est"),
                       (0.99, "p99_est")]:
            import math
            exact = sub[math.ceil(p * len(sub)) - 1]
            assert abs(row[col] - exact) / exact <= 1.0 / (2 * L), (
                row.event_type, col, row[col], exact)

    # (b) merge invariance: estimates recomputed from one local
    # single-pass histogram must equal the distributed run's output
    # BIT-exactly (the bucket map and midpoint use only exact float
    # ops, so batch boundaries and merge order cannot move a value)
    import math

    import pandas as pd
    m, e = np.frexp(v)
    k = (e - 1).astype(np.int64)
    s = np.floor((m * 2.0 - 1.0) * L).astype(np.int64)
    local = (pd.DataFrame({"et": et, "k": k, "s": s})
             .groupby(["et", "k", "s"]).size().reset_index(name="n"))
    for _, row in got.iterrows():
        g = local[local["et"] == row.event_type].sort_values(["k", "s"])
        cum = g["n"].to_numpy().cumsum()
        mids = np.ldexp(1.0 + (g["s"].to_numpy() + 0.5) / L,
                        g["k"].to_numpy())
        for p, col in [(0.5, "p50_est"), (0.9, "p90_est"),
                       (0.99, "p99_est")]:
            rank = math.ceil(p * float(cum[-1]))
            assert row[col] == mids[np.searchsorted(cum, rank)], col

    # (c) sign split: a mixed negative/zero/positive corpus — each
    # estimate within the relative-on-|v| bound of the exact
    # percentile_disc (zeros land on the exact zero counter)
    rng2 = np.random.default_rng(13)
    mixed = np.concatenate([
        -np.exp(rng2.normal(0.0, 2.0, 40_000)),
        np.zeros(25_000),
        np.exp(rng2.normal(0.0, 2.0, 35_000)),
    ])
    rng2.shuffle(mixed)
    nm = len(mixed)
    bad = pa.table({
        "event_id": pa.array(np.arange(nm, dtype=np.int64)),
        "ts": pa.array(np.full(nm, 1_600_000_000_000),
                       type=pa.timestamp("ms")),
        "user_id": pa.array(np.arange(nm, dtype=np.int64)),
        "event_type": pa.array(["click"] * nm),
        "value": pa.array(mixed),
        "props": pa.array([""] * nm),
    })
    d2 = tmp_path / "mixed"
    d2.mkdir()
    pq.write_table(bad, d2 / "events.parquet")
    got2 = events_value_quantiles_sketch(str(d2)).iloc[0]
    srt = np.sort(mixed)
    for p, col in [(0.5, "p50_est"), (0.9, "p90_est"),
                   (0.99, "p99_est")]:
        exact = srt[math.ceil(p * nm) - 1]
        assert abs(got2[col] - exact) <= abs(exact) / (2 * L), (
            col, got2[col], exact)
    # p50 falls inside the zero store with these proportions: exact 0
    assert got2["p50_est"] == 0.0


def test_docs_weighted_sample_invariance(ray_session, tmp_path):
    """Efraimidis-Spirakis sample on a 20k-doc synthetic (many Ray
    blocks, so the per-batch nomination margin is exercised): the
    distributed result must equal the single-pass exact libm top-k
    BIT-for-bit, and heavy-weight docs must dominate the sample
    (E[key] is proportional to 1/w)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.queries import _splitmix64, docs_weighted_sample

    n = 20_000
    doc_id = np.arange(n, dtype=np.int64)
    # first half heavy (w=5000), second half light (w=50)
    n_chars = np.where(doc_id < n // 2, 5000, 50).astype(np.int64)
    tbl = pa.table({
        "doc_id": pa.array(doc_id),
        "text": pa.array(["x"] * n),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(n_chars),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = docs_weighted_sample(str(tmp_path))

    h = _splitmix64(doc_id.view(np.uint64))
    u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
    key = np.array([-math.log(x) for x in u]) / n_chars.astype(np.float64)
    ref = (pd.DataFrame({"doc_id": doc_id, "n_chars": n_chars,
                         "es_key": key})
           .sort_values(["es_key", "doc_id"]).head(50)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref, check_exact=True)

    heavy = int((got["n_chars"] == 5000).sum())
    assert heavy >= 45, heavy  # weight ratio 100:1 -> light docs rare
