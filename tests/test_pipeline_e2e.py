"""End-to-end: distributed Ray pipeline vs the single-process oracle
(FIXTURES.md F6): multiset P/R == 1.0 for mentions and triples, per-turn
text-equality invariant, determinism, and checkpoint/resume."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.eval import MENTION_KEYS, TRIPLE_KEYS, evaluate_tables
from engine.oracle import run_oracle


@pytest.fixture(scope="module")
def oracle_out(tiny_transcripts):
    _path, table = tiny_transcripts
    return run_oracle(table)


def _ds_to_table(ds) -> pa.Table:
    tables = ds.to_arrow_refs()
    import ray

    parts = [t for t in ray.get(tables) if t.num_rows]
    return pa.concat_tables(parts) if parts else pa.table({})


def test_turn_text_equality_invariant(ray_session, tiny_transcripts):
    """North-rule invariant: reassembling by (conv_id, turn_idx) after
    the shuffle reproduces the input texts exactly."""
    import ray.data as rd

    path, table = tiny_transcripts
    ds = rd.read_parquet(path).sort(["conv_id", "turn_idx"])
    got = _ds_to_table(ds).combine_chunks()
    want = table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got["text"].to_pylist() == want["text"].to_pylist()
    assert got["conv_id"].to_pylist() == want["conv_id"].to_pylist()


def test_mentions_match_oracle(ray_session, tiny_transcripts, oracle_out):
    from engine.pipeline import mentions_dataset

    path, _ = tiny_transcripts
    got = _ds_to_table(mentions_dataset(path, batch_size=64))
    p, r, f = evaluate_tables(oracle_out["mentions"], got, MENTION_KEYS)
    assert (p, r) == (1.0, 1.0), (p, r)
    assert got.num_rows == oracle_out["mentions"].num_rows


def test_triples_match_oracle(ray_session, tiny_transcripts, oracle_out):
    """small_threshold=0 forces the fully-distributed canon+dedup stage
    (the default scale-aware path is covered by the determinism test)."""
    from engine.pipeline import triples_dataset

    path, _ = tiny_transcripts
    got = _ds_to_table(triples_dataset(path, batch_size=64, small_threshold=0))
    p, r, f = evaluate_tables(oracle_out["triples"], got, TRIPLE_KEYS)
    assert (p, r) == (1.0, 1.0), (p, r)
    # provenance winner = min (conv_id, turn_idx) — full-row equality
    got_rows = sorted(map(tuple, got.to_pydict().values() and zip(
        *[got[c].to_pylist() for c in ["subj", "pred", "obj", "conv_id", "turn_idx"]])))
    want_rows = sorted(zip(
        *[oracle_out["triples"][c].to_pylist()
          for c in ["subj", "pred", "obj", "conv_id", "turn_idx"]]))
    assert got_rows == want_rows


def test_determinism_two_runs(ray_session, tiny_transcripts):
    from engine.pipeline import triples_dataset

    path, _ = tiny_transcripts
    a = _ds_to_table(triples_dataset(path, batch_size=64))
    b = _ds_to_table(triples_dataset(path, batch_size=32))
    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    ra = sorted(zip(*[a[c].to_pylist() for c in key]))
    rb = sorted(zip(*[b[c].to_pylist() for c in key]))
    assert ra == rb


def test_resume_from_manifests(ray_session, tiny_transcripts, oracle_out, tmp_path):
    """Kill-and-rerun semantics: pre-complete some buckets, rerun, and
    the final triples still exactly match the oracle while the completed
    buckets are skipped (FIXTURES.md F6.5)."""
    from engine.pipeline import run_kg_pipeline

    path, _ = tiny_transcripts
    out1 = str(tmp_path / "full")
    m1 = run_kg_pipeline(path, out1, num_buckets=8, batch_size=64)
    assert m1["resumed_buckets"] == []

    # simulate a crash after some buckets: copy 3 completed buckets
    out2 = str(tmp_path / "resumed")
    os.makedirs(os.path.join(out2, "pre_triples", "_manifest"), exist_ok=True)
    import shutil

    for b in (0, 1, 2):
        src = os.path.join(out1, "pre_triples", f"bucket={b}")
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(out2, "pre_triples", f"bucket={b}"))
            shutil.copy(
                os.path.join(out1, "pre_triples", "_manifest", f"bucket-{b}.json"),
                os.path.join(out2, "pre_triples", "_manifest", f"bucket-{b}.json"),
            )
    m2 = run_kg_pipeline(path, out2, num_buckets=8, batch_size=64)
    assert set(m2["resumed_buckets"]) <= {0, 1, 2}

    import ray.data as rd

    final = _ds_to_table(rd.read_parquet(os.path.join(out2, "triples")))
    p, r, _ = evaluate_tables(oracle_out["triples"], final, TRIPLE_KEYS)
    assert (p, r) == (1.0, 1.0)
    assert final.num_rows == oracle_out["triples"].num_rows


def test_resume_invalidates_on_input_change(ray_session, tiny_transcripts,
                                            oracle_out, tmp_path):
    """Rerunning into an existing out_dir with a DIFFERENT input must
    recompute: manifests from the old input are stale, not done
    (VERDICT r2 'What's wrong' #1)."""
    import ray.data as rd

    from engine.pipeline import completed_buckets, input_meta, run_kg_pipeline

    path, table = tiny_transcripts
    out = str(tmp_path / "out")

    # first run over a TRUNCATED copy of the corpus
    small_dir = str(tmp_path / "small_input")
    os.makedirs(small_dir)
    pq.write_table(table.slice(0, max(1, table.num_rows // 3)),
                   os.path.join(small_dir, "part.parquet"))
    m1 = run_kg_pipeline(small_dir, out, num_buckets=8, batch_size=64)
    assert completed_buckets(out, small_dir, input_meta(small_dir), 8)

    # second run, SAME out_dir, full corpus: nothing may be resumed
    m2 = run_kg_pipeline(path, out, num_buckets=8, batch_size=64)
    assert m2["resumed_buckets"] == []

    final = _ds_to_table(rd.read_parquet(os.path.join(out, "triples")))
    p, r, _ = evaluate_tables(oracle_out["triples"], final, TRIPLE_KEYS)
    assert (p, r) == (1.0, 1.0), "stale buckets leaked into the final graph"
    assert final.num_rows == oracle_out["triples"].num_rows


def test_many_buckets_stays_green(ray_session, tiny_transcripts, oracle_out,
                                  tmp_path):
    """num_buckets >> default: the bucket count is a pure partitioning
    knob — results identical (VERDICT r2 'Next round' #2)."""
    import ray.data as rd

    from engine.pipeline import auto_num_buckets, run_kg_pipeline

    # auto sizing: floor 4x cpus, grows ~rows/256k, sane cap
    assert auto_num_buckets(1_000, cpus=4) == 16
    assert auto_num_buckets(8_200_000, cpus=32) == 128
    # 1e10 rows -> ~256k rows per bucket; the 2^20 ceiling kicks in later
    assert auto_num_buckets(10_000_000_000, cpus=32) == 38147
    assert auto_num_buckets(400_000_000_000_000, cpus=32) == 1 << 20

    path, _ = tiny_transcripts
    out = str(tmp_path / "many")
    run_kg_pipeline(path, out, num_buckets=101, batch_size=64)
    final = _ds_to_table(rd.read_parquet(os.path.join(out, "triples")))
    p, r, _ = evaluate_tables(oracle_out["triples"], final, TRIPLE_KEYS)
    assert (p, r) == (1.0, 1.0)
    assert final.num_rows == oracle_out["triples"].num_rows
