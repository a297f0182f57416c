"""Single-host memory-bandwidth probe for the scaling harness.

The north rule's scaling criterion compares N-node vs 4N-node CLUSTERS
(each node with its own memory controllers). Emulating it on one host
with pinned core sets adds a penalty no real cluster pays: all workers
share one memory system, and this workload (regex tokenize + span scan
+ pack/pickle over strings) is memory-traffic-heavy, so per-core
throughput drops as occupancy rises. This module measures that drop
with ZERO engine overhead — plain pinned processes running the
map-stage kernel on a real corpus batch — giving the hardware ceiling
that bounds any engine's measurable strong-scaling ratio on this host.

Measured on the 32-core sandbox host (6 iterations x 16384 turns):
1 proc 28.6k turns/s/core, 8 procs 30.1k, 32 procs 22.3k
=> 8->32 ceiling (agg32/agg8)/4 = 0.742; 4->16 ceiling 0.829.
"""

from __future__ import annotations

import glob
import os


def _corpus_batch(n_rows: int = 16384):
    """One real transcript batch from the largest cached bench corpus
    (falls back to generating the sf0.01 tier if no cache exists)."""
    import pyarrow.parquet as pq

    dirs = sorted(
        glob.glob("/tmp/graft_transcripts/*"),
        key=lambda d: -len(glob.glob(os.path.join(d, "*.parquet"))),
    )
    for d in dirs:
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if files:
            t = pq.read_table(files[0], columns=["conv_id", "turn_idx", "text"])
            if t.num_rows >= n_rows:
                return t.slice(0, n_rows)
    from .queries import transcripts_path

    files = sorted(glob.glob(
        os.path.join(transcripts_path("/root/testdata/sf0.01"), "*.parquet")))
    t = pq.read_table(files[0], columns=["conv_id", "turn_idx", "text"])
    return t.slice(0, min(n_rows, t.num_rows))


def probe_one(args: tuple[int, int]) -> float:
    """Worker: pin to one core, run the map-stage kernel, return its
    turns/sec. Top-level so multiprocessing spawn can import it."""
    core, n_iter = args
    return _probe_kernel(core, n_iter)


def _probe_kernel(core: int, n_iter: int, barrier=None) -> float:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass  # affinity already restricted (e.g. inside taskset)
    import time

    from .fastpath import BatchKgExtractor, extract_packs

    batch = _corpus_batch()
    ex = BatchKgExtractor()
    extract_packs(ex, batch.slice(0, 2048), 128)  # warm caches/JIT-ish
    if barrier is not None:
        barrier.wait()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        extract_packs(ex, batch, 128)
    return batch.num_rows * n_iter / (time.perf_counter() - t0)


def _probe_worker(core: int, n_iter: int, barrier, q) -> None:
    q.put(_probe_kernel(core, n_iter, barrier))


def probe_parallel(nproc: int, n_iter: int = 4) -> float:
    """Aggregate turns/s of ``nproc`` pinned workers over fully
    overlapping measurement windows: ONE process per core with a start
    barrier after per-worker warmup, so every rate is measured at true
    nproc-way concurrency. (Pool.map's task-to-worker assignment is not
    1:1 — a worker could run two tasks back-to-back while another
    idles, measuring some rates at lower concurrency; ADVICE r3.)"""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(nproc)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_probe_worker, args=(i, n_iter, barrier, q))
        for i in range(nproc)
    ]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total
