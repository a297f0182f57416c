"""Measured LSH recall for the blocked cosine near-dup path
(engine.simsearch.cosine_pairs_blocked) on a dup-HEAVY seeded corpus —
the probabilistic-completeness claim (MultiLsh docstring: a pair at
cosine >= t survives one of L tables with 1 - (1 - p^H)^L) carried only
theory until now (VERDICT r3 #8); this emits the measured number next
to the bound at two thresholds.

The oracle corpora can't measure this: their duplicate profile has
recall 1 by construction (few, crisp dups). Here HALF the corpus is
noisy copies spanning similarity 0.90-0.999, so thousands of true pairs
sit near each threshold.

Run: python scripts/lsh_recall.py   -> one JSON line
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(n: int = 6000, d: int = 32, seed: int = 99):
    rng = np.random.default_rng(seed)
    half = n // 2
    base = rng.standard_normal((half, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # copies with noise levels swept so pair similarity covers 0.90-0.999
    eps = rng.uniform(0.03, 0.47, size=(half, 1))
    noise = rng.standard_normal((half, d))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    dup = base + eps * noise
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    return np.vstack([base, dup])


def exact_pairs(m: np.ndarray, thr: float) -> set[tuple[int, int]]:
    sims = m @ m.T
    rows, cols = np.nonzero(np.triu(sims >= thr, k=1))
    return set(zip(rows.tolist(), cols.tolist()))


def theoretical_recall(t: float, n_planes: int = 8, n_tables: int = 16
                       ) -> float:
    p = 1.0 - np.arccos(min(1.0, t)) / np.pi
    return float(1.0 - (1.0 - p ** n_planes) ** n_tables)


def main() -> dict:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from engine.pipeline import tune_for_session
    from engine.simsearch import cosine_pairs_blocked

    tune_for_session()
    m = build_corpus()
    n, d = m.shape
    import pandas as pd

    emb = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [r.tolist() for r in m]})
    out = {"n": int(n), "d": int(d), "n_tables": 16, "n_planes": 8,
           "thresholds": {}}
    for thr in (0.95, 0.99):
        truth = exact_pairs(m, thr)
        got = cosine_pairs_blocked(rd.from_pandas(emb), thr, d,
                                   rows_hint=n).to_pandas()
        found = set(zip(got["vec_a"].astype(int), got["vec_b"].astype(int)))
        hit = len(truth & found)
        recall = hit / len(truth) if truth else 1.0
        out["thresholds"][str(thr)] = {
            "true_pairs": len(truth),
            "found_pairs": len(found),
            "recall": round(recall, 6),
            "theoretical_bound_at_thr": round(theoretical_recall(thr), 6),
            "false_positives": len(found - truth),
        }
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
