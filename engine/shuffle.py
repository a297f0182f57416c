"""Shuffle sizing helpers.

A bucketed co-group (hash(key) % B column) has AT MOST B distinct
shuffle keys, so hash-shuffle partitions beyond B are pure overhead —
and measured on this host, 64 partitions over a 100k-row exchange cost
2x the wall of 16 (aggregator/partition task fixed costs). Partitions
therefore size to min(num_buckets, max(4, CPUs/2)): bounded by the key
space, scaled with the session, and at the 100-TB end num_buckets
itself is what must grow (raise B for more reduce parallelism)."""

from __future__ import annotations


def bucket_partitions(num_buckets: int) -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) or 8
    except Exception:
        cpus = 8
    return max(4, min(num_buckets, cpus // 2))
