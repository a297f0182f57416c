"""The flagship distributed pipeline: Parquet transcripts -> tokenize ->
NER (token-single / token-multi) -> ambiguous-lattice build -> NER-count
pruning -> MD -> morph NER -> alignments -> mentions -> conversation
reassembly (groupby(conv_id) + in-group sort(turn_idx)) -> entity
linking -> union-find canonicalization -> (subj, pred, obj) triple
materialization with exact dedup -> partitioned, resumable Parquet.

Ray-Data-first design (SURVEY.md sections 4, 7):
  - per-turn stages are ONE fused ``map_batches`` actor stage
    (tokenizers + 3 scorers + lattice ops live in actor __init__ state;
    a torch scorer would slot into the same class) — no shuffle.
  - the ONLY wide operations are: the conversation reassembly
    (groupby(conv_id)), the canonicalization label propagation
    (engine.canon, keyed on node id), and the triple dedup
    (groupby(subj,pred,obj) with a map-side pre-dedup combiner).
  - the reassembly shuffle moves only compact mention-level rows, never
    text/lattices (columns are projected before the groupby).
  - the heavy per-turn compute checkpoints per conv-hash bucket with
    manifests ("pre-triples"); a rerun filters completed buckets out AT
    THE READ, so resume skips their compute entirely. The global
    canon+dedup reduce over the (small) pre-triples is cheap to redo.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from .canon import components_auto
from .kgflow import SCENARIOS
from .schema import MENTIONS, TRIPLES, stable_sent_id

def fnv_bucket(s: str, buckets: int) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % buckets


def read_transcripts(path: str):
    """All flagship/docjson/mentions reads come through here, so the
    null-text policy lives here too: a NULL turn becomes an empty turn
    (no tokens -> no mentions), the same NULL == "" rule the documents
    read applies (engine/queries._rp). One Arrow fill_null kernel,
    fused into the read task, pass-through when the block is clean —
    before this, a single NULL text killed the KgTurnProcessor stage."""
    import ray.data as rd

    def _fill(t: pa.Table) -> pa.Table:
        col = t["text"]
        if col.null_count:
            t = t.set_column(t.column_names.index("text"), "text",
                             pc.fill_null(col, ""))
        return t

    return (rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
            .map_batches(_fill, batch_format="pyarrow"))


def input_meta(path: str) -> dict:
    """Cheap input fingerprint from parquet FOOTERS only (no data read):
    file count + total rows. Drives both the auto bucket count and the
    resume lineage check."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    return {"files": len(files), "rows": rows}


# ~256k turns per conv-hash bucket keeps the per-bucket unpack+sort
# list (engine.pipeline._resolve_bucket) bounded regardless of corpus
# size while keeping the PARTITION COUNT low: every map block is split
# into one shuffle piece per partition, so partitions x map-blocks =
# object-store objects — at 64k rows/bucket a 32.7M-turn corpus hit
# ~500 partitions x 16k map batches and the mmap/seal churn drove the
# kernel to 70% sys time (raylet event loop stalling 20 s). 256k rows
# is ~25 MB of packed mention rows per resolve task: bounded heap AND
# 4x fewer pieces.
_TARGET_ROWS_PER_BUCKET = 262144

# ONE switch point for stage B (canon + dedup): at or below this many
# pre-triples the reduce runs driver-local (the distributed path costs
# ~14 s of executor fixed wall for a vocabulary-sized graph); above it
# the distributed canon+dedup runs. Used by BOTH canonicalize_and_dedup
# and run_kg_pipeline so the CLI run and the in-memory path always
# switch strategies at the same size (ADVICE r3). GRAFT_SMALL_B
# overrides for measurement (e.g. =0 forces the distributed branch).
SMALL_GRAPH_THRESHOLD = int(os.environ.get("GRAFT_SMALL_B", 2_000_000))


def auto_num_buckets(rows: int, cpus: int | None = None) -> int:
    """Scale the conv-hash bucket count with the corpus: floor 4x CPUs
    (enough reduce parallelism), target _TARGET_ROWS_PER_BUCKET rows
    per bucket (bounded per-bucket heap), capped only by a sanity
    ceiling. At 100x the corpus the bucket count grows 100x instead of
    the per-bucket heap."""
    cpus = cpus if cpus is not None else _cpus()
    want = max(1, (rows + _TARGET_ROWS_PER_BUCKET - 1) // _TARGET_ROWS_PER_BUCKET)
    return int(min(max(4 * cpus, want), 1 << 20))


def auto_num_partitions(num_buckets: int, cpus: int | None = None) -> int:
    """Shuffle-partition count for the reassembly exchange, DECOUPLED
    from the bucket count (map_groups calls the UDF once per key within
    a partition block, so buckets-per-partition > 1 is free). Ray's
    hash shuffle does one ray.put + one aggregator actor call PER
    (map-block x partition) — measured on this host (2 GB packed rows,
    32 CPUs): <=16k pieces ~26 s, 64k ~41 s, 128k ~214 s — so the
    partition count stays ~CPU-count (one finalize per aggregator) with
    a bucket-count-tied floor that bounds per-partition heap to ~8
    buckets (~130 MB packed at the 64 B/turn measured pack rate)."""
    cpus = cpus if cpus is not None else _cpus()
    return int(min(num_buckets, max(cpus, (num_buckets + 7) // 8)))


def _cpus() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4


def _pool_size(concurrency: int | None) -> int:
    """Actor-pool size for the fused per-turn stage: leave headroom for
    the read/write tasks AND the hash-shuffle aggregator actors so no
    stage starves (a pool that reserves every CPU deadlocks the
    pipeline when the shuffle needs actor slots)."""
    if concurrency is not None:
        return concurrency
    cpus = _cpus()
    return max(2, cpus - 2 - max(1, cpus // 8))


def tune_for_session() -> None:
    """Size Ray Data's shuffle machinery to the session: hash-shuffle
    strategy (the sort-based default plans its map side as ONE task for
    materialized inputs — zero parallelism), with partition/aggregator
    counts bounded by the CPU count so shuffle actors always fit next
    to the per-turn actor pool. Call once after ray.init (bench, CLI,
    tests); the driver's own session keeps Ray defaults."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    cpus = _cpus()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # partitions default = CPU count, NOT 2x: every map block pays one
    # ray.put + one aggregator call per partition, and the measured
    # response (see auto_num_partitions) is flat below ~cpus partitions
    # and superlinear above — 2x cpus put every bare groupby in the
    # congestion zone (token_count_docs ran 8.2 s at sf0.1, 3x its
    # round-2 record, with the 64-partition default).
    ctx.default_hash_shuffle_parallelism = max(4, cpus)
    # reduce-side receive/finalize work runs ON the aggregator actors:
    # one per CPU. Back-to-back sf0.1 matrix (same host conditions,
    # 8.18M turns, 32 CPUs): 32 aggs x 128 buckets 47.0s; 10 x 128
    # 108.4s; 10 x 32 72.7s; 32 x 32 71.5s — aggregator count was the
    # dominant term AND the run-to-run variance source (the old
    # cpus//3 pool serialized partition finalization). Admission-free
    # eps-CPU requests (below) are what make a full-width pool safe
    # next to the map actor pool.
    ctx.max_hash_shuffle_aggregators = cpus
    # Aggregator actors must be admission-FREE: Ray 2.49 sizes their CPU
    # request as min(1, (cpus/2)/num_partitions) per partition, which at
    # high partition counts reserves ~cpus/2 across the pool — together
    # with the per-turn actor pool that starves the 1-CPU read tasks
    # into a permanent `waiting_for_resource` deadlock (observed at
    # sf0.1: 26 map actors + 7 aggregators = 31.7/32 CPUs, reads never
    # scheduled). A near-zero per-partition request keeps scheduling
    # admission open; the OS time-slices actual aggregator compute
    # against the map pool, and streaming backpressure bounds the
    # overlap.
    # NOTE the override is PER PARTITION and an aggregator actor's CPU
    # request is override x (partitions / aggregators) — a value scaled
    # to 1/cpus still summed to cpus/2 across the pool at the 8-CPU leg
    # (0.03 x 16 partitions = 0.5 CPU x 6 aggregators + 5 pool actors
    # = all 8 CPUs, read task starved). A small CONSTANT keeps the
    # whole aggregator pool's admission footprint ~0.1 CPU at any
    # partition count.
    eps = 1e-3
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = eps
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = eps
    ctx.join_operator_actor_num_cpus_per_partition_override = eps


class MentionExtractor:
    """Actor stage: transcript turns in, flat mention rows out.
    Batch-vectorized via engine.fastpath.BatchMentionExtractor (one
    regex tokenize pass, memoized per-token state, batched span scans
    for all five scenario levels) — literal output equality with the
    per-row SentenceProcessor reference path is asserted by
    tests/test_fastpath.py."""

    def __init__(self, levels: tuple[str, ...] = SCENARIOS) -> None:
        from .fastpath import BatchMentionExtractor

        self.ex = BatchMentionExtractor(levels)
        self.levels = levels

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("sent_id", "conv_id", "turn_idx", "level",
                               "surface", "label", "start", "end", "occ")}
        results = self.ex.extract(batch["text"].to_pylist())
        for conv_id, turn_idx, per_level in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            results,
        ):
            sid = stable_sent_id(conv_id, turn_idx)
            for level, ml in per_level.items():
                for surface, label, start, end, occ in ml:
                    out["sent_id"].append(sid)
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["level"].append(level)
                    out["surface"].append(surface)
                    out["label"].append(label)
                    out["start"].append(start)
                    out["end"].append(end)
                    out["occ"].append(occ)
        return pa.Table.from_pydict(out, schema=MENTIONS)


class KgTurnProcessor:
    """Actor stage: transcript turns in, compact per-turn linking rows
    out (only the morph_hybrid scenario is scored — the KG track).
    Output stays small so the conversation reassembly shuffle moves
    mention-level data, not text/lattices.

    The per-turn chain runs batch-vectorized (engine.fastpath: one regex
    tokenize pass, per-unique-token memoized MD segmentation, numpy span
    scans) — tests/test_fastpath.py proves literal output equality with
    the SentenceProcessor reference path the oracle runs. Map-side
    partition packing: all of a batch's turns for one conv-hash bucket
    become ONE shuffle row (bucket, pickled list) so the exchange moves
    ~num_buckets rows per batch instead of one per turn; mention-free
    turns (roughly a quarter) are dropped BEFORE the shuffle."""

    def __init__(self, num_buckets: int = 32,
                 skip_buckets: frozenset = frozenset()) -> None:
        from .fastpath import BatchKgExtractor

        self.ex = BatchKgExtractor()
        self.num_buckets = num_buckets
        # completed buckets on a resume — filtered INSIDE the UDF so
        # no intermediate empty block can skip the actor and leak the
        # transcript schema into the bucket shuffle (fastpath note)
        self.skip_buckets = frozenset(skip_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .fastpath import extract_packs

        return extract_packs(self.ex, batch, self.num_buckets,
                             self.skip_buckets)


_ENTITY_SCHEMA = pa.schema(
    [
        ("mention_id", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("surface", pa.string()),
        ("label", pa.string()),
        ("canon_id", pa.string()),
        ("score", pa.float64()),
    ]
)


def _resolve_bucket(group: pa.Table, emit: str) -> pa.Table:
    """One call per conv-hash BUCKET (not per conversation): unpack the
    map-side packs, sort all turn entries by (conv_id, turn_idx) — the
    in-group half of the reassembly contract — then run the
    order-dependent linking walk per conversation slice. Bounded
    fan-out regardless of #conversations.

    Skew bound: per-bucket heap is ~_TARGET_ROWS_PER_BUCKET turn
    entries EXCEPT when one conversation alone exceeds it — the linking
    walk is order-dependent (each alias resolves against earlier turns
    of the SAME conversation), so a conversation cannot be split across
    workers without changing its output. A pathological conversation
    therefore inflates exactly one bucket; it is surfaced via pathlog
    (no silent caps) rather than silently truncated."""
    from . import colresolve

    payloads = group["payload"].to_pylist()
    if payloads and all(p.startswith(colresolve.MAGIC) for p in payloads):
        return colresolve.resolve_payloads(
            payloads, emit, _ENTITY_SCHEMA, TRIPLES,
            warn_entries=8 * _TARGET_ROWS_PER_BUCKET)

    # compatibility path (foreign / mixed payload versions): decode to
    # tuples and run the reference walk
    from .kgflow import resolve_entries

    entries: list[tuple] = []
    for payload in payloads:
        entries.extend(colresolve.unpack_entries(payload))
    if len(entries) > 8 * _TARGET_ROWS_PER_BUCKET:
        from . import pathlog

        pathlog.note("kg_pipeline", "oversized_bucket",
                     turn_entries=len(entries),
                     target=_TARGET_ROWS_PER_BUCKET)
    # plain tuple sort: (conv_id, turn_idx) lead and are unique per
    # entry, so no key lambda is needed (comparison never reaches the
    # payload fields)
    entries.sort()

    entities, triples = resolve_entries(entries,
                                        emit_entities=emit == "entities")
    if emit == "entities":
        return pa.Table.from_pylist(entities, schema=_ENTITY_SCHEMA)
    return pa.Table.from_pylist(triples, schema=TRIPLES)


def mentions_dataset(path: str, levels: tuple[str, ...] = SCENARIOS,
                     concurrency: int | None = None, batch_size: int = 512):
    return read_transcripts(path).map_batches(
        MentionExtractor,
        fn_constructor_kwargs={"levels": levels},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_size(concurrency),
    )


def raw_triples_dataset(path: str, emit: str = "triples",
                        concurrency: int | None = None, batch_size: int = 16384,
                        num_buckets: int | None = None):
    """transcripts -> per-turn KG rows (compact blob payloads) ->
    conversation reassembly (ONE groupby keyed on hash(conv_id) bucket;
    conversations never split across buckets) -> linking walk ->
    entity/triple rows (pre-canon)."""
    if num_buckets is None:
        num_buckets = auto_num_buckets(input_meta(path)["rows"])
    turns = read_transcripts(path).map_batches(
        KgTurnProcessor,
        fn_constructor_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_size(concurrency),
    )
    # shuffle partitions ~ CPU count, decoupled from the bucket count
    # (see auto_num_partitions — pieces = map-blocks x partitions).
    # fractional-CPU reduce tasks + a HARD task-concurrency cap at the
    # CPU count: num_cpus=0.25 lets resolve tasks pack into the slots
    # the map actor pool leaves free during the overlap phase (at 1.0
    # only cpus-pool run — a serial tail worth ~16 s at sf0.1/32cpu),
    # while concurrency=cpus stops the TAIL (map pool drained, all
    # CPUs free) from admitting 4x CPUs concurrent heavy Python tasks —
    # measured 8x aggregate slowdown at the 32.7M-turn tier (128
    # concurrent resolvers on 32 cores: 38.4k CPU-s vs 1.1k at <=32).
    return turns.groupby(
        "bucket", num_partitions=auto_num_partitions(num_buckets)
    ).map_groups(
        lambda g, emit=emit: _resolve_bucket(g, emit), batch_format="pyarrow",
        num_cpus=0.25, concurrency=_cpus(),
    )


def _batch_prededup(t: pa.Table) -> pa.Table:
    """Map-side combiner for triple dedup: within a batch keep the
    min-(conv_id, turn_idx) row per (subj, pred, obj) so the wide
    groupby moves far fewer rows (SURVEY.md D4)."""
    if t.num_rows == 0:
        return t
    t = t.sort_by(
        [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending"),
         ("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    keys = pc.binary_join_element_wise(
        t["subj"].combine_chunks() if isinstance(t["subj"], pa.ChunkedArray) else t["subj"],
        t["pred"].combine_chunks() if isinstance(t["pred"], pa.ChunkedArray) else t["pred"],
        t["obj"].combine_chunks() if isinstance(t["obj"], pa.ChunkedArray) else t["obj"],
        "\x1f",
    )
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    n = len(keys)
    # vectorized first-of-run mask (no per-row as_py loop)
    neq = pc.not_equal(keys.slice(1, n - 1), keys.slice(0, n - 1))
    mask = pa.concat_arrays(
        [pa.array([True]), neq.combine_chunks() if isinstance(neq, pa.ChunkedArray) else neq]
    )
    return t.filter(mask)


def _dedup_partition(group: pa.Table) -> pa.Table:
    """One call per hash PARTITION of triple keys (not per key):
    pre-dedup sort keeps the min-provenance row per (subj,pred,obj)."""
    out = _batch_prededup(group)
    return out.drop_columns(["tbucket"]) if "tbucket" in out.column_names else out


def _remap_string_column(col, mapping: dict[str, str]) -> pa.Array:
    """Rewrite a (chunked) string column through ``mapping``, touching
    only the DISTINCT values: dictionary-encode (C++), map the small
    dictionary through Python, take by the original indices. Row count
    never enters Python — the per-row .to_pylist()/dict.get loop cost
    8.5 s on a 1.6M-row stage B; this form is ~0.3 s."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(arr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dict_vals = enc.dictionary.to_pylist()
    new_vals = pa.array([mapping.get(v, v) for v in dict_vals], pa.string())
    return pc.take(new_vals, enc.indices)


def local_canonicalize_and_dedup(table: pa.Table) -> pa.Table:
    """Driver-side stage B for reduced (pre-deduped, vocabulary-sized)
    triple sets: same pure functions (local union-find + sort-dedup)."""
    from .canon import local_components
    from .link import STATIC_CANON_EDGES, nil_edges, resolve_component_root

    nil_set: set[str] = set()
    for col in ("subj", "obj"):
        arr = table[col]
        vals = pc.unique(
            arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        )
        nil_set.update(vals.filter(pc.starts_with(vals, "nil:")).to_pylist())
    nil_keys = sorted(nil_set)
    mapping: dict[str, str] = {}
    if nil_keys:
        roots = local_components(STATIC_CANON_EDGES + nil_edges(nil_keys))
        mapping = {k: resolve_component_root(roots.get("n:" + k, "n:" + k))
                   for k in nil_keys}
    if mapping:
        table = table.set_column(table.schema.get_field_index("subj"), "subj",
                                 _remap_string_column(table["subj"], mapping))
        table = table.set_column(table.schema.get_field_index("obj"), "obj",
                                 _remap_string_column(table["obj"], mapping))
    return _batch_prededup(table)


def canonicalize_and_dedup(triples_ds, num_partitions: int = 16,
                           input_stable: bool = False,
                           small_threshold: int = SMALL_GRAPH_THRESHOLD):
    """Global canon + exact dedup over (pre-)triples.

    1. collect distinct nil subj/obj keys (a vocabulary-sized set),
    2. connected components over nil/skeleton/static-canon edges
       (engine.canon — distributed label propagation),
    3. broadcast the resulting nil->canon mapping (small side) and
       rewrite subj/obj in map_batches,
    4. dedup: map-side pre-dedup combiner, then
       groupby(subj,pred,obj).map_groups(first-by-provenance).
    """
    import ray
    import ray.data as rd

    from .link import STATIC_CANON_EDGES, nil_edges, resolve_component_root

    from . import pathlog

    if not input_stable:
        triples_ds = triples_ds.materialize()  # consumed twice (keys + rewrite)
    # scale-aware stage B: the pre-triples are already per-bucket
    # pre-deduped, so a vocabulary-sized set runs the reduce driver-side
    # in one pass (same pure functions); large sets stay distributed
    n_pre = triples_ds.count() if small_threshold else None
    if small_threshold and n_pre <= small_threshold:
        pathlog.note("canon_dedup", "driver_local",
                     n=n_pre, threshold=small_threshold)
        parts = [t for t in ray.get(triples_ds.to_arrow_refs()) if t.num_rows]
        table = (pa.concat_tables(parts).combine_chunks() if parts
                 else pa.Table.from_pylist([], schema=TRIPLES))
        return rd.from_arrow(local_canonicalize_and_dedup(table))

    pathlog.note("canon_dedup", "distributed", threshold=small_threshold)

    def nil_keys_batch(t: pa.Table) -> pa.Table:
        vals = set()
        for col in ("subj", "obj"):
            arr = t[col]
            u = pc.unique(
                arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            )
            vals.update(u.filter(pc.starts_with(u, "nil:")).to_pylist())
        return pa.table({"key": pa.array(sorted(vals), pa.string())})

    nil_keys = list(
        triples_ds.map_batches(nil_keys_batch, batch_format="pyarrow").unique("key")
        or []
    )
    mapping: dict[str, str] = {}
    if nil_keys:
        edges = STATIC_CANON_EDGES + nil_edges(sorted(nil_keys))
        edge_ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
        roots = components_auto(edge_ds, num_partitions=num_partitions)
        for row in roots.iter_rows():
            if row["node"].startswith("n:"):
                mapping[row["node"][2:]] = resolve_component_root(row["root"])
    map_ref = ray.put(mapping)

    def rewrite(t: pa.Table, ref=map_ref) -> pa.Table:
        m = ray.get(ref)
        if not m:
            return _batch_prededup(t)
        t = t.set_column(t.schema.get_field_index("subj"), "subj",
                         _remap_string_column(t["subj"], m))
        t = t.set_column(t.schema.get_field_index("obj"), "obj",
                         _remap_string_column(t["obj"], m))
        return _batch_prededup(t)

    def add_tbucket(t: pa.Table) -> pa.Table:
        # vectorized triple-key bucketing: FNV only the DISTINCT values
        # per column (canon ids and predicates repeat heavily), then
        # combine the per-column hashes position-wise with odd mixing
        # constants in uint64 wraparound — no per-row Python hashing.
        # Only the partition ASSIGNMENT depends on this; any uniform
        # deterministic hash is correct.
        import numpy as np

        mix = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                        0x165667B19E3779F9], dtype=np.uint64)
        acc = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, col in enumerate(("subj", "pred", "obj")):
                arr = t[col]
                enc = pc.dictionary_encode(
                    arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
                    else arr
                )
                if isinstance(enc, pa.ChunkedArray):
                    enc = enc.combine_chunks()
                dvals = np.array(
                    [np.uint64(fnv_bucket(v, 1 << 63)) for v in
                     enc.dictionary.to_pylist()],
                    dtype=np.uint64,
                )
                idx = enc.indices.to_numpy(zero_copy_only=False)
                acc ^= dvals[idx] * mix[i]
            # splitmix64 finisher: the xor of three column hashes
            # correlates (pred vocabulary is tiny) — avalanche before
            # the modulus for uniform bucket occupancy
            acc ^= acc >> np.uint64(30)
            acc *= np.uint64(0xBF58476D1CE4E5B9)
            acc ^= acc >> np.uint64(27)
            acc *= np.uint64(0x94D049BB133111EB)
            acc ^= acc >> np.uint64(31)
        return t.append_column(
            "tbucket", pa.array((acc % 64).astype(np.int32), pa.int32())
        )

    rewritten = triples_ds.map_batches(rewrite, batch_format="pyarrow")
    return (
        rewritten.map_batches(add_tbucket, batch_format="pyarrow")
        .groupby("tbucket", num_partitions=64)  # = tbucket key count
        .map_groups(_dedup_partition, batch_format="pyarrow")
    )


def triples_dataset(path: str, concurrency: int | None = None,
                    batch_size: int = 16384, num_partitions: int = 16,
                    small_threshold: int = SMALL_GRAPH_THRESHOLD,
                    num_buckets: int | None = None):
    """Full in-memory (lazy) flagship graph: transcripts -> deduped,
    canonicalized triples Dataset. small_threshold=0 forces the fully
    distributed stage B."""
    raw = raw_triples_dataset(path, "triples", concurrency, batch_size,
                              num_buckets=num_buckets)
    return canonicalize_and_dedup(raw, num_partitions=num_partitions,
                                  small_threshold=small_threshold)


class DepProcessor:
    """Actor stage for the J9 verbosity-2 surface: transcript turns in,
    per-turn morpheme rows with (id, head, deprel) out as a
    list<struct> column (api_main.py:338-351 zip semantics via
    ops/lattice.dep_info; keep_intermediate analog of config.py).
    Batch-vectorized via engine.fastpath.BatchDepExtractor (memoized
    per-token pruned-MD segmentation; no per-row scorer/lattice work) —
    output equality with SentenceProcessor(with_dep=True) asserted in
    tests/test_fastpath.py."""

    def __init__(self) -> None:
        from .fastpath import BatchDepExtractor

        self.ex = BatchDepExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .schema import DEP_TURNS

        rows = {"conv_id": [], "turn_idx": [], "sent_id": [], "morphs": []}
        results = self.ex.extract(batch["text"].to_pylist())
        for conv_id, turn_idx, (forms, tids, dep) in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            results,
        ):
            morphs = [
                {"id": mid, "form": form, "token_id": tid,
                 "head": head, "deprel": rel}
                for form, tid, (mid, head, rel) in zip(forms, tids, dep)
            ]
            rows["conv_id"].append(conv_id)
            rows["turn_idx"].append(turn_idx)
            rows["sent_id"].append(stable_sent_id(conv_id, turn_idx))
            rows["morphs"].append(morphs)
        return pa.Table.from_pydict(rows, schema=DEP_TURNS)


def dep_dataset(ds, concurrency: int = 4, batch_size: int = 2048):
    """Transcripts Dataset -> DEP_TURNS rows (morpheme dependency info
    per turn) on an actor pool."""
    return ds.map_batches(DepProcessor, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size)


# ---------------------------------------------------------------------------
# resumable checkpointed run (north rule: per-partition lineage + metrics)
# ---------------------------------------------------------------------------
def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "pre_triples", "_manifest")


def completed_buckets(out_dir: str, input_path: str | None = None,
                      fingerprint: dict | None = None,
                      num_buckets: int | None = None) -> set[int]:
    """Buckets whose manifest is complete AND matches the CURRENT input
    lineage (path + footer fingerprint + bucket count). A manifest from
    a different input / layout is stale, not done — rerunning into an
    existing out_dir with new data recomputes instead of mixing corpora
    (SURVEY.md section 7.4 'manifests with input fingerprint')."""
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    done = set()
    for name in os.listdir(d):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
            if not m.get("complete"):
                continue
            if input_path is not None and m.get("input") != input_path:
                continue
            if fingerprint is not None and m.get("fingerprint") != fingerprint:
                continue
            if num_buckets is not None and m.get("num_buckets") != num_buckets:
                continue
            done.add(int(m["bucket"]))
    return done


def run_kg_pipeline(
    input_path: str,
    out_dir: str,
    num_buckets: int | None = None,
    concurrency: int | None = None,
    # 16384-row map batches: each batch emits <= num_buckets packed
    # shuffle rows and ONE block, and shuffle pieces scale as
    # map-blocks x partitions — small batches drove object-store
    # mmap churn at the 32.7M-turn tier (see _TARGET_ROWS_PER_BUCKET)
    batch_size: int = 16384,
    num_partitions: int = 16,
) -> dict:
    """Checkpointed flagship run. Stage A (heavy, resumable): per-turn
    scoring + conversation resolve, written per conv-hash bucket with a
    lineage manifest (input path + footer fingerprint, row counts,
    complete flag). Stage B (cheap, rerun on resume): global canon +
    dedup + final partitioned write. Returns run metrics.

    num_buckets=None derives the bucket count from the input row count
    (auto_num_buckets): per-bucket work stays bounded as the corpus
    grows and reduce parallelism scales with it."""
    import ray.data as rd

    from . import pathlog

    meta = input_meta(input_path)
    if num_buckets is None:
        num_buckets = auto_num_buckets(meta["rows"])
        pathlog.note("kg_pipeline", "auto_buckets", rows=meta["rows"],
                     num_buckets=num_buckets)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    done = completed_buckets(out_dir, input_path, meta, num_buckets)
    # physically drop STALE checkpoints (manifest exists but lineage
    # mismatch): stage B reads the whole pre_triples dir, so data from a
    # different input/bucket-layout must not survive on disk
    stale = completed_buckets(out_dir) - done
    if stale:
        import shutil

        pathlog.note("kg_pipeline", "stale_buckets_dropped",
                     n=len(stale), input=input_path)
        for b in stale:
            shutil.rmtree(os.path.join(out_dir, "pre_triples", f"bucket={b}"),
                          ignore_errors=True)
            try:
                os.remove(os.path.join(_manifest_dir(out_dir), f"bucket-{b}.json"))
            except FileNotFoundError:
                pass

    ds = read_transcripts(input_path)
    # the resume keep-filter rides inside the extract UDF (see
    # KgTurnProcessor.__init__): a separate map_batches(keep) stage
    # emitted 0-row transcript-schema blocks once a block's buckets
    # were all complete, Ray skipped the downstream UDF on them, and
    # the schema-less block crashed the bucket hash shuffle
    turns = ds.map_batches(
        KgTurnProcessor,
        fn_constructor_kwargs={"num_buckets": num_buckets,
                               "skip_buckets": frozenset(done)},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool_size(concurrency),
    )

    metrics_schema = pa.schema([("bucket", pa.int64()), ("rows", pa.int64())])

    def resolve_and_write(group: pa.Table, out_dir=out_dir, inp=input_path,
                          meta=meta, nb=num_buckets) -> pa.Table:
        """Fused stage: ONE shuffle keyed on the conv-hash bucket does
        the conversation reassembly AND the checkpointed write — the
        resolve output never re-shuffles."""
        if group.num_rows == 0:
            return metrics_schema.empty_table()
        b = group["bucket"][0].as_py()
        triples = _resolve_bucket(group, "triples")
        triples = _batch_prededup(triples)  # combiner before stage B
        pdir = os.path.join(out_dir, "pre_triples", f"bucket={b}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "part.parquet.tmp")
        final = os.path.join(pdir, "part.parquet")
        import pyarrow.parquet as pq

        pq.write_table(triples, tmp)
        os.replace(tmp, final)  # atomic
        man = {"bucket": b, "input": inp, "fingerprint": meta,
               "num_buckets": nb, "pack_rows": group.num_rows,
               "triple_rows": triples.num_rows, "complete": True}
        mtmp = os.path.join(_manifest_dir(out_dir), f"bucket-{b}.json.tmp")
        mfin = os.path.join(_manifest_dir(out_dir), f"bucket-{b}.json")
        with open(mtmp, "w") as f:
            json.dump(man, f)
        os.replace(mtmp, mfin)
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "rows": pa.array([triples.num_rows], pa.int64())},
                        schema=metrics_schema)

    import time as _time

    prof = os.environ.get("GRAFT_PROFILE") == "1"
    t0 = _time.perf_counter()
    if len(done) < num_buckets:
        # partitions ~ CPUs, decoupled from buckets (auto_num_partitions);
        # num_cpus=0.25 + concurrency=cpus: pack into slots the map
        # pool leaves free during overlap, but never oversubscribe the
        # drained tail (see raw_triples_dataset)
        metrics = turns.groupby(
            "bucket", num_partitions=auto_num_partitions(num_buckets)
        ).map_groups(
            resolve_and_write, batch_format="pyarrow", num_cpus=0.25,
            concurrency=_cpus(),
        )
        stage_a = {r["bucket"]: r["rows"] for r in metrics.iter_rows()}
        # a bucket no conversation hashes into produces no group and
        # so no manifest — but it IS complete (zero rows). Without
        # this, a fully-finished tiny/skewed run never reaches
        # done == num_buckets and every resume recomputes forever.
        for b in range(num_buckets):
            if b in done or b in stage_a:
                continue
            man = {"bucket": b, "input": input_path, "fingerprint": meta,
                   "num_buckets": num_buckets, "pack_rows": 0,
                   "triple_rows": 0, "complete": True}
            mtmp = os.path.join(_manifest_dir(out_dir),
                                f"bucket-{b}.json.tmp")
            mfin = os.path.join(_manifest_dir(out_dir),
                                f"bucket-{b}.json")
            with open(mtmp, "w") as f:
                json.dump(man, f)
            os.replace(mtmp, mfin)
        if prof:
            print(f"[prof] stage_a {_time.perf_counter()-t0:.1f}s", flush=True)
            print(metrics.stats(), flush=True)
    else:
        stage_a = {}

    # Stage B: global reduce over checkpointed pre-triples. The
    # manifests record EXACT per-bucket pre-triple counts, so the
    # scale switch costs nothing: a vocabulary-sized graph (every
    # bucket already pre-deduped) runs the whole reduce driver-side
    # with plain pyarrow — no Ray Data executor launches (each costs
    # ~1-2 s of fixed wall, x4 datasets they dominated stage B at
    # sf0.1: ~14 s for a 5.6k-row graph). Large graphs keep the
    # distributed canon+dedup path.
    from . import pathlog

    pre_rows = sum(
        json.load(open(os.path.join(_manifest_dir(out_dir), f)))["triple_rows"]
        for f in os.listdir(_manifest_dir(out_dir)) if f.endswith(".json")
    )
    import shutil as _shutil

    final_dir = os.path.join(out_dir, "triples")
    if pre_rows <= SMALL_GRAPH_THRESHOLD:
        import pyarrow.parquet as pq

        import glob as _glob

        pathlog.note("kg_pipeline", "stage_b_driver_local", rows=pre_rows)
        parts = sorted(_glob.glob(
            os.path.join(out_dir, "pre_triples", "bucket=*", "*.parquet")))
        if parts:
            import pyarrow.dataset as _pds

            pre_tbl = _pds.dataset(parts).to_table()  # threaded read
        else:
            pre_tbl = TRIPLES.empty_table()
        final_tbl = local_canonicalize_and_dedup(pre_tbl)
        n = final_tbl.num_rows
        _shutil.rmtree(final_dir, ignore_errors=True)
        os.makedirs(final_dir, exist_ok=True)
        pq.write_table(final_tbl, os.path.join(final_dir, "part-0.parquet"))
        if prof:
            print(f"[prof] stage_b {_time.perf_counter()-t0:.1f}s", flush=True)
    else:
        pathlog.note("kg_pipeline", "stage_b_distributed", rows=pre_rows)
        pre = rd.read_parquet(os.path.join(out_dir, "pre_triples"))
        final_ds = canonicalize_and_dedup(pre, num_partitions=num_partitions,
                                          input_stable=True)
        final_ds = final_ds.materialize()
        n = final_ds.count()
        if prof:
            print(f"[prof] stage_b {_time.perf_counter()-t0:.1f}s", flush=True)
        # stage B rebuilds the full graph every run; write_parquet
        # APPENDS into an existing dir, so clear previous files first
        _shutil.rmtree(final_dir, ignore_errors=True)
        final_ds.write_parquet(final_dir)
    with open(os.path.join(out_dir, "run_manifest.json"), "w") as f:
        json.dump(
            {"input": input_path, "triples": n, "new_bucket_rows": stage_a,
             "resumed_buckets": sorted(done)},
            f,
        )
    return {"triples": n, "new_bucket_rows": stage_a, "resumed_buckets": sorted(done)}
