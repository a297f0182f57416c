"""Pipeline configuration (the reference's key=value NCRF++ config +
MODEL_PATHS registry surface, utils/data.py:395-585 / config.py:5-19,
re-expressed as a dataclass; loadable from JSON/YAML-like dicts)."""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class PipelineConfig:
    # per-turn actor stage
    batch_size: int = 512
    concurrency: int | None = None  # None -> cpus-2 (engine.pipeline._pool_size)
    num_cpus_per_actor: float = 1.0
    # scenarios to score in the mentions pipeline
    levels: tuple[str, ...] = (
        "token_single", "multi_align", "morph_yap", "morph_hybrid",
        "morph_hybrid_tok",
    )
    # wide ops
    num_partitions: int = 16
    num_buckets: int = 32           # checkpoint buckets (hash(conv_id))
    # canonicalization
    cc_small_threshold: int = 100_000
    # dedup extensions
    minhash_num_perm: int = 64
    minhash_bands: int = 16
    minhash_k_shingle: int = 3
    jaccard_threshold: float = 0.8
    # MD decode route: "joint" (CLI flagship) or "md" (API route) —
    # the reference's own TODO (api_main.py:133-137) flags the split
    md_variant: str = "joint"
    # flags
    keep_intermediate: bool = False  # verbosity analog (schema.py:32-35)
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        extra = {k: v for k, v in d.items() if k not in cls.__dataclass_fields__}
        cfg = cls(**known)
        cfg.extra.update(extra)
        return cfg

    def to_dict(self) -> dict:
        return asdict(self)
