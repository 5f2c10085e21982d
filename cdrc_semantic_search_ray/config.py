"""Engine configuration.

Analogue of the reference's TOML → pydantic settings layer
(/root/reference/src/common/utils.py:11-39, /root/reference/config/config.toml)
— a single validated, static schema. We use a frozen dataclass (stdlib-only)
with the same spirit: every tunable in one place, validated at construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # ---- embedding (ref: config.toml:7 embed_dim=3072, cosine) ------------
    embed_dim: int = 64            # deterministic hashed embedder dim (bench: 256)
    embed_seed: int = 42

    # ---- linking (ref: config.toml:13-15 top_k=30, alpha=0.75) ------------
    link_top_k: int = 3
    link_tau: float = 0.60         # min cosine for an embedding-based link
    # exact alias match always wins (the "sparse" side of the reference's
    # hybrid dense+sparse retrieval, collapsed to a deterministic fast path)

    # ---- canonicalization / LSH blocking ----------------------------------
    canon_tau: float = 0.85        # min cosine to propose a canon-merge pair
    lsh_bands: int = 8
    lsh_rows: int = 4              # bits per band; bands*rows hyperplanes
    salt_threshold: int = 512      # block sizes above this get salted
    salt_factor: int = 8
    max_pairs_per_block: int = 20_000
    pair_vec_broadcast_limit: int = 2_000_000  # vector tables <= this many
    #                                rows broadcast one (ids, matrix) to the
    #                                pair-scoring stage; larger ones attach
    #                                vectors via two bucketed hash joins
    #                                (stages/blocking.score_pairs)
    canon_max_rounds: int = 16     # label-propagation fixpoint bound
    canon_driver_threshold: int = 2_000_000  # pair sets <= this collapse on
    #                                the driver (SURVEY.md §7.4 residual
    #                                collapse); larger run distributed rounds
    canon_driver_entities: int = 100_000  # catalogues <= this canonicalize
    #                                entirely on the driver (same blocking/
    #                                pair/UF code, zero Ray jobs)
    provenance_cap: int = 8        # provenance samples kept per edge
    resolve_broadcast_limit: int = 5_000_000  # link tables <= this broadcast
    #                                to workers; larger ones resolve via the
    #                                bucketed shuffle path (kg.py:
    #                                resolve_triples_shuffled)
    canon_broadcast_limit: int = 5_000_000  # canon label maps <= this many
    #                                entries broadcast as arrow arrays;
    #                                larger ones apply via a bucketed
    #                                left-outer hash_join and build_graph
    #                                switches to the fully shuffled resolve —
    #                                no unbounded driver materialization on
    #                                the flagship path (round-2 VERDICT #1)

    # ---- execution sizing --------------------------------------------------
    use_actor_pools: bool = False  # True = model stages run as actor pools
    #                                (the GPU/expensive-state shape per the
    #                                north star); False = task map_batches
    #                                with per-worker lru caches — identical
    #                                semantics, no pool-spawn latency for the
    #                                cheap deterministic sandbox stand-ins
    batch_size: int = 1024         # rows per batch for actor-pool stages
    extract_batch_size: int = 256  # conversations per batch (≈8 turns each);
    #                                smaller batches → enough batches to feed
    #                                a cluster-sized autoscaling pool
    detect_concurrency: int = 4    # actor-pool FLOOR; ceiling = cluster CPUs
    link_concurrency: int = 2      # (see pipelines/kg.py:_pool_max)
    target_partitions: int = 64    # output partition count hint

    # ---- lineage / resume --------------------------------------------------
    manifest_name: str = "_manifest"

    def __post_init__(self) -> None:
        if self.embed_dim <= 0 or self.embed_dim > 10_000:
            raise ValueError("embed_dim must be in (0, 10000]")
        if not (0.0 < self.link_tau <= 1.0 and 0.0 < self.canon_tau <= 1.0):
            raise ValueError("tau thresholds must be in (0, 1]")
        if self.lsh_bands * self.lsh_rows > 256:
            raise ValueError("lsh_bands*lsh_rows (hyperplane count) must be <= 256")


DEFAULT_CONFIG = EngineConfig()
