"""Pipeline configuration.

One frozen dataclass pins every knob that affects results, mirroring the
reference's single-constants-module discipline (``/root/reference/constants.py``):
seed-derived permutations (``lsh.py:213-219``), number of permutations
(``constants.py:1``), selector count (``constants.py:6-10``), shingle window
configs (``lsh.py:46-48`` PLSH, ``lsh.py:77-79`` NLSH).

The config hash is part of every checkpoint manifest so a resumed run with a
different config never silently reuses stale partitions.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    """All knobs for the near-duplicate detection pipeline."""

    # determinism
    seed: int = 42

    # shingling (analog of the reference's PLSH window config, lsh.py:46-48)
    shingle_k: int = 5          # tokens per shingle
    shingle_stride: int = 1     # step between shingle starts
    shingle_hash_bits: int = 32  # stored width of shingle fingerprints.
                                 # 32 halves the bytes through the verify
                                 # shuffle; within-pair collision odds
                                 # (|A||B|/2^32 ~ 2e-4) shift Jaccard far
                                 # below the threshold granularity. The
                                 # brute-force oracle uses the same width.
    min_tokens: int = 1         # docs with fewer tokens are dropped (empty-doc filter)

    # MinHash (reference: permutation sketch, lsh.py:213-255; 128 perms per north star)
    num_perms: int = 128
    selection: str = "min"  # permutation-sketch selector: "min" (classic
                            # MinHash) or "max" — the reference's pluggable
                            # SELECTION_FUNCTIONS (constants.py:6-10); see
                            # lsh_ray.stages.minhash.SELECTION_FUNCTIONS

    # SimHash
    simhash_bits: int = 64

    # LSH banding: bands * rows_per_band == num_perms
    bands: int = 32
    rows_per_band: int = 4

    # content-defined chunk keys (substring-containment candidates)
    enable_chunk_keys: bool = True
    chunk_divisor: int = 8       # power of two; expected chunk length in tokens.
                                 # Small enough that a ~100-token embedded doc
                                 # contains >=2 boundaries w.h.p. (recall),
                                 # at ~tokens/divisor extra shuffle rows (cost).
    chunk_min_tokens: int = 4    # spans shorter than this emit no key
    chunk_min_hits: int = 1      # pairs must share >= this many chunk keys.
    # Keys are BIGRAMS of consecutive content-defined chunks (see
    # stages/chunking.py): one shared bigram already witnesses two shared
    # consecutive chunks — the evidence the old single-chunk scheme needed
    # min_hits=2 to collect — while single shared phrases (boilerplate)
    # no longer emit candidates at all. min_hits=1 reproduces the old
    # scheme's verified output exactly (measured at 200k docs); 2 trades
    # a little tail recall (2 of 92k pairs) for a smaller verify load.

    # candidate generation / skew handling
    group_size_cap: int = 256   # band groups larger than this stop emitting
                                # all O(n^2) pairs (salted split, then chain)
    salt_buckets: int = 8       # hot band groups of size (cap, cap*salt] are
                                # split by salt = h(doc_id) % S: full pairs
                                # within each salt bucket + a chain across
                                # bucket minima — bounded work, connectivity
                                # preserved. Beyond cap*salt: pure chain.
    min_band_hits: int = 1      # pairs must collide in >= this many bands

    # verification
    jaccard_threshold: float = 0.8
    simhash_hamming_max: int = 3       # for the simhash-only dedup path
    containment_threshold: float = 0.9  # substring-containment gate

    # execution
    exchange: str = "auto"
    # ^ shuffle-exchange implementation for the bucketed co-location
    #   passes (see lsh_ray.stages.exchange): "tasks" (raw-task
    #   split/reduce — lowest fixed floor, wins below ~150k docs),
    #   "sort" (Ray Data sort shuffle — streams, wins at larger
    #   volumes), "hash" (Ray hash-shuffle actors, A/B lever), "auto"
    #   (run_dedup resolves by corpus size at the signature fork).
    batch_size: int = 4096
    signature_concurrency: int = 8      # actor-pool size for the signature stage
    join_num_partitions: int = 32
    verify_broadcast_max_pairs: int = 4_000_000
    # ^ verify-plan crossover: at or below this many candidate pairs the
    #   pair table fits the driver and verify uses the block-pair gather
    #   plan (endpoint rows pulled zero-copy from the pinned signature
    #   blocks — no payload shuffle at all; verify_broadcast remains the
    #   one-exchange A/B alternative); above it, the two-exchange
    #   endpoint plan (O(corpus) shuffle volume, O(1) driver memory)
    #   takes over — the 10^12-doc path.
    shuffle_coalesce_blocks: int | None = None
    # ^ pre-shuffle coalesce width for bucketed groupby/join passes.
    #   None derives 2 x cluster CPUs (min 64) at execution time, so
    #   shuffle parallelism grows with the cluster instead of being
    #   capped by a hard-coded constant. Block-count sensitivity: the
    #   sort-shuffle merge cost grows superlinearly with INPUT block
    #   count, so this both caps (vs hundreds of tiny blocks) and
    #   floors (vs starving a big cluster) the width.
    lang_filter: str | None = None

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal num_perms ({self.num_perms})"
            )

    def config_hash(self) -> str:
        """Stable hash of every result-affecting knob (for checkpoint lineage)."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def coalesce_blocks(config: "PipelineConfig | None" = None) -> int:
    """Resolve the pre-shuffle coalesce width (see
    ``PipelineConfig.shuffle_coalesce_blocks``)."""
    if config is not None and config.shuffle_coalesce_blocks:
        return config.shuffle_coalesce_blocks
    cpus = 0
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(64, 2 * cpus)


DEFAULT_CONFIG = PipelineConfig()
