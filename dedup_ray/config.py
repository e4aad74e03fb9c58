"""Pipeline configuration.

Every knob of the reference CLI (``/root/reference/dedup/dedup.py:513-646``)
has a counterpart here, re-expressed for web text (lengths are characters of
extracted text instead of base pairs).  Genome-scaled magnitudes (25000 bp
buffers, 5000 bp minimum contig) stay as the defaults; tests and web corpora
override them via :func:`scaled` — semantics are identical, magnitudes are
configuration.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class DedupConfig:
    # --- tokenisation (reference: --kmer_size, dedup.py:540-544) ---
    shingle_k: int = 17               # character k-gram length
    # "char": k-character shingles (the reference's k-mer analogue, default).
    # "word": word n-grams on single-space tokens — identical to DuckDB
    #   string_split semantics, making the flagship DF-band + containment
    #   math SQL-oracle-checkable end to end.
    tokenizer: str = "char"
    word_ngram: int = 3               # n for tokenizer="word"

    # --- candidate generation ---
    # "dup_index": exact inverted-index self-join over dup-band shingles
    #   (bounded buckets thanks to the df<=dup_upper cap; recall 1.0).
    # "minhash_lsh": probabilistic MinHash banding (the general operator;
    #   needed when the dup band is disabled / unbounded).
    candidate_strategy: str = "dup_index"

    # --- MinHash / LSH (reference: dedup.py:310-316, 330-351) ---
    num_perm: int = 128               # datasketch MinHash default (dedup.py:313)
    containment_threshold: float = 0.2    # --containment_threshold (dedup.py:589-593)
    lsh_threshold_divisor: float = 20.0   # LSH threshold = containment/20 (dedup.py:333)
    lsh_bands: int | None = None      # override optimal (b, r); b * r <= num_perm
    lsh_rows: int | None = None
    bucket_cap: int = 512             # LSH bucket size cap before salted pairing (skew guard)
    # --- containment calibration for the minhash_lsh strategy (ensemble-style
    #     size partitioning, Zhu et al. VLDB'16 — the reference's
    #     MinHashLSHEnsemble at dedup.py:330-351 partitions by set size for the
    #     same reason).  Docs are partitioned by floor(log_base(n_dup_distinct));
    #     each doc emits its band rows under its own partition tag AND the next
    #     tag up, so any pair within size ratio < base^2 collides inside a
    #     shared tag, where jaccard >= t/(1+base^2) keeps the S-curve miss
    #     probability small.  Pairs with partition gap >= 2 — where jaccard can
    #     be arbitrarily depressed and NO banding at num_perm perms can reach
    #     0.99 recall — are closed exactly by the dup-shingle inverted-index
    #     complement (prefix-filter principle: containment > t means the small
    #     side shares >= t of its dup shingles, so at least one co-occurrence
    #     in the bounded-df inverted index exists). ---
    lsh_ensemble: bool = True
    lsh_partition_base: float = 2.0

    # --- DF band classification (reference: --duplicate_kmer_{lower,upper}_count,
    #     dedup.py:601-611; applied kmer_utilities.py:123-149) ---
    duplicate_df_lower: int = 2       # shingle doc-frequency band => "duplicated"
    duplicate_df_upper: int = 4
    # df == 1 => "unique" (reference band [1,1], kmer_utilities.py:37-38)

    # --- pair decision (reference: dedup.py:258-307; note the reference worker
    #     hardcodes 0.9 / 25000 at dedup.py:263-264 regardless of CLI — we honor
    #     the config, whose defaults equal those hardcoded values) ---
    full_duplication_threshold: float = 0.9   # --full_duplication_threshold (dedup.py:583-587)
    end_buffer: int = 25000                   # --end_buffer (dedup.py:595-599)

    # --- span chaining verifier (reference: Alignment, alignment.py:19-64) ---
    alignment_max_gap: int = 25000            # --alignment_max_gap (dedup.py:613-617)
    alignment_match_weight: float = 0.2       # --alignment_match_weight (dedup.py:619-623)
    alignment_min_coverage: float = 0.2       # --alignment_min_coverage (dedup.py:625-629)

    # --- matching-span discovery (V3; reference used minimap2, dedup.py:437) ---
    min_span_len: int = 0             # report chained seed spans of at least this length
    # cap spans fed to the O(n^2) chaining DAG per pair (longest-first,
    # deterministic) — the analogue of minimap2's chain/alignment caps;
    # fragmented pairs otherwise cost quadratically in span count.
    max_spans_per_pair: int = 256

    # --- output filtering (reference: Contig.min_sequence_len, contig.py:51) ---
    min_doc_len: int = 5000           # drop trimmed docs not strictly longer than this

    # --- spectrum fit (reference: kmer_spectrum.py; --min/max_kmer_depth,
    #     dedup.py:631-641).  Optional path; the config DF band is the default. ---
    min_df_depth: int = 10
    max_df_depth: int = 200
    use_spectrum_fit: bool = False

    # --- execution knobs (ours; Ray Data physical tuning) ---
    # classify via broadcast searchsorted when the df>=2 table has at most
    # this many rows (~16 bytes/row in the object store); join above it.
    broadcast_classify_limit: int = 50_000_000
    # scalar-V1 path: broadcast the outside-dup-band shingle set (df>upper or
    # df<lower) for exact common-dup reconstruction at align time, but only
    # when it has at most this many rows; above it, fall back to the blob
    # verification path (per-pair common_high, bounded per pair).
    broadcast_high_limit: int = 50_000_000
    # byte-based gates: a row-count gate misses fat rows (text, shingle-set
    # blobs).  Driver-side lookup collection falls back to a hash join above
    # broadcast_bytes_limit; the align stage's pair-text broadcast falls back
    # to the two text joins above broadcast_text_bytes.
    broadcast_bytes_limit: int = 256 << 20
    broadcast_text_bytes: int = 2 << 30
    shingle_batch_size: int = 256     # docs per shingling batch
    minhash_batch_size: int = 4096    # matched rows per signature batch
    verify_batch_size: int = 2048     # candidate pairs per V1 batch (cheap/pair)
    pair_batch_size: int = 256        # verified pairs per align/decide batch
    # (pairs arrive sorted by uid_a, so larger batches raise the per-batch
    # doc-shingle cache hit rate in align_decide_batch)
    num_partitions: int = 64          # hash-join / shuffle partition count
    # Exchange physical sizing (round-4 microbenches, BENCH/BASELINE.md):
    # per-task working set is THE throughput lever on bandwidth-limited
    # hosts — the map task runs ~6x more rows/s at 12 MB text blocks than at
    # 44 MB, and the partition reduce runs 5-13x more rows/s at 5-11M rows
    # per partition than at 44M.  Blocks are re-chunked to
    # ``exchange_block_bytes`` before the exchange; the partition count
    # scales as ceil(est_rows / exchange_part_rows) up to
    # ``exchange_max_partitions`` (floored by num_partitions/CPU width).
    # On a multi-node cluster the same knobs bound per-task memory
    # independently of corpus size.
    exchange_block_bytes: int = 12 << 20
    exchange_part_rows: int = 7_000_000
    exchange_max_partitions: int = 768
    bench_seed: int = 42
    # --- user-extension surface (SURVEY §2.10) ---
    # {hook_point: (stage_name, ...)} — stage names registered via
    # stages.registry.register_stage; hook points: "docs" (after extraction,
    # before exact dedup) and "output" (after assembly, before return).
    # Tuple-of-tuples so the frozen dataclass stays hashable.
    user_stages: tuple = ()

    def shingles(self, text: str):
        """Tokenizer-dispatched shingle hash array for one document — the ONE
        hashing entry point every stage (shingling, align, output trim) uses,
        so a config is internally consistent."""
        from .hashing import shingle_hashes, word_ngram_hashes

        if self.tokenizer == "word":
            return word_ngram_hashes(text, self.word_ngram)
        return shingle_hashes(text, self.shingle_k)

    def lsh_threshold(self) -> float:
        return self.containment_threshold / self.lsh_threshold_divisor

    def join_partitions(self) -> int:
        """Hash-join partition count: each join spawns one shuffle-aggregator
        actor per partition (measured ~80 ms overhead each) and the exchange
        ships O(blocks x partitions) objects, so locally we clamp to a
        quarter of the CPUs — on the 843 MiB bench corpus the output-tail
        join ran 2.8 s at 8 partitions vs 9.6 s at 32 (join compute is tiny;
        the cost is all actor spawn + exchange).  ``num_partitions`` remains
        the ceiling for real clusters where partitions must bound
        per-aggregator memory."""
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        return max(4, min(self.num_partitions, max(cpus // 4, 4)))

    def exchange_task_cpus(self) -> int:
        """CPUs charged per exchange task (shingling, hash-split, partition
        reduce).  These are memory-bandwidth-bound; running one per logical
        CPU oversubscribes hyperthreads and LOWERS absolute throughput
        (measured on a 32-logical-CPU host: 16 concurrent tasks stream 5
        blocks/s, 32 concurrent only 3 blocks/s).  Charging 2 CPUs on wide
        hosts sizes the wave to physical cores; narrow hosts are unaffected."""
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        return 2 if cpus >= 24 else 1

    def replace(self, **kw) -> "DedupConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = DedupConfig()

# Character-scale config for synthetic web-text tests: same semantics, magnitudes
# scaled from genome (10^5..10^8 bp contigs) to test documents (200..5000 chars).
TEST_CONFIG = DedupConfig(
    end_buffer=50,
    alignment_max_gap=50,
    min_doc_len=60,
    min_span_len=0,
    num_partitions=8,
    shingle_batch_size=128,
)
