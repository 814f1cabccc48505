"""Pipeline configuration.

One flat dataclass, mirroring the reference's flat options structs
(``libpostal_normalize_options_t``, /root/reference/src/libpostal.h:110-136;
fuzzy-dedupe thresholds ``needs_review_threshold=0.7`` / ``likely_dupe_threshold=0.9``,
/root/reference/src/libpostal.c:185-193).

``config_hash`` keys every checkpoint table so a changed config never silently
reuses stale intermediate state (the resume ledger joins on it).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- shingling (analog of near-dupe quadgrams, src/near_dupe.c:266-281) ---
    k_shingle: int = 5           # token k-grams over the canonical token stream
                                 # (rows shorter than k fall back to a whole-doc shingle)
    # token-hash function: "blake2b" (production) or "sha256" — the
    # oracle-REPLAYABLE mode: DuckDB can compute sha256 natively, so an
    # external SQL twin can rebuild every downstream hash (rolling shingle
    # hashes, MinHash permutations, SimHash, band keys) with HUGEINT
    # mod-2^64 arithmetic. Identical machinery either way; only the 64-bit
    # base hash of each unique token differs.
    hash_mode: str = "blake2b"
    # Latin-ASCII transliteration (NFD + strip combining marks + fold table;
    # analog of the reference's CLDR Latin-ASCII transform,
    # /root/reference/src/transliterate.c:669). Off by default: source-code
    # identifiers are overwhelmingly ASCII and the fold costs a pass over
    # non-ASCII rows only.
    transliterate: bool = False

    # --- MinHash / LSH (replaces near_dupe_hashes' hand-built key families) ---
    num_perm: int = 128          # signature length
    bands: int = 32              # b
    rows_per_band: int = 4       # r; b*r must equal num_perm
    # P(collide at jaccard t) = 1-(1-t^r)^b; at t=0.7, b=32,r=4 → 0.99985

    # --- canonicalization options (analog of libpostal_normalize_options_t) ---
    # abbrev → canonical token rewrites applied after tokenization (the code
    # analog of address-dictionary expansion); empty by default — expanding
    # e.g. ("cfg","config") equates identifiers that differ only by the
    # abbreviation, exactly like "St" ≡ "Street" in the reference
    token_expansions: tuple = ()
    fold_numbers: bool = False   # numeric literals → '0' (digits→D analog)
    # numex: spelled-out English numbers → numeric tokens with real
    # left-to-right composition ("three hundred twenty one" → 321; analog
    # of src/numex.c:1260); Roman numerals are a separate opt-in because
    # strict-syntax sequences can still be words ("mix"), the reference's
    # documented ambiguity class
    fold_spelled_numbers: bool = False
    fold_roman_numerals: bool = False
    # numex rule-table language: "en" (core/numex.py), "fr"/"de"/"es"
    # (core/numex_ml.py), "it"/"pt"/"nl"/"ru" (core/numex_ml2.py), or
    # "zh"/"ja" (core/numex_cjk.py — Han numerals; run with
    # transliterate=False so the pinyin fold doesn't consume the
    # numerals first) — the reference applies the table of the language
    # in effect (src/numex.c:1260, data src/numex_data.c)
    numex_lang: str = "en"

    # --- verify (analog of is_dupe thresholds, src/libpostal.c:185-193) ---
    jaccard_threshold: float = 0.7   # needs_review_threshold in the reference
    likely_threshold: float = 0.9    # likely_dupe_threshold in the reference

    # --- SimHash pass (recall booster for near-exact files) ---
    simhash_bits: int = 64
    simhash_tables: int = 4      # split signature into T chunks; pairs share a chunk
    # pigeonhole guarantee: hamming(simhash_a, simhash_b) <= hamming_max
    # forces at least one shared chunk key, hence candidacy — requires
    # simhash_tables >= hamming_max + 1 (validated in __post_init__)
    simhash_hamming_max: int = 3

    # --- winnowed substring pass (long exact clones; MOSS-style winnowing) ---
    # guarantees a shared fingerprint for any common token run of length
    # >= winnow_window + winnow_select - 1  (96+64-1 = 159 < the 200-token
    # clone_embed floor in FIXTURES.md §2.8)
    winnow_window: int = 96      # tokens per rolling fingerprint window
    winnow_select: int = 64      # winnowing selection window (over window hashes)

    @property
    def winnow_guarantee(self) -> int:
        """The run length at which a shared selected fingerprint is
        GUARANTEED (W + select - 1). This is also the verify accept bar:
        shorter shared runs are only probabilistically winnow-visible, so
        accepting them would make cluster membership depend on which
        fingerprints winnowing happened to select — the bar keeps the
        engine's edge rule deterministic and equal to the oracle's."""
        return self.winnow_window + self.winnow_select - 1

    # --- skew handling (boilerplate adversary, FIXTURES.md §2.9) ---
    max_bucket_size: int = 64        # buckets larger than this pair via salting
    max_salted_bucket: int = 1_000_000  # beyond this, star+rep-clique only (O(n));
                                        # n^1.5 pair volume is the salting contract
    shuffle_partitions: int = 32

    # --- clustering ---
    # confirmed-pair sets at or below this size cluster via driver-side
    # union-find (one collect); larger sets run distributed
    # large-star/small-star. Post-exact-contraction pair counts are tiny
    # relative to input rows, so this threshold is rarely exceeded below
    # ~10^8 input files.
    cc_driver_max_edges: int = 2_000_000

    # --- confirm execution strategy ---
    # True: store each row's sorted-distinct shingle-hash array in the
    # signatures frame so the pairwise confirm computes exact Jaccard
    # JVM-side (array_intersect) with no per-pair Python re-tokenization —
    # at the price of ~8B × n_shingles per signature row of storage,
    # cache, and join-shuffle payload. False (default): the lean
    # ~300B/row signature profile with the fused Arrow confirm that
    # re-derives shingles from canon per candidate pair (per-batch dedup).
    # Results are IDENTICAL either way (excluded from config_hash); the
    # choice is bytes-vs-CPU. Measured on this memory-bandwidth-starved
    # sandbox the LEAN path wins outright (interleaved same-JVM A/B at
    # sf0.1: T4 16.4 s vs 23.6 s, T1 47.1 s vs 58.7 s, scaling eff 0.72
    # vs 0.62) because the extra array bytes cost more than the Python
    # CPU they save; on a CPU-rich, bandwidth-generous cluster the stored
    # JVM form is the better trade — flip it per deployment.
    store_shingles: bool = False

    # --- misc ---
    checkpoint_partitions: int = 32   # per-partition lineage granularity
    seed: int = 42
    checkpoint_dir: str = "/tmp/libpostal_spark_ckpt"
    max_shingles_per_doc: int = 20000  # permutation cap analog (EXCESSIVE_PERMUTATIONS,
                                       # src/expand.c:29) — bounds per-row memory

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) != num_perm ({self.num_perm})"
            )
        if self.simhash_bits % self.simhash_tables != 0:
            raise ValueError("simhash_bits must divide evenly into simhash_tables")
        if self.simhash_tables < self.simhash_hamming_max + 1:
            raise ValueError(
                "pigeonhole guarantee needs simhash_tables >= simhash_hamming_max + 1"
            )

    @property
    def config_hash(self) -> str:
        """16-hex digest over every semantics-affecting field (checkpoint key)."""
        d = asdict(self)
        d.pop("checkpoint_dir")          # location is not semantics
        d.pop("shuffle_partitions")      # parallelism must not change results
        d.pop("cc_driver_max_edges")     # CC routing must not change results
        d.pop("store_shingles")          # confirm strategy, not semantics
        d.pop("checkpoint_partitions")   # lineage layout is not semantics
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
