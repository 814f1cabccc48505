"""Signature + blocking stages: files → signatures → candidate pairs.

Scale design (the part the reference delegates to "a MapReduce setting",
/root/reference/README.md:641-656, made explicit here):

* **Exact pass first.** All rows are grouped by raw-content sha256 and only
  one representative per distinct content enters LSH. This kills the
  boilerplate skew adversary at the root: a license header replicated across
  10^6 repos is ONE node in the candidate graph, connected to its copies by
  star edges from a single groupBy — no O(n²) bucket ever forms. At 10^12
  files this is the difference between a runnable job and a dead one.
* **Key families.** MinHash band keys ∪ SimHash table keys ∪ winnow
  substring fingerprints, unioned into one (kind, kid, khash) key stream —
  the principled version of the reference's redundant overlapping key
  families (4-level fallback hierarchy, /root/reference/src/near_dupe.c:853-1151).
* **Bucket discipline.** Per-key counts are computed before any pairing.
  Buckets ≤ max_bucket_size emit all pairs via a grouped double-explode (no
  second shuffle); larger buckets emit star pairs to the bucket's min fid —
  O(n) pairs, still connecting the component if members are truly similar
  (verified downstream). Oversized-bucket counts are surfaced in metrics so
  silent truncation never reads as full coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.udfs import make_featurize_udf

KIND_BAND = 0
KIND_SIMHASH = 1
KIND_WINNOW = 2
KIND_EXACT = 3


def with_ids(files: DataFrame) -> DataFrame:
    """Add fid (primary key) and the raw-content sha256 invariant.

    sha256(content) is computed BEFORE any normalization and carried through
    every downstream table (per-row invariant, FIXTURES.md §1).
    """
    # per-field coalesce: concat_ws SKIPS nulls, so without it the distinct
    # rows (r, NULL, c) and (NULL, r, c) would concatenate identically and
    # silently merge two files' signatures and labels. NULL and '' still
    # conflate per field (documented), but field positions are preserved;
    # \x00 inside a value cannot occur in filesystem paths/refs. fids for
    # fully-non-null rows are unchanged.
    return files.withColumn(
        "fid",
        F.sha2(
            F.concat_ws(
                "\x00",
                F.coalesce("repo", F.lit("")),
                F.coalesce("path", F.lit("")),
                F.coalesce("commit", F.lit("")),
            ),
            256,
        ),
    ).withColumn("sha256", F.sha2(F.col("content").cast("binary"), 256))


def signatures(
    files: DataFrame,
    cfg: PipelineConfig,
    emit_minhash: bool = False,
    ids_added: bool = False,
) -> DataFrame:
    """files → one row per fid: canon text + fixed-width signature features.

    With cfg.store_shingles (opt-in) the sorted-distinct shingle-hash
    array is materialized per row so the confirm stage runs JVM-side; by
    default verify re-derives shingle sets per candidate pair from `canon`
    (the lean-signature trade — see the functions/udfs.py design note).
    emit_minhash=True adds the raw 128-perm signature column for
    debugging/FIXTURES §4 parity.
    """
    feat_udf = make_featurize_udf(cfg, emit_minhash)
    df = files if ids_added else with_ids(files)
    df = df.withColumn("f", feat_udf(F.col("content")))
    cols = [
        "fid",
        "sha256",
        "repo",
        "path",
        "lang",
        F.col("f.canon").alias("canon"),
        F.col("f.n_tokens").alias("n_tokens"),
        F.col("f.n_shingles").alias("n_shingles"),
        F.col("f.simhash").alias("simhash"),
        F.col("f.bands").alias("bands"),
        F.col("f.simhash_keys").alias("simhash_keys"),
        F.col("f.winnow").alias("winnow"),
    ]
    if cfg.store_shingles:
        cols.append(F.col("f.shingles").alias("shingles"))
    if emit_minhash:
        cols.append(F.col("f.minhash").alias("minhash"))
    return df.select(*cols).withColumn("config_hash", F.lit(cfg.config_hash))


def exact_rep_frame(sigs: DataFrame, ided: DataFrame | None = None) -> DataFrame:
    """sigs + rep_fid (min fid per sha256 class) — the ONE frame the whole
    downstream pipeline fans out from.

    The caller persists+counts THIS frame (featurize UDF + the sha256
    contraction materialize together in one job); rep_sigs, exact_edges,
    and the label universe are all cheap filters over the warm cache, so no
    later stage ever recomputes the UDF chain or re-shuffles on sha256.

    Pass ``ided`` (the with_ids frame the signatures were built from) to
    derive the (sha256 → min fid) rep map from the CHEAP JVM sha2 pass
    instead of windowing over the full signature rows: the agg shuffles
    ~128 B/row instead of the multi-KB signature payload, and AQE turns the
    join back onto sigs into a broadcast when the rep map fits (one pass,
    ZERO full-row exchange) — falling back to a sort-merge join at
    10^12-row scale, which is exactly what the window cost anyway. Without
    ``ided`` the single-input window form is used (correct for any sigs
    frame, at full-payload shuffle cost).
    """
    if ided is None:
        w = Window.partitionBy("sha256")
        return sigs.withColumn("rep_fid", F.min("fid").over(w))
    rep = (
        ided.select(F.col("sha256").alias("rep_sha"), "fid")
        .groupBy("rep_sha")
        .agg(F.min("fid").alias("rep_fid"))
    )
    # null-safe equality: a (theoretical) null-content row must stay in the
    # frame exactly as the window form keeps it, not drop out of the join
    return sigs.join(
        rep, F.col("sha256").eqNullSafe(F.col("rep_sha"))
    ).drop("rep_sha")


def exact_groups(
    sigs: DataFrame, ided: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """Group identical raw content.

    Returns (rep_sigs, exact_edges):
      rep_sigs    — one signature row per distinct sha256 (the LSH universe)
      exact_edges — (fid1=rep, fid2=member) star edges for the copies
    One window shuffle on sha256; no pairing explosion regardless of skew.
    Pass a persisted ``exact_rep_frame`` output to share that shuffle across
    every consumer, or ``ided`` (any cheap frame carrying the same
    (sha256, fid) rows — a PERSISTED sigs frame qualifies) to derive the
    rep map from a 2-column pass instead of windowing the full signature
    payload (see exact_rep_frame).
    """
    with_rep = (
        sigs if "rep_fid" in sigs.columns else exact_rep_frame(sigs, ided)
    )
    rep_sigs = with_rep.filter(F.col("fid") == F.col("rep_fid")).drop("rep_fid")
    exact_edges = (
        with_rep.filter(F.col("fid") != F.col("rep_fid"))
        .select(
            F.col("rep_fid").alias("fid1"),
            F.col("fid").alias("fid2"),
            F.lit(1.0).alias("jaccard"),
            F.lit(KIND_EXACT).alias("source"),
        )
    )
    return rep_sigs, exact_edges


def blocking_keys(rep_sigs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Explode every key family into one (fid, kind, kid, khash) stream.

    The posexplode over band structs is the Spark-native form of the
    reference's flat key emission (``near_dupe_hashes`` returning a
    cstring_array of prefixed keys, /root/reference/src/near_dupe.c:627-640).
    """
    bands = rep_sigs.select(
        "fid", F.posexplode("bands").alias("kid", "khash")
    ).withColumn("kind", F.lit(KIND_BAND))
    sim = rep_sigs.select(
        "fid", F.posexplode("simhash_keys").alias("kid", "khash")
    ).withColumn("kind", F.lit(KIND_SIMHASH))
    win = rep_sigs.select(
        "fid", F.explode("winnow").alias("khash")
    ).withColumn("kid", F.lit(0)).withColumn("kind", F.lit(KIND_WINNOW))
    return bands.unionByName(sim.select(*bands.columns)).unionByName(
        win.select(*bands.columns)
    )


def candidate_pairs(
    keys: DataFrame, cfg: PipelineConfig, persist: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Key stream → distinct candidate pairs (fid1 < fid2, sources agg'd).

    Partition-aligned design: the explicit repartition by bucket key (the
    north rule's "repartition by band bucket") is the one shuffle; the
    unordered window over the same key reuses its hash partitioning to
    compute per-bucket count and min-fid representative, and the
    small-bucket self-join below rides the same partitioning (no join
    exchange). Per-row memory is flat — no collect_set arrays anywhere, so
    a pathological mega-bucket cannot blow an executor:

      * bucket ≤ max_bucket_size → all pairs via the co-partitioned
        self-join (fid1 < fid2 keeps each unordered pair once)
      * bucket  > max_bucket_size → SALTED pairing (the north rule's skew
        handling): members hash into G = ⌈√n⌉ salt groups; all pairs within
        each ~√n-sized group (O(n^1.5) total), plus an all-pairs clique over
        the per-group dual representatives (min-fid and max-fid of each
        group: ≤2G nodes → O(n) pairs), plus star edges to the bucket's
        global min fid. Unlike star-only pairing, two similar members no
        longer depend on BOTH verifying against one arbitrary rep: same
        salt group → direct pair; different groups → linked through the rep
        clique, which survives one adversarial (dissimilar) rep per group
        because the second rep still carries the edge. Buckets beyond
        max_salted_bucket fall back to star+rep-clique only (O(n)), counted
        in bucket_stats — never silently.

    Returns (pairs, bucket_stats). bucket_stats (lazily derived from the
    same window output) is the no-silent-caps ledger: kind, n_buckets,
    n_oversized, max_size.
    """
    # no explicit partition count: a RepartitionByExpression without a fixed
    # N lets AQE size the exchange from observed shuffle bytes — 381 keys
    # coalesce to one partition instead of defaultParallelism near-empty
    # tasks, and a 10^12-row stream gets byte-proportional partitions
    # instead of a hardcoded number
    keys = keys.repartition("kind", "kid", "khash")
    w = Window.partitionBy("kind", "kid", "khash")
    # cnt only here: the bucket-min representative (a 64-char sha string
    # min over every key row) is needed ONLY by the oversized-bucket star
    # branch, so it is computed there, over big-bucket rows alone — the
    # hot window on the full key stream does one count aggregate instead
    # of count + string-min (same filter, same downstream results: a
    # bucket's rows all carry the same cnt, so the post-filter min over
    # the big subset equals the pre-filter min over the bucket)
    keyed = keys.withColumn("cnt", F.count("*").over(w)).filter(
        F.col("cnt") > 1
    )
    cached = None
    has_big = True
    if cfg.max_bucket_size >= (1 << 30):
        # effectively-unbounded small-bucket cap (the oracle-twin pairing
        # config): no realistic bucket can exceed it, so the salted/star
        # branches are unreachable and the simple all-pairs plan can be
        # built WITHOUT the gating agg ACTION. (A >2^30-member bucket
        # would already diverge from the plain all-pairs SQL twin this
        # config exists to match, so the gate adds nothing there either.)
        # The persist stays: only the exchange is reused between the
        # self-join's two sides — the bucket-count window above it is
        # computed per side, and the cache keeps that to one computation
        # (A/B: dropping the persist cost ~0.2 s on the harness query).
        has_big = False
        if persist:
            keyed = keyed.persist()
            cached = keyed
        persist = False
    if persist:
        # keyed fans out to 5+ consumer branches (small l/r, star, salt l/r,
        # reps, stats); without a materialized cache each branch replays the
        # full-stream shuffle + window (observed: 7 identical exchanges in
        # the physical plan). One persist+agg = one shuffle, and the cache
        # retains the hash partitioning so the small-bucket self-join still
        # needs no exchange of its own. The SAME materializing action also
        # returns the max bucket size: when no bucket exceeds
        # max_bucket_size (the common case outside adversarial skew), the
        # salt/star/rep-clique branches are pruned from the plan entirely —
        # Catalyst plans one self-join instead of a 4-way union, which is a
        # measurable driver-time win on every run (AQE-style runtime
        # adaptation, decided from data already in hand).
        keyed = keyed.persist()
        row = keyed.agg(
            F.count("*").alias("n"), F.max("cnt").alias("mx")
        ).collect()[0]
        has_big = (row["mx"] or 0) > cfg.max_bucket_size
        cached = keyed

    # small buckets: co-partitioned self-join on the bucket key — both sides
    # share the repartition exchange (ReusedExchange) and are already hash-
    # distributed on the join key, so no further shuffle; per-row memory is
    # flat (no collect_set arrays)
    small = keyed.filter(F.col("cnt") <= cfg.max_bucket_size).select(
        "kind", "kid", "khash", "fid"
    )
    lhs = small.alias("l")
    rhs = small.alias("r")
    small_pairs = (
        lhs.join(rhs, ["kind", "kid", "khash"])
        .filter(F.col("l.fid") < F.col("r.fid"))
        .select("kind", F.col("l.fid").alias("fid1"), F.col("r.fid").alias("fid2"))
    )

    if not has_big:
        pairs = small_pairs.groupBy("fid1", "fid2").agg(
            F.min("kind").alias("source"),
            F.collect_set("kind").alias("sources"),
        )
        bucket_stats = (
            keyed.groupBy("kind", "kid", "khash")
            .agg(F.first("cnt").alias("cnt"))
            .groupBy("kind")
            .agg(
                F.count("*").alias("n_buckets"),
                F.sum((F.col("cnt") > cfg.max_bucket_size).cast("long")).alias(
                    "n_oversized"
                ),
                F.max("cnt").alias("max_size"),
            )
        )
        return pairs, bucket_stats, cached

    big = keyed.filter(F.col("cnt") > cfg.max_bucket_size).withColumn(
        "rep", F.min("fid").over(w)
    )
    star_pairs = big.filter(F.col("fid") != F.col("rep")).select(
        "kind",
        F.least("rep", "fid").alias("fid1"),
        F.greatest("rep", "fid").alias("fid2"),
    )

    # salt into G=⌈√n⌉ groups; all pairs inside each group (O(n^1.5) total)
    salted = (
        big.filter(F.col("cnt") <= cfg.max_salted_bucket)
        .withColumn(
            "g", F.pmod(F.xxhash64("fid"), F.ceil(F.sqrt("cnt")).cast("long"))
        )
        .select("kind", "kid", "khash", "g", "fid")
    )
    sl = salted.alias("sl")
    sr = salted.alias("sr")
    salt_pairs = (
        sl.join(sr, ["kind", "kid", "khash", "g"])
        .filter(F.col("sl.fid") < F.col("sr.fid"))
        .select("kind", F.col("sl.fid").alias("fid1"), F.col("sr.fid").alias("fid2"))
    )

    # dual reps per salt group (min+max fid), all-pairs clique across groups
    reps = (
        big.withColumn(
            "g", F.pmod(F.xxhash64("fid"), F.ceil(F.sqrt("cnt")).cast("long"))
        )
        .groupBy("kind", "kid", "khash", "g")
        .agg(F.min("fid").alias("lo"), F.max("fid").alias("hi"))
        .select(
            "kind", "kid", "khash",
            F.explode(F.array_distinct(F.array("lo", "hi"))).alias("fid"),
        )
    )
    rl = reps.alias("rl")
    rr = reps.alias("rr")
    rep_pairs = (
        rl.join(rr, ["kind", "kid", "khash"])
        .filter(F.col("rl.fid") < F.col("rr.fid"))
        .select("kind", F.col("rl.fid").alias("fid1"), F.col("rr.fid").alias("fid2"))
    )

    pairs = (
        small_pairs.unionByName(star_pairs)
        .unionByName(salt_pairs)
        .unionByName(rep_pairs)
        .groupBy("fid1", "fid2")
        .agg(F.min("kind").alias("source"), F.collect_set("kind").alias("sources"))
    )

    bucket_stats = (
        keyed.groupBy("kind", "kid", "khash")
        .agg(F.first("cnt").alias("cnt"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum((F.col("cnt") > cfg.max_bucket_size).cast("long")).alias("n_oversized"),
            F.max("cnt").alias("max_size"),
        )
    )
    return pairs, bucket_stats, cached
