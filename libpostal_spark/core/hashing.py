"""Batch-vectorized hashing core: shingles, MinHash, SimHash, LSH bands, winnowing.

This replaces the reference's hand-built near-dupe key machinery
(``near_dupe_hashes_languages``, /root/reference/src/near_dupe.c:643-1216;
quadgram shingles ``add_quadgrams_or_string_to_array_if_unique``,
/root/reference/src/near_dupe.c:266-281; char n-grams /root/reference/src/ngrams.c:4-71)
with principled MinHash-LSH + SimHash + winnowed substring fingerprints.

Everything operates on a whole Arrow batch at once — token streams for all
rows are concatenated into one flat uint64 array and every derived quantity
(k-gram shingle hashes, window hashes, signatures) is computed with global
numpy ops plus per-row ``reduceat``/mask logic. No per-row Python in the hot
path except the unavoidable hash of the *unique* token vocabulary (deduped via
``pd.factorize``, so cost scales with vocabulary, not corpus).

Rolling hashes use an invertible-multiplier trick: with P odd, Q = P^-1 mod
2^64 exists, so window hash h(i,L) = (S[i+L] - S[i]) * P^i where
S[i] = Σ_{j<i} t[j]·Q^j (all mod 2^64). One prefix pass serves every window
length. A splitmix64 finalizer fixes the weak low-bit diffusion of mod-2^64
polynomial hashes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

U64 = np.uint64
_P = U64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier
# modular inverse of _P mod 2^64 (Newton iteration; verified in tests)
_Q = U64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))

def _wraps_uint64(fn):
    """Scope numpy's overflow handling to THIS kernel: uint64 wraparound is
    the point of every hash below, but a module-level np.seterr would
    silence genuine overflow warnings process-wide for anyone importing the
    package."""
    import functools

    @functools.wraps(fn)
    def inner(*a, **k):
        with np.errstate(over="ignore"):
            return fn(*a, **k)

    return inner


@_wraps_uint64
def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    x = x.astype(U64, copy=True)
    x += U64(0x9E3779B97F4A7C15)
    x ^= x >> U64(30)
    x *= U64(0xBF58476D1CE4E5B9)
    x ^= x >> U64(27)
    x *= U64(0x94D049BB133111EB)
    x ^= x >> U64(31)
    return x


@_wraps_uint64
def hash_tokens_unique(
    uniques: np.ndarray, seed: int, mode: str = "blake2b"
) -> np.ndarray:
    """Stable 64-bit hash per unique token string.

    blake2b (default): seeded via salt, digest tail is uniform — production.
    sha256: first 8 digest bytes big-endian of ``"{seed}:{token}"`` — the
    oracle-replayable mode; DuckDB computes the identical value as
    ``('0x' || substr(sha256(concat('{seed}:', tok)), 1, 16))::UBIGINT``.
    """
    out = np.empty(len(uniques), dtype=U64)
    if mode == "sha256":
        prefix = f"{seed}:".encode()
        for i, tok in enumerate(uniques):
            h = hashlib.sha256(prefix + tok.encode("utf-8", "surrogatepass"))
            out[i] = int.from_bytes(h.digest()[:8], "big")
        return out
    salt = seed.to_bytes(8, "little", signed=False)
    for i, tok in enumerate(uniques):
        h = hashlib.blake2b(tok.encode("utf-8", "surrogatepass"), digest_size=8, salt=salt)
        out[i] = int.from_bytes(h.digest(), "little")
    return out


@_wraps_uint64
def _prefix_sums(flat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """S[i] = Σ_{j<i} flat[j]·Q^j and Ppow[i] = P^i, both mod 2^64."""
    m = len(flat)
    qpow = np.empty(m, dtype=U64)
    ppow = np.empty(m, dtype=U64)
    if m:
        qpow[0] = U64(1)
        ppow[0] = U64(1)
        if m > 1:
            np.cumprod(np.full(m - 1, _Q, dtype=U64), out=qpow[1:])
            np.cumprod(np.full(m - 1, _P, dtype=U64), out=ppow[1:])
    s = np.zeros(m + 1, dtype=U64)
    if m:
        np.cumsum(flat * qpow, out=s[1:])
    return s, ppow


@_wraps_uint64
def window_hashes(
    flat: np.ndarray, lengths: np.ndarray, width: int, prefix=None
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling hash of every width-`width` window that fits inside one row.

    flat: concatenated token hashes for the batch; lengths: tokens per row.
    Returns (hashes, row_id) — one entry per valid window, finalized with
    splitmix64. Rows shorter than `width` contribute nothing. Pass
    ``prefix`` (a ``_prefix_sums(flat)`` result) to share the prefix pass
    across window widths — the prefix arrays are width-independent, and the
    featurize hot path needs three consumers (shingles, winnow, short-row
    fallback) over the same flat batch.
    """
    m = len(flat)
    if m == 0 or width <= 0:
        return np.empty(0, dtype=U64), np.empty(0, dtype=np.int64)
    s, ppow = prefix if prefix is not None else _prefix_sums(flat)
    n_valid = m - width + 1
    if n_valid <= 0:
        return np.empty(0, dtype=U64), np.empty(0, dtype=np.int64)
    h = (s[width : width + n_valid] - s[:n_valid]) * ppow[:n_valid]
    # a window starting at i is valid iff it stays inside i's row
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    row_of = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    row_end = starts[row_of] + lengths[row_of]          # end offset of each pos's row
    pos = np.arange(m, dtype=np.int64)
    valid = (pos + width <= row_end)[:n_valid]
    return splitmix64(h[valid]), row_of[:n_valid][valid]


@_wraps_uint64
def shingle_sets(
    flat: np.ndarray, lengths: np.ndarray, k: int, max_per_doc: int = 0,
    prefix=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct k-gram shingle hashes per row.

    Returns (values:int64-view, offsets) where offsets[i]:offsets[i+1] slices
    row i's sorted-distinct shingles. Rows with fewer than k tokens get a
    single whole-row shingle (so tiny files still compare; analog of the
    whole-string hash at /root/reference/src/near_dupe.c:408-411).
    """
    n_rows = len(lengths)
    if prefix is None and len(flat):
        prefix = _prefix_sums(flat)
    h, row_id = window_hashes(flat, lengths, k, prefix=prefix)
    main_counts = np.bincount(row_id, minlength=n_rows)
    # whole-row fallback hash for short rows (reuses the same prefix pass)
    short = lengths < k
    if short.any():
        s, ppow = prefix if prefix is not None else _prefix_sums(flat)
        starts = np.concatenate(([0], np.cumsum(lengths)))
        idx = np.nonzero(short)[0]
        if len(flat):
            # zero-length rows may start at offset m (end of batch): clip the
            # ppow index and force their hash to 0 explicitly
            safe = np.minimum(starts[idx], len(flat) - 1)
            whole = (s[starts[idx + 1]] - s[starts[idx]]) * ppow[safe]
            whole[lengths[idx] == 0] = U64(0)
        else:
            whole = np.zeros(len(idx), dtype=U64)
        whole = splitmix64(np.asarray(whole, dtype=U64))
        h = np.concatenate([h, whole])
        row_id = np.concatenate([row_id, idx])

    # per-row sorted-distinct reduction. Two strategies, identical output:
    #
    # * RECTANGLE (typical batches): scatter each row's hashes into one
    #   sentinel-padded (n_rows x max_count) matrix and np.sort(axis=1) —
    #   many small C introsorts instead of one global two-key lexsort over
    #   the whole batch (measured ~4x on the e2e batch shape: 0.43 s ->
    #   0.10 s at 1.9M shingles x 5.5k rows). Row starts are known, so the
    #   scatter needs no grouping pass; padding (== sentinel) is dropped by
    #   the per-row count bound, which also keeps a genuine 2^64-1 hash.
    # * LEXSORT (skewed batches): when one giant row would blow the
    #   rectangle up past ~4x the real payload, the dense global sort is
    #   the memory-safe form.
    W = int(main_counts.max(initial=0))
    if short.any():
        W = max(W, 1)
    rect_cells = n_rows * W
    if rect_cells and rect_cells <= 4 * max(len(h), 1):
        counts_in = main_counts.copy()
        if short.any():
            counts_in[short] = 1
        # rank of each h entry within its row: window_hashes emits rows
        # grouped and in order; appended short-row hashes are their row's
        # only entry (rank 0)
        n_main = int(main_counts.sum())
        rank = np.empty(len(h), dtype=np.int64)
        rank[:n_main] = np.arange(n_main) - np.repeat(
            np.concatenate(([0], np.cumsum(main_counts)))[:-1], main_counts
        )
        rank[n_main:] = 0
        sent = np.iinfo(np.uint64).max
        rect = np.full(rect_cells, sent, dtype=U64)
        rect[row_id * W + rank] = h
        rect = rect.reshape(n_rows, W)
        rect.sort(axis=1)
        flat_s = rect.ravel()
        keep = np.ones(rect_cells, dtype=bool)
        if rect_cells > 1:
            keep[1:] = flat_s[1:] != flat_s[:-1]
        col = np.tile(np.arange(W, dtype=np.int64), n_rows)
        keep[col == 0] = True
        keep &= col < np.repeat(counts_in, W)
        h = flat_s[keep]
        row_id = np.repeat(np.arange(n_rows, dtype=np.int64), W)[keep]
    else:
        order = np.lexsort((h, row_id))
        h, row_id = h[order], row_id[order]
        keep = np.ones(len(h), dtype=bool)
        if len(h) > 1:
            keep[1:] = (h[1:] != h[:-1]) | (row_id[1:] != row_id[:-1])
        h, row_id = h[keep], row_id[keep]
    counts = np.bincount(row_id, minlength=n_rows)
    if max_per_doc and counts.max(initial=0) > max_per_doc:
        rank = np.arange(len(h)) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)))[:-1], counts
        )
        keep2 = rank < max_per_doc
        h, row_id = h[keep2], row_id[keep2]
        counts = np.bincount(row_id, minlength=n_rows)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return h.view(np.int64), offsets


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) * U64(2) + U64(1)  # odd
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


@_wraps_uint64
def minhash_signatures(
    values: np.ndarray, offsets: np.ndarray, num_perm: int, seed: int,
    limit_perm: int | None = None,
) -> np.ndarray:
    """(n_rows × num_perm) uint64 MinHash matrix over per-row shingle sets.

    Multiply-shift permutations: h_i(s) = (a_i·s + b_i) mod 2^64 with odd a_i.
    One vector op + one ``np.minimum.reduceat`` per permutation — no per-row
    loop. Empty rows (offsets equal) get sentinel 2^64-1.

    ``limit_perm`` evaluates only the FIRST k permutations while drawing
    the parameter vectors at full ``num_perm`` width — (a, b) come from one
    sequential RNG stream, so a shorter parameter draw would shift b and
    silently change every hash. The output equals the full matrix's first
    k columns bit-for-bit (pinned in tests), which is what lets a
    bands-subset consumer (streaming bands_limit) skip 7/8 of the reduceat
    passes without forking the key universe.
    """
    a, b = _perm_params(num_perm, seed)
    k = num_perm if limit_perm is None else min(limit_perm, num_perm)
    s = values.view(U64)
    n_rows = len(offsets) - 1
    sig = np.full((n_rows, k), np.iinfo(np.uint64).max, dtype=U64)
    if len(s) == 0:
        return sig
    nonempty = offsets[:-1] < offsets[1:]
    ne_idx = np.nonzero(nonempty)[0]
    starts_all = offsets[:-1][nonempty]
    # cache-block over shingle ranges: each ~64k-element slice of s stays
    # L2-resident across all k permutation passes, so the m hashes are read
    # from DRAM once instead of k times (pure traversal-order change —
    # every (permutation, row) minimum is identical)
    block = 1 << 16
    pos = 0
    while pos < len(ne_idx):
        end = pos
        lo = int(starts_all[pos])
        while end < len(ne_idx) and int(offsets[ne_idx[end] + 1]) - lo <= block:
            end += 1
        end = max(end, pos + 1)               # one huge row still forms a block
        hi = int(offsets[ne_idx[end - 1] + 1])
        chunk = s[lo:hi]
        starts = starts_all[pos:end] - lo
        rows = ne_idx[pos:end]
        for i in range(k):
            h = a[i] * chunk + b[i]
            sig[rows, i] = np.minimum.reduceat(h, starts)
        pos = end
    return sig


# bit_table[v, j] = bit j of byte value v — the 256×8 histogram-to-bitcount
# projector simhash_values multiplies each per-(row, byte-value) histogram by
_BIT_TABLE = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1, bitorder="little"
).astype(np.int64)


@_wraps_uint64
def simhash_values(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per row over its shingle hashes (±1 bit votes, tie→0).

    Per-row bit counts come from per-byte-position histograms: for each of
    the 8 byte lanes, bincount the (row, byte value) pairs, then project the
    256-wide histogram onto bit counts with one (rows×256)@(256×8) matmul.
    This reads the m hashes 8× as uint8 and writes only rows×256 histogram
    cells — the previous formulation (unpackbits to a 64×m int32 matrix +
    full cumsum) moved ~40× more memory and was the single hottest kernel of
    the featurize pass on this bandwidth-starved substrate (measured 2.8 s
    of a 4.75 s featurize at 4.4k rows × ~300 shingles; this form ~0.3 s,
    identical outputs). Rows are chunked so the histogram stays ~64 MB even
    for batches of millions of tiny rows.
    """
    s = values.view(U64)
    n_rows = len(offsets) - 1
    out = np.zeros(n_rows, dtype=U64)
    if len(s) == 0:
        return out.view(np.int64)
    shifts = np.arange(64, dtype=U64)
    counts_all = (offsets[1:] - offsets[:-1]).astype(np.int64)
    byte_view = s.view(np.uint8).reshape(-1, 8)   # little-endian: lane k = bits 8k..8k+7
    chunk_rows = 1 << 15                          # 32k rows → ≤64 MB histogram
    r0 = 0
    while r0 < n_rows:
        r1 = min(r0 + chunk_rows, n_rows)
        lo, hi = int(offsets[r0]), int(offsets[r1])
        if hi > lo:
            cnt = counts_all[r0:r1]
            row_base = np.repeat(
                np.arange(r1 - r0, dtype=np.int64) << 8, cnt
            )
            seg = np.empty((r1 - r0, 64), dtype=np.int64)
            for k in range(8):
                hist = np.bincount(
                    row_base + byte_view[lo:hi, k],
                    minlength=(r1 - r0) << 8,
                ).reshape(r1 - r0, 256)
                seg[:, 8 * k : 8 * k + 8] = hist @ _BIT_TABLE
            majority = (2 * seg) > cnt[:, None]               # n×64
            vals = (majority.astype(U64) << shifts[None, :]).sum(
                axis=1, dtype=U64
            )
            nonempty = cnt > 0
            out[r0:r1][nonempty] = vals[nonempty]
        r0 = r1
    return out.view(np.int64)


@_wraps_uint64
def band_hashes(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n_rows × bands) int64: one hash per LSH band of the signature.

    The banding is the reference's geohash-neighbors trick made principled —
    multiple redundant overlapping keys per record so near-misses still
    collide (/root/reference/src/near_dupe.c:220-248 emits 9 spatial keys for
    the same reason).
    """
    n_rows = sig.shape[0]
    g = sig.reshape(n_rows, bands, rows_per_band).astype(U64)
    h = np.zeros((n_rows, bands), dtype=U64)
    for j in range(rows_per_band):
        h = h * _P + g[:, :, j]
    # mix band index in so identical band contents in different bands differ
    h += (np.arange(bands, dtype=U64) * U64(0xD6E8FEB86659FD93))[None, :]
    return splitmix64(h.ravel()).reshape(n_rows, bands).view(np.int64)


@_wraps_uint64
def simhash_table_keys(simhash: np.ndarray, tables: int, bits: int = 64) -> np.ndarray:
    """(n_rows × tables) int64 keys: simhash split into `tables` bit-chunks.

    Two docs within Hamming distance < `tables` share at least one chunk
    (pigeonhole) — the standard multi-table SimHash blocking scheme.
    Chunk value is mixed with its table index.
    """
    s = simhash.view(U64)
    chunk = bits // tables
    mask = U64((1 << chunk) - 1)
    out = np.empty((len(s), tables), dtype=U64)
    for t in range(tables):
        v = (s >> U64(t * chunk)) & mask
        out[:, t] = v + U64(t + 1) * U64(0xA24BAED4963EE407)
    return splitmix64(out.ravel()).reshape(len(s), tables).view(np.int64)


@_wraps_uint64
def winnow_fingerprints(
    flat: np.ndarray, lengths: np.ndarray, window: int, select: int,
    prefix=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed substring fingerprints (MOSS scheme, Schleimer et al. 2003).

    Returns (values:int64, offsets) per row: the distinct minima of every
    `select`-wide sliding window over the row's `window`-token rolling hashes.
    Guarantee: two rows sharing any common token run of length
    >= window + select - 1 share at least one fingerprint value.
    Rows with fewer than `window` tokens emit nothing (MinHash covers them).

    Sliding min is computed globally with log2-doubling over a
    sentinel-padded concatenation — O(m·log select), no per-row loop.
    """
    n_rows = len(lengths)
    wh, row_id = window_hashes(flat, lengths, window, prefix=prefix)
    empty_off = np.zeros(n_rows + 1, dtype=np.int64)
    if len(wh) == 0:
        return np.empty(0, dtype=np.int64), empty_off

    counts = np.bincount(row_id, minlength=n_rows)  # window hashes per row
    pad = select  # sentinel run between rows so windows never mix rows
    sent = np.iinfo(np.uint64).max
    total = int(counts.sum() + pad * n_rows)
    padded = np.full(total, sent, dtype=U64)
    # place each row's window hashes at padded_start[row]
    padded_starts = np.concatenate(([0], np.cumsum(counts + pad)))[:-1]
    dest = np.repeat(padded_starts, counts) + (
        np.arange(len(wh)) - np.repeat(np.concatenate(([0], np.cumsum(counts)))[:-1], counts)
    )
    padded[dest] = wh

    # sliding min of width `select` via doubling (select need not be pow2)
    m = padded.copy()
    span = 1
    while span < select:
        step = min(span, select - span)
        np.minimum(m[: total - step], m[step:], out=m[: total - step])
        span += step
    # m[i] = min(padded[i : i+select]); valid winnow windows for a row with c
    # hashes start at padded_start .. padded_start + max(c - select, 0)
    n_win = np.maximum(counts - select + 1, np.where(counts > 0, 1, 0))
    # when 0 < c < select the whole row is one (short) window: min over c
    # entries — sentinel padding makes m[padded_start] = min(row) correctly
    # only when c >= select; handle short rows by direct reduceat
    vals_list = []
    rows_list = []
    long_rows = counts >= select
    if long_rows.any():
        idx = np.nonzero(long_rows)[0]
        take_starts = padded_starts[idx]
        take_counts = n_win[idx]
        pos = np.repeat(take_starts, take_counts) + (
            np.arange(int(take_counts.sum()))
            - np.repeat(np.concatenate(([0], np.cumsum(take_counts)))[:-1], take_counts)
        )
        vals_list.append(m[pos])
        rows_list.append(np.repeat(idx, take_counts))
    short_rows = (counts > 0) & (counts < select)
    if short_rows.any():
        idx = np.nonzero(short_rows)[0]
        # reduceat segments must be bounded by EVERY nonzero row's start —
        # passing only the short rows' starts would let each segment run into
        # the next rows' hashes
        nonzero = np.nonzero(counts > 0)[0]
        starts_in_wh = np.concatenate(([0], np.cumsum(counts)))[:-1]
        seg_mins = np.minimum.reduceat(wh, starts_in_wh[nonzero])
        pos_of = np.searchsorted(nonzero, idx)
        vals_list.append(seg_mins[pos_of])
        rows_list.append(idx)

    v = np.concatenate(vals_list)
    r = np.concatenate(rows_list)
    order = np.lexsort((v, r))
    v, r = v[order], r[order]
    keep = np.ones(len(v), dtype=bool)
    if len(v) > 1:
        keep[1:] = (v[1:] != v[:-1]) | (r[1:] != r[:-1])
    v, r = v[keep], r[keep]
    out_counts = np.bincount(r, minlength=n_rows)
    offsets = np.concatenate(([0], np.cumsum(out_counts)))
    return v.view(np.int64), offsets
