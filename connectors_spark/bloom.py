"""Per-file Bloom-filter data skipping.

Min/max stats answer range predicates; they are useless for point
lookups on high-cardinality columns that are neither the partition nor
the clustering key (every file's [min, max] spans the probe). A
per-file Bloom filter over the column's distinct values answers
``col = literal`` / ``col IN (...)`` probabilistically: a clean miss
PROVES the file cannot contain the value, so the scan skips it; a hit
keeps the file (false positives only cost I/O, never correctness —
the same never-skip-on-missing-evidence stance as stats skipping).

This is the Delta bloom-filter index re-expressed through the action
model the reference already carries: the filter rides ``AddFile.tags``
(``bloom.<col>`` → ``"<m>:<k>:<hex>"``), the file-level annotation
channel the reference reserves for exactly this kind of metadata
(actions.scala:109-132). Writers build filters during the SAME
distributed publish pass that footer-reads stats (writer.publish_plan);
the scan-side test is a pure Column expression over ``files_df`` —
at 100 TB the file inventory is a DataFrame, so skipping must never
collect it.

Self-describing tags: m and k are stored per file, so a config change
between writes never mis-tests old files — the probe recomputes each
file's bit positions from ITS m (Column arithmetic), and files without
a tag are kept.

Sizing: with n distinct values per file, fpp ≈ (1 - e^(-kn/m))^k.
By default m is AUTO-SIZED per file (~10 bits per distinct value →
~1% fpp at k=7, floor 16 Ki bits, capped at 2^23 — see auto_bits);
pin delta.dataSkipping.bloomFilter.numBits to trade tag bytes for
selectivity explicitly (a pinned m that is too small saturates
SILENTLY: still sound, skips nothing — SCALE.md §23 measured the
threshold). The tag cost is metadata-plane: O(files × bloom'd
columns), the same budget dataSkippingNumIndexedCols bounds for
min/max width.

Hashing is md5-derived double hashing (seedless — the same determinism
doctrine as ops/sketches.py), over a canonical string key: integers as
their decimal form, strings as their UTF-8 text. Other types are out
of scope (no tag written, no test applied).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Optional, Tuple

from pyspark.sql import functions as F

BLOOM_COLUMNS_KEY = "delta.dataSkipping.bloomFilter.columns"
BLOOM_BITS_KEY = "delta.dataSkipping.bloomFilter.numBits"
BLOOM_HASHES_KEY = "delta.dataSkipping.bloomFilter.numHashes"
TAG_PREFIX = "bloom."

DEFAULT_BITS = 16384
DEFAULT_HASHES = 7
_MAX_HASHES = 16        # scan-side unroll bound (k per file may vary)


def bloom_config(configuration: Optional[Dict[str, str]]
                 ) -> Optional[Tuple[List[str], int, int]]:
    """(columns, m, k) from a metadata configuration, or None when the
    table has no bloom columns configured."""
    conf = configuration or {}
    cols = [c.strip() for c in conf.get(BLOOM_COLUMNS_KEY, "").split(",")
            if c.strip()]
    if not cols:
        return None
    m = None                       # None = auto-size per file
    if BLOOM_BITS_KEY in conf:
        m = int(conf[BLOOM_BITS_KEY])
        if m < 8 or m % 4:
            raise ValueError(f"{BLOOM_BITS_KEY} must be a multiple of "
                             f"4 >= 8, got {m}")
    k = int(conf.get(BLOOM_HASHES_KEY, str(DEFAULT_HASHES)))
    if not 1 <= k <= _MAX_HASHES:
        raise ValueError(f"{BLOOM_HASHES_KEY} must be in "
                         f"[1, {_MAX_HASHES}], got {k}")
    return cols, m, k


_AUTO_MAX_BITS = 1 << 23           # 1 MiB binary / 2 MiB hex per tag


def auto_bits(n_distinct: int) -> int:
    """Per-file filter size when numBits is not pinned: ~10 bits per
    distinct value (≈1% fpp at k=7), floor DEFAULT_BITS, capped at
    _AUTO_MAX_BITS (past the cap fpp degrades gracefully instead of
    the tag growing unbounded — still sound, just less selective).
    Self-describing tags make per-file sizing free: the probe reads
    each file's own m."""
    m = max(DEFAULT_BITS, 10 * max(n_distinct, 1))
    m = min(m, _AUTO_MAX_BITS)
    return (m + 3) // 4 * 4


def bloom_key(value) -> Optional[str]:
    """Canonical hash key shared by writer and probe; None = out of
    scope (no evidence either way)."""
    if value is None or isinstance(value, bool):
        return None
    if isinstance(value, int):
        return str(value)
    if isinstance(value, str):
        return value
    return None


def _hashes64(key: str) -> Tuple[int, int]:
    h = hashlib.md5(key.encode("utf-8")).hexdigest()
    return int(h[:15], 16), int(h[15:30], 16) | 1


def build_bloom_hex(values: Iterable, m: int, k: int) -> Optional[str]:
    """Hex filter over the values' canonical keys. Bit p lives in hex
    char p//4 at bit p%4 (nibble-wise layout so the Column-side test
    is one substr + conv per probe position). Returns None when no
    value was hashable (no tag — the file is always kept).

    The md5 per distinct value is irreducible Python, but the k
    position computations and bit sets are vectorized numpy over the
    whole (h1, h2) array — at ~60k distinct values/file the scalar
    loop dominated the publish pass. Positions use the same
    mod-m-before-scaling reduction as the Column-side probe, so every
    intermediate fits in int64."""
    import numpy as np
    h1s, h2s = [], []
    for v in values:
        key = bloom_key(v)
        if key is None:
            continue
        h1, h2 = _hashes64(key)
        h1s.append(h1)
        h2s.append(h2)
    if not h1s:
        return None
    h1a = np.asarray(h1s, dtype=np.int64) % m
    h2a = np.asarray(h2s, dtype=np.int64) % m
    nibbles = np.zeros(m // 4, dtype=np.uint8)
    for i in range(k):
        p = (h1a + i * h2a) % m
        np.bitwise_or.at(nibbles, p // 4,
                         np.left_shift(1, (p % 4)).astype(np.uint8))
    lut = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
    return lut[nibbles].tobytes().decode("ascii")


def bloom_tag_value(hex_filter: str, m: int, k: int) -> str:
    return f"{m}:{k}:{hex_filter}"


def bloom_keep_column(tag_col, value) -> Optional[F.Column]:
    """Keep-file Column testing ``value`` against a file's
    self-describing bloom tag (``m:k:hex``). NULL tag → keep. The
    file's own m and k drive the positions, so filters written under
    older configs stay sound.

    Built as ONE higher-order ``forall`` over the k probe positions
    (lambda-bound index), not an unrolled when-chain: an IN list can
    put dozens of these on a single scan, and unrolled trees made
    ANALYSIS — not execution — the bottleneck (~1 s/probe). The
    60-bit hashes are reduced mod the FILE's m before scaling by i
    ((h1 + i*h2) % m == ((h1%m) + i*(h2%m)) % m), keeping every
    intermediate far under long range in ANSI mode."""
    key = bloom_key(value)
    if key is None:
        return None
    h1, h2 = _hashes64(key)
    m, k, hx = _tag_parts(tag_col)
    keep = _hit_expr(m, k, hx, F.lit(h1) % m, F.lit(h2) % m)
    # NULL-tag fast path: CaseWhen short-circuits per row, so files
    # without a bloom tag (untagged tables, non-bloom'd columns) never
    # evaluate the probe expression at all — without this they'd walk
    # the whole NULL-propagating probe tree just to coalesce to True
    return F.when(tag_col.isNull(), F.lit(True)) \
        .otherwise(F.coalesce(keep, F.lit(True)))


def _tag_parts(tag_col):
    parts = F.split(tag_col, ":")
    return (parts.getItem(0).cast("long"), parts.getItem(1).cast("int"),
            parts.getItem(2))


def _hit_expr(m, k, hx, h1c, h2c):
    """All-k-bits-set test for one (h1 mod m, h2 mod m) pair against a
    file's hex filter — the shared probe core."""
    bit_of = F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8))

    def probe(i):
        p = (h1c + i.cast("long") * h2c) % m
        ch = hx.substr((p / F.lit(4)).cast("long") + F.lit(1), F.lit(1))
        nib = F.conv(ch, 16, 10).cast("long")
        mask = F.element_at(bit_of, (p % F.lit(4)).cast("int")
                            + F.lit(1)).cast("long")
        return nib.bitwiseAND(mask) != F.lit(0)

    return F.forall(F.sequence(F.lit(0), k - F.lit(1)), probe)


def bloom_keep_any_column(tag_col, values) -> Optional[F.Column]:
    """Keep-file Column for ``col IN (values)``: the file survives iff
    ANY value may be present (a file where every value cleanly misses
    provably serves none of them). The hash pairs are driver-computed
    and shipped as TWO array literals; the test is one short-circuiting
    ``exists`` over them wrapping the same ``forall`` probe core — one
    Column regardless of list size, never an unrolled OR of probes
    (runtime join-key pruning hands this hundreds of keys).

    Any value outside the hashable domain (NULL, non-int/str) → None:
    that value carries no evidence, and under OR semantics one
    unprovable disjunct forfeits the whole test (same soundness stance
    as stats skipping's OR rule)."""
    keys = [bloom_key(v) for v in values]
    if not keys or any(key is None for key in keys):
        return None
    hs = [_hashes64(key) for key in keys]
    m, k, hx = _tag_parts(tag_col)
    h1s = F.lit([h[0] for h in hs]).cast("array<long>")
    h2s = F.lit([h[1] for h in hs]).cast("array<long>")
    keep = F.exists(
        F.sequence(F.lit(1), F.lit(len(hs))),
        lambda j: _hit_expr(m, k, hx,
                            F.element_at(h1s, j.cast("int")) % m,
                            F.element_at(h2s, j.cast("int")) % m))
    # NULL-tag fast path (two-phase evaluation, VERDICT r10 #5): the
    # n×k interpreted HOF runs ONLY on rows that actually carry a
    # bloom tag — an untagged file otherwise iterates all n exists
    # elements propagating NULL before coalescing to True. Combined
    # with the envelope being the LEFT conjunct in scan.py (Spark's
    # And short-circuits per row), the expensive probe is evaluated
    # exactly on envelope-surviving, bloom-tagged files.
    return F.when(tag_col.isNull(), F.lit(True)) \
        .otherwise(F.coalesce(keep, F.lit(True)))
