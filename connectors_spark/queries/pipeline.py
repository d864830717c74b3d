"""Training-data pipeline suite: dedup, similarity search, text
analysis, multimodal — the §7 extension operators, each with a
double-entry DuckDB oracle where SQL can express it.

The oracle SQL re-derives the exact same md5-based hashing and
double-precision arithmetic, so a hash-compare pins the operator's
semantics, not just its row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import (LANG_MARKERS, STOPWORDS_EN, lang_id,
                              punct_ratio, stopword_ratio, token_count)
from ..ops import dedup as dd
from ..ops import multimodal as mm
from ..ops import similarity as sim
from .registry import load, register


def _bounded_index_fixture(spark, path: str, max_version: int = 40) -> None:
    """Reset a persistent /tmp index fixture whose Delta log outgrew
    ``max_version`` commits (the VERDICT r13 #7 policy the merge bench
    fixture uses): every caller rebuilds/overwrites the index DATA each
    process anyway, but overwrite commits keep APPENDING to the log, so
    across many sessions each run replays an ever-longer tail. Results
    are unchanged — only the fixture's age resets."""
    import shutil
    from ..table import DeltaTable
    try:
        snap = DeltaTable.for_path(spark, path).log.snapshot()
    except Exception:  # noqa: BLE001 — absent/unreadable: builder remakes it
        return
    if snap is not None and snap.version > max_version:
        shutil.rmtree(path, ignore_errors=True)


# Shared oracle CTEs ------------------------------------------------------

_TOKS = """
toks AS (
  SELECT doc_id, lang, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents)
"""

_SHINGLES = _TOKS + """,
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  for i in range(1, len(t) - 1)])
              ELSE [] END AS s
  FROM toks)
"""

_H64 = "('0x' || substring(md5({v}), 1, 15))::BIGINT"

# Random-hyperplane LSH oracle: re-derives ops/similarity._plane exactly —
# component j of plane idx is md5(f"plane:{idx}:{j}")[:15] parsed base-16,
# scaled to [-1, 1) over 2^60. Bit-identical to the numpy path (verified:
# 0/6000 signature mismatches at sf0.01); a sign flip would need
# |dot| ≲ 1e-13.
_LSH_SIGS = """
planes AS (
  SELECT t.range::INT AS tbl, p.range::INT AS p, j.range::INT AS j,
         2.0 * (('0x' || substring(md5('plane:' ||
                   (t.range * 3 + p.range)::VARCHAR || ':' ||
                   j.range::VARCHAR), 1, 15))::BIGINT
                / 1152921504606846976.0) - 1.0 AS w
  FROM range(12) t, range(3) p, range(64) j),
u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
dots AS (
  SELECT u.vec_id, pl.tbl, pl.p, sum(u.v * pl.w) AS d
  FROM u JOIN planes pl ON u.i = pl.j GROUP BY 1, 2, 3),
sigs AS (
  SELECT vec_id, tbl,
         sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS sig
  FROM dots GROUP BY 1, 2)
"""

# Candidate pairs (query < 5 probing its buckets) → exact-cosine verify →
# per-query top-5 with (sim DESC, cid ASC) tie-break — the same contract as
# ops/similarity.ann_lsh_topk and ann_query_indexed (which are
# result-identical by construction; equality pinned in tests).
_ANN_TOPK_SQL = "WITH " + _LSH_SIGS + """,
cand AS (
  SELECT DISTINCT qs.vec_id AS qid, cs.vec_id AS cid
  FROM sigs qs JOIN sigs cs USING (tbl, sig)
  WHERE qs.vec_id < 5 AND cs.vec_id <> qs.vec_id),
d AS (
  SELECT c.qid, c.cid, sum(uq.v * uc.v) AS dot
  FROM cand c
  JOIN u uq ON uq.vec_id = c.qid
  JOIN u uc ON uc.vec_id = c.cid AND uc.i = uq.i
  GROUP BY 1, 2),
s AS (
  SELECT qid, cid, round(dot / nq.nrm / nc.nrm, 6) AS sim
  FROM d JOIN n nq ON nq.vec_id = qid JOIN n nc ON nc.vec_id = cid)
SELECT qid AS query_id, cid AS vec_id, sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, cid) AS rank
  FROM s) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

@register("doc_exact_dup_stats", sql=r"""
WITH fp AS (
  SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
  FROM documents)
SELECT count(*)::BIGINT AS n_docs,
       count(DISTINCT f)::BIGINT AS n_unique,
       (count(*) - count(DISTINCT f))::BIGINT AS n_exact_dups
FROM fp
""")
def doc_exact(spark, sf_dir):
    return dd.exact_dup_stats(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (inverted-index candidates)
# --------------------------------------------------------------------------

@register("doc_ngram_jaccard_pairs", sql=f"""
WITH {_SHINGLES},
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
shared AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sz AS (SELECT doc_id, len(s) AS z FROM sh)
SELECT a_id, b_id,
       round(c::DOUBLE / (za.z + zb.z - c), 6) AS jaccard
FROM shared JOIN sz za ON za.doc_id = a_id
            JOIN sz zb ON zb.doc_id = b_id
WHERE c::DOUBLE / (za.z + zb.z - c) >= 0.8
""", bench=True)
def doc_jaccard(spark, sf_dir):
    return dd.ngram_jaccard_pairs(load(spark, sf_dir, "documents"),
                                  threshold=0.8)


# --------------------------------------------------------------------------
# Robust per-source outlier filter (median / MAD rule)
# --------------------------------------------------------------------------

@register("doc_mad_outliers", sql="""
WITH v AS (SELECT doc_id, source, n_chars::DOUBLE AS n_chars
           FROM documents),
med AS (SELECT source, quantile_cont(n_chars, 0.5) AS group_median
        FROM v GROUP BY source),
dev AS (SELECT v.*, med.group_median,
               abs(v.n_chars - med.group_median) AS ad
        FROM v JOIN med USING (source)),
mad AS (SELECT source, quantile_cont(ad, 0.5) AS group_mad
        FROM dev GROUP BY source)
SELECT dev.doc_id, dev.source, dev.n_chars,
       round(dev.group_median, 6) AS group_median,
       round(mad.group_mad, 6) AS group_mad,
       abs(dev.n_chars - dev.group_median)
           > 3.0 * mad.group_mad AS is_outlier
FROM dev JOIN mad USING (source)
""")
def doc_mad_outliers(spark, sf_dir):
    # Robust length-outlier flagging per source: median/MAD instead of
    # mean/stddev, so the outliers being hunted can't inflate the
    # threshold that should catch them (one 2 GB doc widens sigma
    # until nothing flags; it barely moves the median). Exact
    # percentiles both sides — group cardinality is sources, not
    # corpus-sized.
    from ..ops.quality import mad_outliers
    return mad_outliers(load(spark, sf_dir, "documents"),
                        value_col="n_chars", group_col="source")


@register("doc_winsorize_stats", sql="""
WITH v AS (SELECT source, n_chars::DOUBLE AS val FROM documents),
b AS (SELECT source, quantile_cont(val, 0.05) AS p_lo,
             quantile_cont(val, 0.95) AS p_hi
      FROM v GROUP BY source)
SELECT v.source, count(*)::BIGINT AS n,
       round(any_value(b.p_lo), 6) AS p_lo,
       round(any_value(b.p_hi), 6) AS p_hi,
       round(avg(v.val), 6) AS mean_raw,
       round(avg(greatest(b.p_lo, least(b.p_hi, v.val))), 6)
           AS mean_winsorized,
       round(avg((v.val < b.p_lo OR v.val > b.p_hi)::INT::DOUBLE), 6)
           AS clipped_frac
FROM v JOIN b USING (source)
GROUP BY v.source
""")
def doc_winsorize(spark, sf_dir):
    # Per-source winsorized length stats: keep heavy-tailed rows but
    # clamp the tails so a few extremes can't dominate means/budgets
    # — the robust-stats companion to doc_mad_outliers (which drops).
    from ..ops.quality import winsorize_stats
    return winsorize_stats(load(spark, sf_dir, "documents"),
                           value_col="n_chars", group_col="source")


@register("doc_ngram_containment_pairs", sql=f"""
WITH {_SHINGLES},
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
shared AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sz AS (SELECT doc_id, len(s) AS z FROM sh),
dir AS (
  SELECT s.a_id, s.b_id, s.c::DOUBLE / za.z AS containment
  FROM shared s JOIN sz za ON za.doc_id = s.a_id
  UNION ALL
  SELECT s.b_id AS a_id, s.a_id AS b_id, s.c::DOUBLE / zb.z
  FROM shared s JOIN sz zb ON zb.doc_id = s.b_id)
SELECT a_id, b_id, round(containment, 6) AS containment
FROM dir WHERE containment >= 0.5
""")
def doc_containment(spark, sf_dir):
    # Directed containment |Sa∩Sb|/|Sa|: catches a short doc embedded
    # in a long one (quote/inclusion), which Jaccard structurally
    # misses — same inverted-index plan, no length prune (unsound for
    # containment), threshold 0.5 so the asymmetric cases surface.
    from ..ops.dedup import ngram_containment_pairs
    return ngram_containment_pairs(load(spark, sf_dir, "documents"),
                                   threshold=0.5)


@register("doc_boundary_stitch_pairs", sql=f"""
WITH {_TOKS},
d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 8),
grams AS (
  SELECT doc_id, t, n, u.i AS pos, t[u.i : u.i + 7] AS g
  FROM d, unnest(generate_series(1, n - 7)) AS u(i)),
cand AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         a.n - a.pos + 1 AS m, a.t AS ta, a.n AS na,
         b.t AS tb, b.n AS nb
  FROM grams a JOIN d b
    ON a.g = b.t[1:8] AND a.doc_id <> b.doc_id)
SELECT a_id, b_id, max(m)::BIGINT AS overlap_tokens
FROM cand
WHERE m <= nb AND ta[na - m + 1 : na] = tb[1:m]
GROUP BY a_id, b_id
""")
def doc_boundary_stitch(spark, sf_dir):
    # Shard-boundary stitch detection: the last k tokens of one doc =
    # the first k of another (a document split across extraction
    # shards — each half defeats pairwise dedup). Candidates via an
    # 8-byte boundary-key hash join; maximal overlap extended on the
    # (rare) joined pairs only.
    from ..ops.dedup import boundary_stitch_pairs
    return boundary_stitch_pairs(load(spark, sf_dir, "documents"), k=8)


@register("doc_ngram_novelty", sql=f"""
WITH {_SHINGLES},
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
freq AS (SELECT g, count(*)::BIGINT AS df FROM ex GROUP BY g)
SELECT ex.doc_id, count(*)::BIGINT AS n_shingles,
       sum((freq.df = 1)::INT)::BIGINT AS novel_shingles,
       round(sum((freq.df = 1)::INT)::DOUBLE / count(*), 6) AS novelty
FROM ex JOIN freq USING (g)
GROUP BY ex.doc_id
""")
def doc_novelty(spark, sf_dir):
    # Corpus-level novelty: fraction of a doc's distinct shingles
    # appearing in no other doc — catches template recombination that
    # never crosses a pairwise dup threshold.
    from ..ops.quality import ngram_novelty
    return ngram_novelty(load(spark, sf_dir, "documents"))


@register("doc_group_sample", sql="""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
                    doc_id) AS rn
  FROM documents)
SELECT doc_id, source FROM r WHERE rn <= 7
""")
def doc_group_sample(spark, sf_dir):
    # Exactly 7 docs per source, hash-deterministic — the two-phase
    # salted window keeps every partition bounded (no per-source
    # straggler task at corpus scale); the oracle is the single-window
    # definition the two phases provably equal.
    from ..ops.sampling import group_sample
    return group_sample(load(spark, sf_dir, "documents")
                        .select("doc_id", "source"), "source", 7)


@register("ev_throttle_first_per_window", sql="""
WITH b AS (
  SELECT *, floor(epoch(ts) / 600) AS w,
         row_number() OVER (
           PARTITION BY user_id, event_type, floor(epoch(ts) / 600)
           ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_id, ts, user_id, event_type, value, props
FROM b WHERE rn = 1
""")
def ev_throttle(spark, sf_dir):
    # First event per (user, type) per 10-minute window — the
    # dedup-bounce / rate-limit pass before sessionizing. One
    # map-side-combinable min_by aggregation, no window funnel.
    from ..ops.temporal import throttle_first_per_window
    return throttle_first_per_window(
        load(spark, sf_dir, "events"), ["user_id", "event_type"],
        "ts", 600)


# --------------------------------------------------------------------------
# Fuzzy (edit-distance) self-join — q-gram count-filter candidates
# --------------------------------------------------------------------------

@register("doc_fuzzy_edit_pairs", sql="""
WITH d AS (SELECT doc_id, substr(text, 1, 64) AS pre FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       levenshtein(a.pre, b.pre)::BIGINT AS dist
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE levenshtein(a.pre, b.pre) <= 8
""")
def doc_fuzzy_edit(spark, sf_dir):
    """All document pairs whose 64-char text prefixes are within
    Levenshtein distance 8 — the entity-resolution primitive over a
    title-ish key. The oracle is the O(n²) definition; the Spark plan
    is the index-bounded q-gram count filter (ops/fuzzy.py), exact by
    the Gravano bound, with the hot-gram cap engaged so the plan
    exercised at the gate is the one you'd run at 100 TB."""
    from ..ops.fuzzy import edit_distance_pairs
    d = (load(spark, sf_dir, "documents")
         .select("doc_id", F.substring("text", 1, 64).alias("pre")))
    return edit_distance_pairs(d, k=8, id_col="doc_id", str_col="pre",
                               max_gram_freq=1000)


# --------------------------------------------------------------------------
# MinHash + LSH near-dup pairs
# --------------------------------------------------------------------------

def _perm_values() -> str:
    return ", ".join(f"({i}, {a}, {b})"
                     for i, (a, b) in enumerate(dd.MINHASH_PERMS))


# Shared signature pipeline: shingles -> 60-bit hashes -> 16 permuted
# minima -> 4 banded md5 bucket keys (also the persistent index's
# identity in doc_incremental_neardup).
_SIG_CTES = f"""{_SHINGLES},
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
h AS (SELECT doc_id, {_H64.format(v='g')} % {dd.MINHASH_PRIME} AS hv FROM ex),
perms(i, a, b) AS (VALUES {_perm_values()}),
sig AS (
  SELECT doc_id, i, min((a * hv + b) % {dd.MINHASH_PRIME}) AS m
  FROM h CROSS JOIN perms GROUP BY 1, 2),
bnd AS (
  SELECT doc_id, i // 4 AS band,
         md5(string_agg(m::VARCHAR, ',' ORDER BY i)) AS key
  FROM sig GROUP BY doc_id, i // 4)"""


_MINHASH_CTES = f"""{_SIG_CTES},
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bnd a JOIN bnd b ON a.band = b.band AND a.key = b.key
                        AND a.doc_id < b.doc_id),
ver AS (
  SELECT a_id, b_id,
         len(list_intersect(sa.s, sb.s))::BIGINT AS c,
         len(sa.s) AS za, len(sb.s) AS zb
  FROM cand JOIN sh sa ON sa.doc_id = a_id
            JOIN sh sb ON sb.doc_id = b_id)"""


@register("doc_minhash_lsh_pairs", sql=f"""
WITH {_MINHASH_CTES}
SELECT a_id, b_id, round(c::DOUBLE / (za + zb - c), 6) AS jaccard
FROM ver WHERE c::DOUBLE / (za + zb - c) >= 0.8
""", bench=True)
def doc_minhash(spark, sf_dir):
    return dd.minhash_lsh_pairs(load(spark, sf_dir, "documents"),
                                threshold=0.8)


# --------------------------------------------------------------------------
# SimHash near-dup pairs
# --------------------------------------------------------------------------

@register("doc_simhash_pairs", sql=f"""
WITH {_TOKS},
tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
h AS (SELECT doc_id, {_H64.format(v='w')} AS hv FROM tok),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
  GROUP BY 1, 2),
simh AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
         AS simhash
  FROM bits GROUP BY 1),
chunks AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * 15)) & 32767 AS key
  FROM simh CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
capped AS (
  -- mirror the operator's deterministic bucket cap: each (band, key)
  -- bucket keeps only its 64 smallest doc_ids (degenerate buckets of
  -- chunk-identical docs would otherwise expand quadratically). The
  -- uncapped oracle matched at sf0.01 but diverged at sf0.1, where
  -- buckets first exceed 64 docs.
  SELECT doc_id, simhash, band, key FROM (
    SELECT doc_id, simhash, band, key,
           row_number() OVER (PARTITION BY band, key
                              ORDER BY doc_id) AS rn
    FROM chunks) WHERE rn <= 64),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                  a.simhash AS asim, b.simhash AS bsim
  FROM capped a JOIN capped b ON a.band = b.band AND a.key = b.key
                              AND a.doc_id < b.doc_id)
SELECT a_id, b_id, bit_count(xor(asim, bsim))::INTEGER AS hamming
FROM cand WHERE bit_count(xor(asim, bsim)) <= 9
""")
def doc_simhash(spark, sf_dir):
    return (dd.simhash_pairs(load(spark, sf_dir, "documents"), max_hamming=9)
            .select("a_id", "b_id", F.col("hamming").cast("int").alias("hamming")))


# --------------------------------------------------------------------------
# Winnowing (rolling-hash) partial-overlap pairs
# --------------------------------------------------------------------------

@register("doc_winnow_overlap_pairs", sql=f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
  FROM documents),
kg AS (
  SELECT doc_id,
         CASE WHEN length(t) >= 8
              THEN [{_H64.format(v="substring(t, i, 8)")}
                    for i in range(1, length(t) - 8 + 2)]
              ELSE [{_H64.format(v="t")}] END AS h
  FROM norm),
win AS (
  SELECT doc_id,
         CASE WHEN len(h) >= 4
              THEN list_distinct([list_min(h[i:i+3])
                                  for i in range(1, len(h) - 4 + 2)])
              ELSE list_distinct(h) END AS fps
  FROM kg),
ex AS (SELECT doc_id, len(fps) AS z, unnest(fps) AS f FROM win),
hot AS (SELECT f FROM ex GROUP BY f HAVING count(*) > 128),
ex2 AS (SELECT * FROM ex WHERE f NOT IN (SELECT f FROM hot)),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         any_value(a.z) AS za, any_value(b.z) AS zb,
         count(*)::BIGINT AS shared
  FROM ex2 a JOIN ex2 b ON a.f = b.f AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT a_id, b_id, shared,
       round(shared::DOUBLE / (za + zb - shared), 6) AS overlap
FROM pairs WHERE shared >= 30
""")
def doc_winnow(spark, sf_dir):
    # max_fp_freq=128: a fingerprint appearing in f docs expands to
    # f²/2 candidate pairs; uncapped, one ubiquitous boilerplate
    # k-gram makes the self-join quadratic (found REAL at the sf10
    # probe — the r11 LSH bucket-cap cliff class). The oracle models
    # the cap (hot/ex2 CTEs), and `z` stays the FULL fingerprint-set
    # size on both sides so the overlap denominator is uncapped.
    return dd.winnow_overlap_pairs(load(spark, sf_dir, "documents"),
                                   min_shared=30, max_fp_freq=128)


# --------------------------------------------------------------------------
# Text quality stats per language
# --------------------------------------------------------------------------

_SW = ", ".join(f"'{w}'" for w in STOPWORDS_EN)


@register("doc_text_stats", sql=f"""
WITH {_TOKS},
per AS (
  SELECT toks.lang, len(t) AS n_toks,
         CASE WHEN len(t) > 0
              THEN len(list_filter(t, x -> list_contains([{_SW}], x)))::DOUBLE
                   / len(t) ELSE 0.0 END AS swr,
         CASE WHEN length(lower(d.text)) > 0
              THEN length(regexp_replace(lower(d.text), '[a-z0-9 ]', '', 'g'))::DOUBLE
                   / length(lower(d.text)) ELSE 0.0 END AS pr
  FROM toks JOIN documents d USING (doc_id))
SELECT lang, count(*)::BIGINT AS n_docs,
       round(avg(n_toks), 4) AS avg_tokens,
       round(avg(swr), 6) AS avg_stopword_ratio,
       round(avg(pr), 6) AS avg_punct_ratio
FROM per GROUP BY lang
""")
def doc_stats(spark, sf_dir):
    docs = dd._spread(load(spark, sf_dir, "documents"))
    return (docs.select("lang",
                        token_count("text").alias("_nt"),
                        stopword_ratio("text").alias("_swr"),
                        punct_ratio("text").alias("_pr"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("_nt"), 4).alias("avg_tokens"),
                 F.round(F.avg("_swr"), 6).alias("avg_stopword_ratio"),
                 F.round(F.avg("_pr"), 6).alias("avg_punct_ratio")))


# --------------------------------------------------------------------------
# Language-ID confusion counts
# --------------------------------------------------------------------------

def _lang_sql_scores() -> str:
    parts = []
    for lg in sorted(LANG_MARKERS):
        words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lg])
        parts.append(
            f"len(list_filter(t, x -> list_contains([{words}], x))) AS s_{lg}")
    return ", ".join(parts)


def _lang_sql_argmax() -> str:
    langs = sorted(LANG_MARKERS)
    g = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    whens = "\n".join(f"WHEN s_{lg} = {g} THEN '{lg}'" for lg in langs)
    return f"CASE WHEN {g} = 0 THEN 'en'\n{whens}\nEND"


@register("doc_lang_id", sql=f"""
WITH {_TOKS},
sc AS (SELECT doc_id, lang, {_lang_sql_scores()} FROM toks)
SELECT lang, {_lang_sql_argmax()} AS pred, count(*)::BIGINT AS n
FROM sc GROUP BY 1, 2
""")
def doc_lang(spark, sf_dir):
    docs = dd._spread(load(spark, sf_dir, "documents"))
    return (docs.select("lang", lang_id("text").alias("pred"))
            .groupBy("lang", "pred").agg(F.count(F.lit(1)).alias("n")))


# --------------------------------------------------------------------------
# Token top-k
# --------------------------------------------------------------------------

@register("doc_token_topk", sql=f"""
WITH {_TOKS}
SELECT w AS token, count(*)::BIGINT AS n
FROM (SELECT unnest(t) AS w FROM toks)
GROUP BY w ORDER BY n DESC, token LIMIT 20
""")
def doc_tokens(spark, sf_dir):
    from ..functions.text import tokens
    docs = load(spark, sf_dir, "documents")
    return (docs.select(F.explode_outer(tokens("text")).alias("token"))
            .where(F.col("token").isNotNull())
            .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("token")).limit(20))


# --------------------------------------------------------------------------
# PII redaction (functions.text.redact_pii)
# --------------------------------------------------------------------------

@register("doc_redact_pii", sql="""
WITH seeded AS (
  SELECT doc_id,
         'reach me at user' || doc_id || '@mail.example.org or ' ||
         'https://ex.org/d/' || doc_id || ' tel +1 555 010' || doc_id ||
         ' . ' || text AS text
  FROM documents),
red AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\\s]+', '<URL>', 'g'),
             '\\+?[0-9][0-9() -]{6,}[0-9]', '<PHONE>', 'g') AS text
  FROM seeded)
SELECT doc_id, md5(text) AS h FROM red
""")
def doc_redact(spark, sf_dir):
    # The corpus is synthetic word soup, so the PII is injected
    # deterministically (same concat in both engines); the md5 of the
    # redacted text then pins the exact regex replacement semantics --
    # email before phone so address digits never half-match.
    from ..functions.text import redact_pii
    docs = dd._spread(load(spark, sf_dir, "documents"))
    seeded = docs.select(
        "doc_id",
        F.concat(F.lit("reach me at user"), F.col("doc_id").cast("string"),
                 F.lit("@mail.example.org or https://ex.org/d/"),
                 F.col("doc_id").cast("string"), F.lit(" tel +1 555 010"),
                 F.col("doc_id").cast("string"), F.lit(" . "),
                 F.col("text")).alias("text"))
    return seeded.select("doc_id", F.md5(redact_pii("text")).alias("h"))


# --------------------------------------------------------------------------
# Boilerplate chunk removal (ops.dedup.remove_boilerplate)
# --------------------------------------------------------------------------

@register("doc_boilerplate_removal", sql=f"""
WITH {_TOKS},
ch AS (
  SELECT doc_id, i::INT - 1 AS pos,
         array_to_string(list_slice(t, (i - 1) * 10 + 1, i * 10), ' ')
             AS chunk
  FROM toks, unnest(range(1, ceil(len(t) / 10.0)::BIGINT + 1)) AS u(i)
  WHERE len(t) > 0),
bp AS (
  SELECT chunk FROM (SELECT DISTINCT doc_id, chunk FROM ch) d
  GROUP BY chunk HAVING count(*) >= 2),
kept AS (SELECT * FROM ch WHERE chunk NOT IN (SELECT chunk FROM bp)),
reassembled AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS text
  FROM kept GROUP BY doc_id)
SELECT doc_id, md5(text) AS h FROM reassembled WHERE length(text) > 0
""")
def doc_boilerplate(spark, sf_dir):
    # Sub-document dedup: 10-token chunks occurring in >=2 distinct docs
    # (exact-dup documents make every chunk boilerplate) are stripped;
    # survivors reassemble in position order. md5 pins reassembly exactly.
    from ..ops.dedup import remove_boilerplate
    docs = load(spark, sf_dir, "documents")
    out = remove_boilerplate(docs, chunk_tokens=10, min_docs=2)
    return out.select("doc_id", F.md5("text").alias("h"))


@register("doc_chunk_dedup_first", sql=f"""
WITH {_TOKS},
ch AS (
  SELECT doc_id, i::INT - 1 AS pos,
         array_to_string(list_slice(t, (i - 1) * 10 + 1, i * 10), ' ')
             AS chunk
  FROM toks, unnest(range(1, ceil(len(t) / 10.0)::BIGINT + 1)) AS u(i)
  WHERE len(t) > 0),
kept AS (
  SELECT doc_id, pos, chunk FROM (
    SELECT *, row_number() OVER (PARTITION BY chunk
                                 ORDER BY doc_id, pos) AS rn
    FROM ch) WHERE rn = 1),
reassembled AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS text
  FROM kept GROUP BY doc_id)
SELECT doc_id, md5(text) AS h FROM reassembled WHERE length(text) > 0
""")
def doc_chunk_dedup_first(spark, sf_dir):
    # CCNet/RefinedWeb line-dedup analogue: every repeated 10-token
    # chunk keeps only its globally FIRST occurrence (lowest
    # (doc_id, pos)) — one copy of repeated text always survives,
    # unlike boilerplate removal which drops all copies. md5 of the
    # reassembled text pins winner choice and position order exactly.
    from ..ops.dedup import dedup_chunks_keep_first
    out = dedup_chunks_keep_first(load(spark, sf_dir, "documents"),
                                  chunk_tokens=10)
    return out.select("doc_id", F.md5("text").alias("h"))


# --------------------------------------------------------------------------
# Stratified per-language sampling (ops/sampling.py)
# --------------------------------------------------------------------------

_STRATA = {"en": 0.5, "de": 0.25, "zh": 0.1}


@register("doc_stratified_sample", sql=f"""
SELECT doc_id, lang FROM documents
WHERE ({_H64.format(v="doc_id::VARCHAR")} % 10000) <
      CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                WHEN 'zh' THEN 1000 ELSE 0 END
""")
def doc_stratified(spark, sf_dir):
    # Deterministic per-stratum Bernoulli sample: 50% of en, 25% of de,
    # 10% of zh, drop other languages. A pure filter (no shuffle); the
    # oracle pins the EXACT selected id set, not just stratum counts.
    from ..ops.sampling import stratified_sample
    docs = load(spark, sf_dir, "documents")
    return (stratified_sample(docs, "lang", _STRATA, id_col="doc_id")
            .select("doc_id", "lang"))


# --------------------------------------------------------------------------
# TF-IDF term weights / BM25 retrieval scoring (ops/ranking.py)
# --------------------------------------------------------------------------

@register("doc_tfidf_terms", sql=f"""
WITH {_TOKS},
post AS (
  SELECT doc_id, w AS term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks) u GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM documents)
SELECT term, df, sum(tf)::BIGINT AS total_tf,
       round(sum(tf * ln(n.n / df)), 4) AS total_tfidf
FROM post JOIN dfr USING (term), n
GROUP BY term, df
""")
def doc_tfidf(spark, sf_dir):
    # Per-term corpus rollup of the (doc, term) tf-idf relation: pins the
    # postings construction, the df aggregate, and the idf arithmetic
    # without depending on per-row float ordering.
    from ..ops.ranking import tfidf
    docs = load(spark, sf_dir, "documents")
    rel = tfidf(docs)
    return (rel.groupBy("term", "df")
            .agg(F.sum("tf").alias("total_tf"),
                 F.round(F.sum("tfidf"), 4).alias("total_tfidf")))


_BM25_QUERY = ("spark", "join", "filter")


@register("doc_bm25_scores", sql=f"""
WITH {_TOKS},
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
post AS (
  SELECT doc_id, w AS term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks) u
  WHERE w IN {repr(_BM25_QUERY)} GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY 1)
SELECT doc_id,
       round(sum(ln(1 + (st.n - df + 0.5) / (df + 0.5))
                 * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / st.avgdl))),
             4) AS score
FROM post JOIN dfr USING (term) JOIN dl USING (doc_id), st
GROUP BY doc_id
""")
def doc_bm25(spark, sf_dir):
    # Okapi BM25 (k1=1.2, b=0.75) of every document against a fixed
    # 3-term query; only docs containing >=1 query term score.
    from ..ops.ranking import bm25
    docs = load(spark, sf_dir, "documents")
    return (bm25(docs, list(_BM25_QUERY))
            .select("doc_id", F.round("score", 4).alias("score")))


# --------------------------------------------------------------------------
# Corpus composition: per-domain capping + incremental cross-batch dedup
# --------------------------------------------------------------------------

@register("doc_domain_cap", sql="""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents) WHERE rk <= 10
""")
def doc_domain_cap(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return dd.cap_per_group(docs, group_col="source", cap=10) \
        .select("doc_id", "source", "n_chars")


@register("doc_salted_stats_join", sql="""
WITH stats AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         round(avg(n_chars), 6) AS avg_chars
  FROM documents GROUP BY 1)
SELECT d.doc_id, d.source, s.n_docs, s.avg_chars
FROM documents d JOIN stats s ON d.source = s.source
""")
def doc_salted_join(spark, sf_dir):
    # Skew-mitigated join (ops/skew.py): the docs→per-source-stats join
    # keys on a low-cardinality `source` column — the textbook hot-key
    # shape. salted_join spreads each key over 16 shuffle partitions;
    # output is identical to the plain join the oracle runs.
    from ..ops.skew import salted_join
    docs = load(spark, sf_dir, "documents")
    stats = (docs.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.round(F.avg("n_chars"), 6).alias("avg_chars")))
    return (salted_join(docs.select("doc_id", "source"), stats,
                        on=["source"], n_salts=16)
            .select("doc_id", "source", "n_docs", "avg_chars"))


@register("doc_incremental_ingest", sql=r"""
WITH fp AS (
  SELECT doc_id, source,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
  FROM documents),
b1 AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0),
firsts AS (SELECT f, min(doc_id) AS first_id FROM fp GROUP BY 1)
SELECT p.doc_id, p.source
FROM fp p JOIN firsts fi ON fi.f = p.f AND fi.first_id = p.doc_id
WHERE p.f NOT IN (SELECT f FROM b1)
""")
def doc_incremental(spark, sf_dir):
    """Two-batch ingestion: batch 1 (even doc_ids) seeds the persistent
    fingerprint index (a Delta table, rebuilt each call so the query is
    idempotent); batch 2 (the full corpus) ingests against it — accepted
    docs are those unseen in batch 1 and first-of-fingerprint in
    batch 2. Exercises the whole incremental-dedup loop including the
    transactional index append."""
    import hashlib
    import tempfile
    docs = load(spark, sf_dir, "documents")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/connectors_spark_fp_index_{tag}"
    _bounded_index_fixture(spark, path)
    dd.build_fingerprint_index(docs.where(F.col("doc_id") % 2 == 0), path)
    return dd.ingest_dedup(docs, path).select("doc_id", "source")


# --------------------------------------------------------------------------
# Multimodal: fake decode via Arrow-batched mapInPandas
# --------------------------------------------------------------------------

@register("mm_decode_features", sql="""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(text))::BIGINT AS n_bytes
  FROM documents)
SELECT doc_id, kind, n_bytes,
       (16 + n_bytes % 32)::INTEGER AS width,
       (16 + n_bytes % 17)::INTEGER AS height,
       (CASE WHEN kind = 'image' THEN 1 ELSE n_bytes % 100 END)::INTEGER
       AS n_frames
FROM m
""")
def mm_decode(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return mm.fake_decode_features(mm.attach_fake_media(docs))


@register("mm_frame_sample", sql="""
WITH v AS (
  SELECT doc_id, octet_length(encode(text))::BIGINT AS nb
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT doc_id, nb, unnest(range(0, nb % 100, 10)) AS frame_idx
  FROM v WHERE nb % 100 > 0)
SELECT doc_id, frame_idx::INTEGER AS frame_idx,
       (frame_idx * 256) % greatest(nb, 1) AS frame_off
FROM f
""")
def mm_frames(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    frames = mm.fake_frame_sample(mm.attach_fake_media(docs))
    return frames.select("doc_id", "frame_idx", "frame_off")


# --------------------------------------------------------------------------
# REAL image decode (stdlib PNG/BMP codec, ops/imagecodec.py): the corpus
# is real encoded bytes (PNG with per-row mixed filters / bottom-up BMP)
# whose pixels follow a closed-form rule of doc_id, so the oracle can
# recompute the expected pixel sums from the rule while Spark must parse
# actual image files to produce them. pix_xsum is position-weighted, so a
# filter/row-order bug in the decoder cannot cancel out.
# --------------------------------------------------------------------------

_IMG_DIMS_CTE = """
g AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
         CASE WHEN doc_id % 5 = 0 OR doc_id % 2 = 1 THEN 3 ELSE 1 END AS c,
         CASE WHEN doc_id % 5 = 0 THEN 'bmp' ELSE 'png' END AS fmt
  FROM documents)"""


@register("mm_image_decode_real", sql=f"""
WITH {_IMG_DIMS_CTE},
px AS (
  SELECT g.doc_id, g.fmt, g.w, g.h, g.c, r.i,
         (g.doc_id * 31 + r.i) % 256 AS v
  FROM g, LATERAL (SELECT unnest(range(0, g.w * g.h * g.c)) AS i) r)
SELECT doc_id, fmt, w::INTEGER AS width, h::INTEGER AS height,
       c::INTEGER AS channels,
       sum(v)::BIGINT AS pix_sum,
       sum((i + 1) * v)::BIGINT AS pix_xsum
FROM px GROUP BY doc_id, fmt, w, h, c
""")
def mm_image_decode_real(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return mm.decode_image(mm.synth_image_media(docs))


@register("mm_tiff_decode_real", sql="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 11 AS w, 3 + doc_id % 6 AS h,
         CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS c
  FROM documents),
px AS (
  SELECT g.doc_id, g.w, g.h, g.c, r.i,
         (g.doc_id * 31 + r.i) % 256 AS v
  FROM g, LATERAL (SELECT unnest(range(0, g.w * g.h * g.c)) AS i) r)
SELECT doc_id, 'tiff' AS fmt, w::INTEGER AS width, h::INTEGER AS height,
       c::INTEGER AS channels,
       sum(v)::BIGINT AS pix_sum,
       sum((i + 1) * v)::BIGINT AS pix_xsum
FROM px GROUP BY doc_id, w, h, c
""")
def mm_tiff_decode_real(spark, sf_dir):
    # Real TIFF 6.0 parse on executors: IFD + strip arrays, both byte
    # orders, none/LZW(MSB-first early-change)/PackBits — the oracle
    # recomputes pixels from the closed-form rule, so a strip or
    # compression bug breaks the position-weighted pix_xsum.
    docs = load(spark, sf_dir, "documents")
    return mm.decode_image(mm.synth_tiff_media(docs))


@register("mm_image_thumb_real", sql=f"""
WITH {_IMG_DIMS_CTE},
t AS (
  SELECT g.doc_id, g.c, r.i,
         ((r.i // (5 * g.c)) * g.h // 4 * g.w
          + ((r.i % (5 * g.c)) // g.c) * g.w // 5) * g.c
          + (r.i % g.c) AS src_i
  FROM g, LATERAL (SELECT unnest(range(0, 5 * 4 * g.c)) AS i) r)
SELECT doc_id, 5 AS tw, 4 AS th,
       sum((doc_id * 31 + src_i) % 256)::BIGINT AS thumb_sum,
       sum((i + 1) * ((doc_id * 31 + src_i) % 256))::BIGINT AS thumb_xsum
FROM t GROUP BY doc_id
""")
def mm_image_thumb_real(spark, sf_dir):
    # Double round-trip: decode real bytes -> nearest-neighbor 5x4 ->
    # re-encode PNG (mixed filters) -> decode AGAIN for the sums. The
    # oracle mirrors only the pixel rule + the resample index mapping.
    docs = load(spark, sf_dir, "documents")
    return mm.image_thumbnails(mm.synth_image_media(docs), tw=5, th=4)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

@register("emb_cosine_topk", sql="""
WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
d AS (
  SELECT uq.vec_id AS qid, uc.vec_id AS cid, sum(uq.v * uc.v) AS dot
  FROM u uq JOIN u uc ON uq.i = uc.i
  WHERE uq.vec_id < 5 AND uc.vec_id <> uq.vec_id
  GROUP BY 1, 2),
s AS (
  SELECT qid, cid, round(dot / nq.nrm / nc.nrm, 6) AS sim
  FROM d JOIN n nq ON nq.vec_id = qid JOIN n nc ON nc.vec_id = cid)
SELECT qid AS query_id, cid AS vec_id, sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, cid) AS rank
  FROM s) WHERE rank <= 5
""", bench=True)
def emb_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = sim.cosine_topk(emb, queries, k=5)
    return out.select("query_id", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("emb_hamming_topk", sql="""
WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
h AS (
  SELECT uq.vec_id AS qid, uc.vec_id AS cid,
         sum(CASE WHEN (uq.v > 0) <> (uc.v > 0)
                  THEN 1 ELSE 0 END)::BIGINT AS ham
  FROM u uq JOIN u uc ON uq.i = uc.i
  WHERE uq.vec_id < 8 AND uc.vec_id <> uq.vec_id
  GROUP BY 1, 2),
cand AS (
  SELECT qid, cid, ham FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY ham, cid) AS rm
    FROM h) WHERE rm <= 48),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
d AS (
  SELECT c.qid, c.cid, c.ham, sum(uq.v * uc.v) AS dot
  FROM cand c
  JOIN u uq ON uq.vec_id = c.qid
  JOIN u uc ON uc.vec_id = c.cid AND uc.i = uq.i
  GROUP BY 1, 2, 3),
s AS (
  SELECT qid, cid, ham, round(dot / nq.nrm / nc.nrm, 6) AS sim
  FROM d JOIN n nq ON nq.vec_id = qid JOIN n nc ON nc.vec_id = cid)
SELECT qid AS query_id, cid AS vec_id, ham, sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, cid) AS rank
  FROM s) WHERE rank <= 5
""")
def emb_hamming_topk(spark, sf_dir):
    # Binary sign-quantization ANN tier (ops/similarity.py
    # hamming_topk): 1 bit/dim words, codegen'd bit_count(xor) Hamming
    # prefilter to 48 candidates/query via the exact two-phase min-k,
    # exact cosine rerank of only the survivors — the 32x-smaller
    # memory tier in front of the float vectors.
    emb = load(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = sim.hamming_topk(emb, queries, k=5, rerank_m=48, dim=64)
    return out.select("query_id", "vec_id", "ham", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("emb_prefix_dim_recall", sql="""
WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
nf AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
np AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u
       WHERE i <= 16 GROUP BY 1),
df_ AS (
  SELECT uq.vec_id AS qid, uc.vec_id AS cid, sum(uq.v * uc.v) AS dot
  FROM u uq JOIN u uc ON uq.i = uc.i
  WHERE uq.vec_id < 8 AND uc.vec_id <> uq.vec_id
  GROUP BY 1, 2),
dp AS (
  SELECT uq.vec_id AS qid, uc.vec_id AS cid, sum(uq.v * uc.v) AS dot
  FROM u uq JOIN u uc ON uq.i = uc.i
  WHERE uq.vec_id < 8 AND uc.vec_id <> uq.vec_id AND uq.i <= 16
  GROUP BY 1, 2),
tf AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (
        PARTITION BY qid
        ORDER BY round(dot / nq.nrm / nc.nrm, 6) DESC, cid) AS rk
    FROM df_ JOIN nf nq ON nq.vec_id = qid
             JOIN nf nc ON nc.vec_id = cid)
  WHERE rk <= 10),
tp AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (
        PARTITION BY qid
        ORDER BY round(dot / nq.nrm / nc.nrm, 6) DESC, cid) AS rk
    FROM dp JOIN np nq ON nq.vec_id = qid
            JOIN np nc ON nc.vec_id = cid)
  WHERE rk <= 10)
SELECT tf.qid AS query_id, count(tp.cid)::BIGINT AS n_overlap,
       round(count(tp.cid) / 10.0, 6) AS recall
FROM tf LEFT JOIN tp ON tf.qid = tp.qid AND tf.cid = tp.cid
GROUP BY tf.qid
""")
def emb_prefix_dim_recall(spark, sf_dir):
    # Matryoshka prefix-dim retrieval audit (ops/similarity.py
    # prefix_dim_recall): rank on the first 16 of 64 dims vs the full
    # vector, overlap@10 per query — the measured answer to "can the
    # ANN tier store a quarter of every vector and re-rank the
    # shortlist with full precision". Both rankings are the numpy-
    # matmul local-top-k shape; overlap is one (query, neighbor)
    # equi-join.
    emb = load(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return sim.prefix_dim_recall(emb, queries, k=10, prefix_dims=16)


@register("emb_norm_stats", sql="""
WITH u AS (
  SELECT vec_id, label, unnest(embedding)::DOUBLE AS v FROM embeddings),
n AS (SELECT vec_id, label, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1, 2)
SELECT label, count(*)::BIGINT AS n_vectors,
       round(avg(nrm), 6) AS avg_norm,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm
FROM n GROUP BY label
""")
def emb_stats(spark, sf_dir):
    return sim.embedding_norm_stats(load(spark, sf_dir, "embeddings"))


# Approximate by construction, but the approximation (the md5-derived
# hyperplane bucketing) is itself deterministic and SQL-expressible, so
# the oracle re-derives planes → signatures → candidate set → exact
# verify and the hash-compare pins the whole ANN pipeline:
@register("emb_ann_lsh_topk", sql=_ANN_TOPK_SQL, bench=True)
def emb_ann(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = sim.ann_lsh_topk(emb, queries, k=5, dim=64)
    return out.select("query_id", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


# --------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (exact, oracle-matched)
# --------------------------------------------------------------------------

@register("emb_cosine_neardup_pairs", sql="""
WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
d AS (
  SELECT ua.vec_id AS a_id, ub.vec_id AS b_id, sum(ua.v * ub.v) AS dot
  FROM u ua JOIN u ub ON ua.i = ub.i AND ua.vec_id < ub.vec_id
  GROUP BY 1, 2)
SELECT a_id, b_id, round(dot / na.nrm / nb.nrm, 6) AS sim
FROM d JOIN n na ON na.vec_id = a_id JOIN n nb ON nb.vec_id = b_id
WHERE round(dot / na.nrm / nb.nrm, 6) >= 0.45
""")
def emb_neardup(spark, sf_dir):
    # Synthetic embeddings have no true near-dups (max pair cos ≈ 0.6),
    # so the demo threshold is 0.45; a real corpus would use ~0.95.
    return sim.cosine_neardup_pairs(load(spark, sf_dir, "embeddings"),
                                    threshold=0.45)


# LSH recall path for the same operator — oracle re-derives the bucket
# collisions then exact-verifies, identical to cosine_neardup_pairs_lsh:
@register("emb_cosine_neardup_lsh", sql="WITH " + _LSH_SIGS + """,
capped AS (
  SELECT tbl, sig, vec_id FROM (
    SELECT tbl, sig, vec_id,
           row_number() OVER (PARTITION BY tbl, sig
                              ORDER BY vec_id) AS rk
    FROM sigs) WHERE rk <= 1024),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM capped a JOIN capped b USING (tbl, sig)
  WHERE a.vec_id < b.vec_id),
d AS (
  SELECT c.a_id, c.b_id, sum(ua.v * ub.v) AS dot
  FROM cand c
  JOIN u ua ON ua.vec_id = c.a_id
  JOIN u ub ON ub.vec_id = c.b_id AND ub.i = ua.i
  GROUP BY 1, 2)
SELECT a_id, b_id, round(dot / na.nrm / nb.nrm, 6) AS sim
FROM d JOIN n na ON na.vec_id = a_id JOIN n nb ON nb.vec_id = b_id
WHERE round(dot / na.nrm / nb.nrm, 6) >= 0.45
""")
def emb_neardup_lsh(spark, sf_dir):
    return sim.cosine_neardup_pairs_lsh(load(spark, sf_dir, "embeddings"),
                                        threshold=0.45)


# --------------------------------------------------------------------------
# Materialized ANN index: bucket-partitioned Delta table, pruned probes
# --------------------------------------------------------------------------

_ANN_INDEX_BUILT: set = set()


def _ann_index_path(spark, sf_dir: str) -> str:
    import hashlib
    import tempfile
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/connectors_spark_ann_index_{tag}"
    if path not in _ANN_INDEX_BUILT:
        _bounded_index_fixture(spark, path)
        sim.build_ann_index(load(spark, sf_dir, "embeddings"), path, dim=64)
        _ANN_INDEX_BUILT.add(path)
    return path


# Same results as emb_ann_lsh_topk (same planes, same tie-break) but
# served from the bucket-partitioned index via partition-pruned scans —
# so it shares _ANN_TOPK_SQL as its oracle. Not benched: the first call
# pays the one-time index build, which would dominate the probe time.
@register("emb_ann_indexed_topk", sql=_ANN_TOPK_SQL)
def emb_ann_indexed(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = sim.ann_query_indexed(spark, _ann_index_path(spark, sf_dir),
                                queries, k=5, dim=64)
    return out.select("query_id", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


# --------------------------------------------------------------------------
# IVF ANN: single-copy list-partitioned index, nprobe pruned probes
# --------------------------------------------------------------------------

_IVF_INDEX: dict = {}


def _ivf_index(spark, sf_dir: str):
    import hashlib
    import tempfile
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/connectors_spark_ivf_index_{tag}"
    if path not in _IVF_INDEX:
        _bounded_index_fixture(spark, path)
        cents = sim.build_ivf_index(load(spark, sf_dir, "embeddings"),
                                    path, nlist=16)
        _IVF_INDEX[path] = cents
    return path, _IVF_INDEX[path]


# Approximate by construction, but deterministic end-to-end: the coarse
# quantizer is the 16 corpus vectors with the smallest md5-derived
# hash64(vec_id) (ops/similarity._ivf_centroids), assignment is argmax
# cosine with ties to the lowest list id, probes are each query's top-6
# lists — all re-derivable in SQL. Cosine ordering is invariant under
# the query/corpus-vector normalization numpy applies, so the oracle
# ranks by raw dot against normalized centroids. Not benched: first
# call pays the one-time index build.
@register("emb_ann_ivf_topk", sql="""
WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
cent_sel AS (
  SELECT vec_id AS cvid,
         row_number() OVER (
           ORDER BY ('0x' || substring(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
                    vec_id) - 1 AS list_id
  FROM embeddings),
cents AS (SELECT cvid, list_id FROM cent_sel WHERE list_id < 16),
cw AS (
  SELECT c.list_id, u.i,
         u.v / (CASE WHEN n.nrm = 0 THEN 1.0 ELSE n.nrm END) AS w
  FROM cents c JOIN u ON u.vec_id = c.cvid JOIN n ON n.vec_id = c.cvid),
adot AS (
  SELECT u.vec_id, cw.list_id, sum(u.v * cw.w) AS d
  FROM u JOIN cw USING (i) GROUP BY 1, 2),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d DESC, list_id) AS rn
    FROM adot) WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS qid, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d DESC, list_id) AS rn
    FROM adot WHERE vec_id < 5) WHERE rn <= 6),
cand AS (
  SELECT DISTINCT q.qid, a.vec_id AS cid
  FROM qprobe q JOIN assign a USING (list_id)
  WHERE a.vec_id <> q.qid),
d AS (
  SELECT c.qid, c.cid, sum(uq.v * uc.v) AS dot
  FROM cand c
  JOIN u uq ON uq.vec_id = c.qid
  JOIN u uc ON uc.vec_id = c.cid AND uc.i = uq.i
  GROUP BY 1, 2),
s AS (
  SELECT qid, cid, round(dot / nq.nrm / nc.nrm, 6) AS sim
  FROM d JOIN n nq ON nq.vec_id = qid JOIN n nc ON nc.vec_id = cid)
SELECT qid AS query_id, cid AS vec_id, sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, cid) AS rank
  FROM s) WHERE rank <= 5
""")
def emb_ann_ivf(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    path, cents = _ivf_index(spark, sf_dir)
    out = sim.ivf_query_indexed(spark, path, queries, cents,
                                k=5, nprobe=6)
    return out.select("query_id", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


# --------------------------------------------------------------------------
# BPE-style regex token stats (pre-tokenizer accounting per source)
# --------------------------------------------------------------------------

@register("doc_bpe_token_stats", sql=r"""
WITH t AS (
  SELECT source, doc_id,
         unnest(regexp_extract_all(lower(text),
                                   '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS tok
  FROM documents),
per_src AS (
  SELECT source, count(*)::BIGINT AS n_tokens,
         count(DISTINCT tok)::BIGINT AS n_distinct
  FROM t GROUP BY 1),
docs_per AS (SELECT source, count(*)::BIGINT AS n_docs
             FROM documents GROUP BY 1)
SELECT source, n_docs, n_tokens, n_distinct,
       round(n_tokens::DOUBLE / n_docs, 4) AS avg_tokens_per_doc
FROM per_src JOIN docs_per USING (source)
""")
def doc_bpe(spark, sf_dir):
    from ..functions.text import regex_tokens
    docs = load(spark, sf_dir, "documents")
    t = (docs.select("source",
                     F.explode_outer(regex_tokens("text")).alias("tok"))
         .where(F.col("tok").isNotNull()))
    per_src = (t.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.countDistinct("tok").alias("n_distinct")))
    dper = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (per_src.join(dper, "source")
            .select("source", "n_docs", "n_tokens", "n_distinct",
                    F.round(F.col("n_tokens").cast("double") /
                            F.col("n_docs"), 4).alias("avg_tokens_per_doc")))


# --------------------------------------------------------------------------
# Near-dup clusters: connected components over MinHash pairs, keep-best
# --------------------------------------------------------------------------

_CC_CTES = _MINHASH_CTES + """,
pairs AS (
  SELECT a_id, b_id FROM ver WHERE c::DOUBLE / (za + zb - c) >= 0.8),
sym AS (SELECT a_id AS a, b_id AS b FROM pairs
        UNION SELECT b_id, a_id FROM pairs),
reach(n, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.n),
comp AS (SELECT n AS doc_id, min(r) AS component FROM reach GROUP BY n)"""


@register("doc_neardup_components", sql=f"""
WITH RECURSIVE {_CC_CTES}
SELECT doc_id, component FROM comp
""")
def doc_components(spark, sf_dir):
    # Distributed min-label propagation (ops.graph) vs the oracle's
    # recursive-CTE transitive closure: both canonicalize a cluster to
    # its smallest doc id.
    from ..ops.graph import connected_components
    edges = dd.minhash_lsh_pairs(load(spark, sf_dir, "documents"),
                                 threshold=0.8)
    return (connected_components(edges)
            .select(F.col("node").alias("doc_id"), "component"))


@register("doc_fuzzy_er_clusters", sql="""
WITH RECURSIVE
d AS (SELECT doc_id, substr(text, 1, 64) AS pre, n_chars
      FROM documents),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE levenshtein(a.pre, b.pre) <= 8),
sym AS (SELECT a_id AS a, b_id AS b FROM pairs
        UNION SELECT b_id, a_id FROM pairs),
reach(n, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.n),
comp AS (SELECT n AS doc_id, min(r) AS component FROM reach GROUP BY n),
sized AS (
  SELECT comp.component, comp.doc_id, d.n_chars
  FROM comp JOIN d USING (doc_id)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY component
                               ORDER BY n_chars DESC, doc_id) AS rn
  FROM sized)
SELECT component, doc_id AS canonical_doc,
       n_chars::BIGINT AS canonical_chars,
       (SELECT count(*) FROM sized s2
        WHERE s2.component = ranked.component)::BIGINT AS n_members
FROM ranked WHERE rn = 1
""")
def doc_fuzzy_er(spark, sf_dir):
    """End-to-end entity resolution: fuzzy edit-distance blocking
    (ops/fuzzy.py, index-bounded candidates) → connected components →
    one canonical record per cluster (longest text, tie → lowest id)
    with the member count. The composition the fuzzy join exists for;
    every stage is the scale-shaped operator already gated on its
    own."""
    from pyspark.sql import Window

    from ..ops.fuzzy import edit_distance_pairs
    from ..ops.graph import connected_components
    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.substring("text", 1, 64).alias("pre"),
                    "n_chars")
    edges = edit_distance_pairs(d, k=8, id_col="doc_id", str_col="pre",
                                max_gram_freq=1000)
    comp = (connected_components(edges.select("a_id", "b_id"))
            .select(F.col("node").alias("doc_id"), "component"))
    sized = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    members = sized.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"))
    return (sized.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .join(members, "component")
            .select("component", F.col("doc_id").alias("canonical_doc"),
                    F.col("n_chars").cast("long")
                    .alias("canonical_chars"), "n_members"))


@register("doc_dedup_keep_best", sql=f"""
WITH RECURSIVE {_CC_CTES},
sized AS (
  SELECT comp.component, comp.doc_id,
         len(list_filter(string_split(d.text, ' '), x -> x <> ''))
             AS n_toks
  FROM comp JOIN documents d USING (doc_id)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY component
                               ORDER BY n_toks DESC, doc_id) AS rn
  FROM sized)
SELECT component, doc_id AS kept_doc, n_toks::INTEGER AS kept_toks,
       (SELECT count(*) FROM sized s2
        WHERE s2.component = ranked.component)::BIGINT AS n_members
FROM ranked WHERE rn = 1
""")
def doc_keep_best(spark, sf_dir):
    # Cluster-aware dedup: within each near-dup component keep the doc
    # with the most tokens (tie -> lowest id). One window over the
    # (tiny) component relation; the corpus-sized work stays in the LSH
    # candidate generation.
    from pyspark.sql import Window
    from ..ops.graph import connected_components
    docs = load(spark, sf_dir, "documents")
    edges = dd.minhash_lsh_pairs(docs, threshold=0.8)
    comp = (connected_components(edges)
            .select(F.col("node").alias("doc_id"), "component"))
    sized = (comp.join(docs.select("doc_id",
                                   token_count("text").alias("n_toks")),
                       "doc_id"))
    w = Window.partitionBy("component").orderBy(F.desc("n_toks"),
                                                F.asc("doc_id"))
    wc = Window.partitionBy("component")
    return (sized.withColumn("n_members", F.count(F.lit(1)).over(wc))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("component", F.col("doc_id").alias("kept_doc"),
                    F.col("n_toks").alias("kept_toks"),
                    F.col("n_members").cast("long").alias("n_members")))


# --------------------------------------------------------------------------
# End-to-end corpus curation: exact dedup -> near-dup keep-best -> quality
# --------------------------------------------------------------------------

# The near-dup stage must run on the EXACT-dedup survivors, so the CTE
# chain is rebuilt from the `e` relation rather than raw documents.
_CURATE_CTES = r"""
fp AS (
  SELECT doc_id, source,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks,
         CASE WHEN length(lower(text)) > 0
              THEN length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::DOUBLE
                   / length(lower(text)) ELSE 0.0 END AS pr
  FROM documents),
e AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
    FROM fp) WHERE rn = 1),
esh AS (
  SELECT e.doc_id,
         CASE WHEN len(t.t) >= 3
              THEN list_distinct([t.t[i] || ' ' || t.t[i+1] || ' ' || t.t[i+2]
                                  for i in range(1, len(t.t) - 1)])
              ELSE [] END AS s
  FROM e JOIN (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '') AS t
               FROM documents) t USING (doc_id)),
eex AS (SELECT doc_id, unnest(s) AS g FROM esh),
eh AS (SELECT doc_id,
              ('0x' || substring(md5(g), 1, 15))::BIGINT % 4294967311 AS hv
       FROM eex),
esig AS (
  SELECT doc_id, i, min((a * hv + b) % 4294967311) AS m
  FROM eh CROSS JOIN perms GROUP BY 1, 2),
ebnd AS (
  SELECT doc_id, i // 4 AS band,
         md5(string_agg(m::VARCHAR, ',' ORDER BY i)) AS key
  FROM esig GROUP BY doc_id, i // 4),
ecand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM ebnd a JOIN ebnd b ON a.band = b.band AND a.key = b.key
                          AND a.doc_id < b.doc_id),
ever AS (
  SELECT a_id, b_id, len(list_intersect(sa.s, sb.s))::BIGINT AS c,
         len(sa.s) AS za, len(sb.s) AS zb
  FROM ecand JOIN esh sa ON sa.doc_id = a_id
             JOIN esh sb ON sb.doc_id = b_id),
pairs AS (
  SELECT a_id, b_id FROM ever WHERE c::DOUBLE / (za + zb - c) >= 0.8),
sym AS (SELECT a_id AS a, b_id AS b FROM pairs
        UNION SELECT b_id, a_id FROM pairs),
reach(n, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.n),
comp AS (SELECT n AS doc_id, min(r) AS component FROM reach GROUP BY n),
nd AS (
  SELECT e.*, coalesce(comp.component, e.doc_id) AS component
  FROM e LEFT JOIN comp USING (doc_id)),
kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY component
                                 ORDER BY n_toks DESC, doc_id) AS krn
    FROM nd) WHERE krn = 1),
final AS (SELECT * FROM kept WHERE n_toks >= 5 AND pr <= 0.35)
"""


@register("doc_curate_corpus", sql=f"""
WITH RECURSIVE perms(i, a, b) AS (VALUES {_perm_values()}),
{_CURATE_CTES}
SELECT d.source,
       count(*)::BIGINT AS n_input,
       count(*) FILTER (WHERE e.doc_id IS NOT NULL)::BIGINT AS n_exact_kept,
       count(*) FILTER (WHERE k.doc_id IS NOT NULL)::BIGINT AS n_neardup_kept,
       count(*) FILTER (WHERE f.doc_id IS NOT NULL)::BIGINT AS n_final
FROM documents d
LEFT JOIN e ON e.doc_id = d.doc_id
LEFT JOIN kept k ON k.doc_id = d.doc_id
LEFT JOIN final f ON f.doc_id = d.doc_id
GROUP BY 1
""")
def doc_curate(spark, sf_dir):
    # The full training-data curation funnel as ONE lazy plan:
    # exact-dup removal (fingerprint window), near-dup clusters on the
    # survivors (MinHash LSH -> connected components -> keep the
    # longest doc), then quality gates. Per-source survival counts at
    # each stage. Corpus-sized shuffles: fingerprint window, shingle
    # explode, pair groupBy — all hash-keyed and skew-free.
    from pyspark.sql import Window
    from ..functions.text import fingerprint, punct_ratio
    from ..ops.graph import connected_components
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", "text",
        fingerprint("text").alias("f"),
        token_count("text").alias("n_toks"),
        punct_ratio("text").alias("pr"))
    we = Window.partitionBy("f").orderBy("doc_id")
    e = (base.withColumn("rn", F.row_number().over(we))
         .filter(F.col("rn") == 1).drop("rn"))
    e = e.persist()
    edges = dd.minhash_lsh_pairs(e.select("doc_id", "text"), threshold=0.8)
    comp = (connected_components(edges)
            .select(F.col("node").alias("doc_id"), "component"))
    nd = (e.join(comp, "doc_id", "left")
          .withColumn("component",
                      F.coalesce("component", "doc_id")))
    wk = Window.partitionBy("component").orderBy(F.desc("n_toks"),
                                                 F.asc("doc_id"))
    kept = (nd.withColumn("krn", F.row_number().over(wk))
            .filter(F.col("krn") == 1))
    final = kept.filter((F.col("n_toks") >= 5) & (F.col("pr") <= 0.35))
    flags = (docs.select("doc_id", "source")
             .join(e.select("doc_id", F.lit(1).alias("_e")), "doc_id", "left")
             .join(kept.select("doc_id", F.lit(1).alias("_k")),
                   "doc_id", "left")
             .join(final.select("doc_id", F.lit(1).alias("_f")),
                   "doc_id", "left"))
    return (flags.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_input"),
                 F.count("_e").alias("n_exact_kept"),
                 F.count("_k").alias("n_neardup_kept"),
                 F.count("_f").alias("n_final")))


# --------------------------------------------------------------------------
# Multimodal resize: binary-out mapInPandas, content pinned via md5
# --------------------------------------------------------------------------

@register("mm_resize_thumbs", sql="""
SELECT doc_id, 32 AS width, 32 AS height,
       md5(rpad(left(text, 1024), 1024, chr(0))) AS thumb_md5
FROM documents
""")
def mm_resize(spark, sf_dir):
    # fake_resize is the 1-in-1-out Arrow contract a real thumbnailer
    # drops into; hashing the binary output pins the exact byte
    # transform (prefix + zero padding), not just row shape. The
    # documents corpus is pure ASCII so the oracle's string rpad hashes
    # the identical bytes.
    docs = load(spark, sf_dir, "documents")
    thumbs = mm.fake_resize(mm.attach_fake_media(docs))
    return thumbs.select("doc_id",
                         F.col("width").cast("int").alias("width"),
                         F.col("height").cast("int").alias("height"),
                         F.md5("thumb").alias("thumb_md5"))


# --------------------------------------------------------------------------
# Deterministic train/val/test split accounting
# --------------------------------------------------------------------------

@register("doc_hash_split_counts", sql=f"""
WITH s AS (
  SELECT source,
         CASE WHEN {_H64.format(v='doc_id::VARCHAR')} % 100 < 80
              THEN 'train'
              WHEN {_H64.format(v='doc_id::VARCHAR')} % 100 < 90
              THEN 'val' ELSE 'test' END AS split
  FROM documents)
SELECT source, split, count(*)::BIGINT AS n
FROM s GROUP BY 1, 2
""")
def doc_split(spark, sf_dir):
    # Reproducible splits: assignment is a pure function of the id, so
    # growing or repartitioning the corpus never reshuffles existing
    # rows between train and test (randomSplit cannot guarantee that).
    from ..functions.text import hash_split
    docs = load(spark, sf_dir, "documents")
    return (docs.select("source", hash_split("doc_id").alias("split"))
            .groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n")))


# --------------------------------------------------------------------------
# Int8 embedding quantization: 4x storage cut, bounded reconstruction err
# --------------------------------------------------------------------------

@register("emb_quantize_i8_error", sql="""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings),
s AS (
  SELECT vec_id, label, e,
         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
  FROM v),
err AS (
  SELECT label,
         list_max(list_transform(e,
             x -> abs(round(x / scale) * scale - x))) / scale AS nerr
  FROM s)
SELECT label, count(*)::BIGINT AS n_vectors,
       round(max(nerr), 6) AS max_norm_err,
       round(avg(nerr), 6) AS avg_norm_err
FROM err GROUP BY 1
""")
def emb_quant(spark, sf_dir):
    # Quantized codes are 64 bytes/vector instead of 256 — the storage
    # path for a 100 TB ANN corpus (IVF/LSH candidate verify happily
    # runs on dequantized values; exact re-rank reads the fp32 column
    # for finalists only). The oracle reproduces the identical codes,
    # pinning quantization arithmetic, and the normalized error is
    # bounded by 0.5 by construction.
    from ..functions.vectors import dequantize_error_i8
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("label", dequantize_error_i8("embedding").alias("nerr"))
    return (e.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.round(F.max("nerr"), 6).alias("max_norm_err"),
                 F.round(F.avg("nerr"), 6).alias("avg_norm_err")))


# --------------------------------------------------------------------------
# Deterministic weighted priority sample (Duffield et al., JACM 2007)
# --------------------------------------------------------------------------

@register("doc_priority_sample", sql=f"""
WITH w AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::DOUBLE
             AS wt
  FROM documents),
p AS (
  SELECT doc_id, source, wt,
         wt / (({_H64.format(v='doc_id::VARCHAR')} + 1)
               / 1152921504606846976.0) AS prio
  FROM w),
r AS (
  SELECT *, row_number() OVER (ORDER BY prio DESC, doc_id) AS rn FROM p)
SELECT source, count(*)::BIGINT AS n_sampled,
       round(sum(wt), 2) AS sampled_weight
FROM r WHERE rn <= 200 GROUP BY 1
""")
def doc_priority_sample(spark, sf_dir):
    # Token count as the sampling weight: long documents are
    # proportionally more likely to survive, and the selected SET is a
    # pure function of (ids, weights, k) — rerunning curation yields
    # byte-identical corpora.
    from ..ops.sampling import priority_sample
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", "source",
                    token_count("text").cast("double").alias("wt"))
    s = priority_sample(w, 200, "wt", "doc_id")
    return (s.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_sampled"),
                 F.round(F.sum("wt"), 2).alias("sampled_weight")))


# --------------------------------------------------------------------------
# Gopher repetition filters (ops/quality.py)
# --------------------------------------------------------------------------

@register("doc_repetition_stats", sql=f"""
WITH {_TOKS},
g2 AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS g
  FROM toks, unnest(range(1, len(t))) AS u(i)),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
s2 AS (SELECT doc_id,
              round(max(c)::DOUBLE / sum(c), 6) AS top2_frac,
              round(coalesce(sum(c) FILTER (WHERE c > 1), 0)::DOUBLE
                    / sum(c), 6) AS dup2_frac
       FROM c2 GROUP BY 1),
g3 AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
s3 AS (SELECT doc_id,
              round(max(c)::DOUBLE / sum(c), 6) AS top3_frac,
              round(coalesce(sum(c) FILTER (WHERE c > 1), 0)::DOUBLE
                    / sum(c), 6) AS dup3_frac
       FROM c3 GROUP BY 1)
SELECT b.doc_id, len(b.t)::INTEGER AS n_tok,
       coalesce(s2.top2_frac, 0.0) AS top2_frac,
       coalesce(s2.dup2_frac, 0.0) AS dup2_frac,
       coalesce(s3.top3_frac, 0.0) AS top3_frac,
       coalesce(s3.dup3_frac, 0.0) AS dup3_frac,
       (len(b.t) >= 5 AND coalesce(s2.top2_frac, 0.0) < 0.20
        AND coalesce(s3.top3_frac, 0.0) < 0.18
        AND coalesce(s2.dup2_frac, 0.0) < 0.60
        AND coalesce(s3.dup3_frac, 0.0) < 0.50) AS keep
FROM toks b LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
""")
def doc_repetition(spark, sf_dir):
    # Gopher §A1.1 repetition removal: fraction of n-grams in the most
    # frequent n-gram + fraction in duplicated n-grams, n ∈ {2,3};
    # `keep` applies the published caps. One explode + two keyed
    # aggregations per n, no joins against the corpus.
    from ..ops.quality import gopher_filter
    return gopher_filter(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Benchmark decontamination (ops/dedup.py contamination_report)
# --------------------------------------------------------------------------

@register("doc_decontaminate", sql=f"""
WITH {_TOKS},
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(t) >= 3
              THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  for i in range(1, len(t) - 1)])
              ELSE [] END AS s
  FROM toks),
tg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE source <> 'src0'),
eg AS (SELECT doc_id AS eval_id, unnest(s) AS g FROM sh
       WHERE source = 'src0')
SELECT tg.doc_id, count(DISTINCT tg.g) AS n_shared_ngrams,
       count(DISTINCT eg.eval_id) AS n_eval_docs
FROM tg JOIN eg ON tg.g = eg.g
GROUP BY 1
""")
def doc_decontaminate(spark, sf_dir):
    # GPT-3-style decontamination: train docs (source<>'src0') sharing
    # any distinct 3-gram with the held-out eval slice (source='src0').
    # The eval gram relation is broadcast; the corpus shuffles nothing.
    from ..ops.dedup import contamination_report
    docs = load(spark, sf_dir, "documents")
    return contamination_report(docs.filter(F.col("source") != "src0"),
                                docs.filter(F.col("source") == "src0"),
                                n=3)


# --------------------------------------------------------------------------
# Sequence packing (ops/packing.py)
# --------------------------------------------------------------------------

@register("doc_pack_sequences", sql=f"""
WITH {_TOKS},
pos AS (
  SELECT doc_id, len(t) AS n_tok,
         coalesce(sum(len(t)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS tok_start
  FROM toks),
packed AS (
  SELECT doc_id, n_tok, tok_start, tok_start // 256 AS seq_id,
         CASE WHEN n_tok > 0
              THEN (tok_start + n_tok - 1) // 256 <> tok_start // 256
              ELSE FALSE END AS crossing
  FROM pos)
SELECT seq_id::BIGINT AS seq_id, count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS n_tokens_started,
       sum(CASE WHEN crossing THEN 1 ELSE 0 END)::BIGINT AS n_crossing
FROM packed GROUP BY 1
""")
def doc_pack(spark, sf_dir):
    # Concat-and-chunk packing into 256-token context windows. The
    # Spark side computes the identical global prefix sum with the
    # two-pass block-offset scheme (integer sums are associative, so it
    # is bit-equal to the oracle's single ORDER BY window).
    from ..ops.packing import packing_summary
    return packing_summary(load(spark, sf_dir, "documents"), ctx=256)


@register("doc_dup_spans", sql=f"""
WITH {_TOKS},
g AS (
  SELECT doc_id, len(t) AS n_tok, i - 1 AS pos,
         array_to_string(t[i : i + 9], ' ') AS gram
  FROM toks, unnest(range(1, len(t) - 10 + 2)) AS u(i)
  WHERE len(t) >= 10),
c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
d AS (SELECT g.* FROM g JOIN c USING (gram)),
s AS (
  SELECT doc_id, n_tok, pos,
         least(10, coalesce(lead(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) - pos, 10)) AS c
  FROM d)
SELECT doc_id, max(n_tok)::INTEGER AS n_tok,
       count(*)::BIGINT AS n_dup_grams,
       sum(c)::BIGINT AS covered_tokens,
       round(sum(c) / max(n_tok), 6) AS dup_frac
FROM s GROUP BY doc_id
""")
def doc_dup_spans(spark, sf_dir):
    # Lee et al. 2021 exact-substring dedup signal at 10-token windows:
    # per-doc fraction of tokens covered by corpus-duplicated windows,
    # via an interval-union sweep (one row per duplicated window, never
    # per-token rows).
    from ..ops.quality import dup_span_stats
    return dup_span_stats(load(spark, sf_dir, "documents"), L=10)


@register("doc_strip_dup_spans", sql=f"""
WITH {_TOKS},
g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(t[i : i + 9], ' ') AS gram
  FROM toks, unnest(range(1, len(t) - 10 + 2)) AS u(i)
  WHERE len(t) >= 10),
c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
cov AS (
  SELECT DISTINCT g.doc_id, g.pos + x.i AS tpos
  FROM g JOIN c USING (gram), unnest(range(0, 10)) AS x(i)),
tk AS (SELECT doc_id, i - 1 AS tpos, t[i] AS tok
       FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
kept AS (
  SELECT tk.* FROM tk ANTI JOIN cov
  ON tk.doc_id = cov.doc_id AND tk.tpos = cov.tpos)
SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY tpos)) AS h
FROM kept GROUP BY doc_id
HAVING length(string_agg(tok, ' ' ORDER BY tpos)) > 0
""")
def doc_strip_dup(spark, sf_dir):
    # The Lee et al. dedup transform: corpus-duplicated 10-token spans
    # removed, survivors reassembled in order; md5 pins the rebuilt
    # text exactly (same gate shape as doc_boilerplate_removal).
    from ..ops.quality import strip_dup_spans
    out = strip_dup_spans(load(spark, sf_dir, "documents"), L=10)
    return out.select("doc_id", F.md5("text").alias("h"))


@register("doc_mixture_weights", sql="""
WITH c AS (
  SELECT source AS "group", count(*)::BIGINT AS n_docs
  FROM documents GROUP BY 1),
t AS (SELECT sum(pow(n_docs, 0.5)) AS z FROM c)
SELECT "group", n_docs,
       round(pow(n_docs, 0.5) / t.z, 6) AS weight,
       round(pow(n_docs, 0.5) / t.z * 1000.0, 6) AS expected_docs
FROM c, t
""")
def doc_mixture(spark, sf_dir):
    # Temperature-based source rebalancing (alpha=0.5): the standard
    # multilingual-mix computation. Normalizer is a window over one row
    # per source, never over data rows.
    from ..ops.sampling import mixture_weights
    return mixture_weights(load(spark, sf_dir, "documents"),
                           group_col="source", alpha=0.5, budget=1000)


@register("doc_token_entropy", sql=f"""
WITH {_TOKS},
uni AS (SELECT doc_id, unnest(t) AS w FROM toks),
cnt AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM uni GROUP BY 1, 2)
SELECT doc_id, sum(c)::BIGINT AS n_tok,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy
FROM cnt GROUP BY 1
""")
def doc_entropy(spark, sf_dir):
    # Lexical-diversity quality signal: Shannon entropy of each doc's
    # token distribution — H = log2(n) − (Σ c·log2 c)/n over integer
    # counts, identical op order in both engines.
    from ..ops.quality import token_entropy
    return token_entropy(load(spark, sf_dir, "documents"))


@register("doc_pmi_bigrams", sql=f"""
WITH {_TOKS},
uni AS (SELECT unnest(t) AS w FROM toks),
ucnt AS (SELECT w, count(*)::BIGINT AS c FROM uni GROUP BY 1),
utot AS (SELECT sum(c)::BIGINT AS tot FROM ucnt),
bl AS (SELECT CASE WHEN len(t) >= 2
                   THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
                   ELSE [] END AS bs
       FROM toks),
bic AS (SELECT unnest(bs) AS bigram FROM bl),
bcnt AS (SELECT bigram, count(*)::BIGINT AS n FROM bic GROUP BY 1),
btot AS (SELECT sum(n)::BIGINT AS tot FROM bcnt)
SELECT b.bigram, b.n,
       round(ln((b.n / bt.tot) /
                ((ca.c / ut.tot) * (cb.c / ut.tot))), 6) AS pmi
FROM bcnt b, btot bt, utot ut, ucnt ca, ucnt cb
WHERE ca.w = string_split(b.bigram, ' ')[1]
  AND cb.w = string_split(b.bigram, ' ')[2]
  AND b.n >= 5
ORDER BY pmi DESC, b.bigram
LIMIT 50
""")
def doc_pmi(spark, sf_dir):
    # Corpus phrase mining: top-50 bigram collocations by PMI with a
    # min-count-5 floor (Church & Hanks 1990). Both count relations are
    # vocabulary-bounded; the unigram side broadcasts.
    from ..ops.quality import pmi_bigrams
    return pmi_bigrams(load(spark, sf_dir, "documents"),
                       min_count=5, top=50)


@register("doc_chunk_windows", sql=f"""
WITH {_TOKS},
nz AS (SELECT doc_id, t, len(t) AS z FROM toks WHERE len(t) > 0),
idx AS (
  SELECT doc_id, t, z,
         unnest(range(0, CASE WHEN z > 32
                              THEN (z - 32 + 24 - 1) // 24 + 1
                              ELSE 1 END)) AS chunk_idx
  FROM nz)
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       array_to_string(t[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')
           AS chunk_text,
       least(32, z - chunk_idx * 24)::BIGINT AS n_tokens
FROM idx
""")
def doc_chunks(spark, sf_dir):
    # Sliding 32-token windows, stride 24 (8-token overlap) — RAG /
    # context-window chunking. Map-side only; partitions like the scan.
    from ..ops.packing import chunk_token_windows
    return chunk_token_windows(load(spark, sf_dir, "documents"),
                               window=32, stride=24)


# --------------------------------------------------------------------------
# K-means clustering on embeddings (ops/clustering.py)
# --------------------------------------------------------------------------

# Two unrolled Lloyd iterations (k=8, deterministic lowest-id init),
# ending in `asg` = (vec_id, cl, d): final cluster + rounded distance.
# Shared by the kmeans and semdedup oracles.
_KMEANS_CTES = """
u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
c0 AS (SELECT ids.cl, u.i, u.v AS c FROM ids JOIN u USING (vec_id)),
d0 AS (
  SELECT u.vec_id, c.cl,
         round(sum((u.v - c.c) * (u.v - c.c)), 6) AS d
  FROM u JOIN c0 c ON u.i = c.i GROUP BY 1, 2),
a0 AS (
  SELECT vec_id, cl FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d, cl) AS rn FROM d0)
  WHERE rn = 1),
m1 AS (SELECT a0.cl, u.i, round(avg(u.v), 6) AS c
       FROM a0 JOIN u USING (vec_id) GROUP BY 1, 2),
c1 AS (SELECT c0.cl, c0.i, coalesce(m1.c, c0.c) AS c
       FROM c0 LEFT JOIN m1 ON c0.cl = m1.cl AND c0.i = m1.i),
d1 AS (
  SELECT u.vec_id, c.cl,
         round(sum((u.v - c.c) * (u.v - c.c)), 6) AS d
  FROM u JOIN c1 c ON u.i = c.i GROUP BY 1, 2),
a1 AS (
  SELECT vec_id, cl FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d, cl) AS rn FROM d1)
  WHERE rn = 1),
m2 AS (SELECT a1.cl, u.i, round(avg(u.v), 6) AS c
       FROM a1 JOIN u USING (vec_id) GROUP BY 1, 2),
c2 AS (SELECT c1.cl, c1.i, coalesce(m2.c, c1.c) AS c
       FROM c1 LEFT JOIN m2 ON c1.cl = m2.cl AND c1.i = m2.i),
d2 AS (
  SELECT u.vec_id, c.cl,
         round(sum((u.v - c.c) * (u.v - c.c)), 6) AS d
  FROM u JOIN c2 c ON u.i = c.i GROUP BY 1, 2),
asg AS (
  SELECT vec_id, cl, d FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d, cl) AS rn FROM d2)
  WHERE rn = 1)
"""


@register("emb_kmeans_clusters", sql=f"""
WITH {_KMEANS_CTES}
SELECT vec_id, cl::INT AS cluster, d AS dist FROM asg
""")
def emb_kmeans(spark, sf_dir):
    # Two distributed Lloyd iterations, k=8, deterministic init (the 8
    # lowest-id vectors); per-vector final assignment + rounded squared
    # distance. The oracle unrolls both iterations in SQL.
    from ..ops.clustering import kmeans_fit
    emb = load(spark, sf_dir, "embeddings").cache()
    _, assigned = kmeans_fit(emb, k=8, iters=2)
    return assigned.select("vec_id", "cluster", "dist")


# --------------------------------------------------------------------------
# SemDeDup (ops/clustering.py semdedup)
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# Product quantization (ops/clustering.py pq_codes)
# --------------------------------------------------------------------------

def _pq_subspace_cte(j: int, lo: int, hi: int) -> str:
    """One subspace's unrolled deterministic k-means (1 Lloyd iteration
    + final labeling), mirroring kmeans_fit(iters=1) on the sliced
    subvector: init from the 8 lowest-id vectors, round-6 distances and
    centroid means, argmin ties to the lowest code, empty clusters keep
    their previous centroid."""
    return f"""
u{j} AS (SELECT vec_id, i, v FROM u WHERE i BETWEEN {lo} AND {hi}),
c0_{j} AS (SELECT ids.cl, u.i, u.v AS c FROM ids JOIN u{j} u USING (vec_id)),
d0_{j} AS (
  SELECT u.vec_id, c.cl, round(sum((u.v - c.c) * (u.v - c.c)), 6) AS d
  FROM u{j} u JOIN c0_{j} c ON u.i = c.i GROUP BY 1, 2),
a0_{j} AS (
  SELECT vec_id, cl FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
    FROM d0_{j}) WHERE rn = 1),
m1_{j} AS (SELECT a.cl, u.i, round(avg(u.v), 6) AS c
           FROM a0_{j} a JOIN u{j} u USING (vec_id) GROUP BY 1, 2),
c1_{j} AS (SELECT c0.cl, c0.i, coalesce(m.c, c0.c) AS c
           FROM c0_{j} c0 LEFT JOIN m1_{j} m
           ON c0.cl = m.cl AND c0.i = m.i),
d1_{j} AS (
  SELECT u.vec_id, c.cl, round(sum((u.v - c.c) * (u.v - c.c)), 6) AS d
  FROM u{j} u JOIN c1_{j} c ON u.i = c.i GROUP BY 1, 2),
a1_{j} AS (
  SELECT vec_id, cl, d FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
    FROM d1_{j}) WHERE rn = 1)"""


# dim=64 / m=4 → 16-dim subspaces; the Spark side derives dim from the
# data and raises if it stops dividing evenly.
_PQ_SQL = ("""
WITH
u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),"""
           + ",".join(_pq_subspace_cte(j, j * 16 + 1, (j + 1) * 16)
                      for j in range(4)) + """
SELECT a1_0.vec_id,
       a1_0.cl::INT AS code_0, a1_1.cl::INT AS code_1,
       a1_2.cl::INT AS code_2, a1_3.cl::INT AS code_3,
       round(a1_0.d + a1_1.d + a1_2.d + a1_3.d, 6) AS err
FROM a1_0 JOIN a1_1 USING (vec_id) JOIN a1_2 USING (vec_id)
          JOIN a1_3 USING (vec_id)
""")


def _pq_adc_sql(q_max: int) -> str:
    """ADC oracle over queries vec_id < q_max (shared by the literal
    and broadcast-relation Spark paths — identical semantics)."""
    return ("""
WITH
u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),"""
            + ",".join(_pq_subspace_cte(j, j * 16 + 1, (j + 1) * 16)
                       for j in range(4)) + ","
            + ",".join(f"""
qd_{j} AS (
  SELECT u.vec_id AS qid, c.cl,
         round(sum((u.v - c.c) * (u.v - c.c)), 6) AS d
  FROM u{j} u JOIN c1_{j} c ON u.i = c.i
  WHERE u.vec_id < {q_max} GROUP BY 1, 2)""" for j in range(4)) + """,
sc AS (
  SELECT q0.qid, a1_0.vec_id AS cid,
         round(q0.d + q1.d + q2.d + q3.d, 6) AS adist
  FROM a1_0 JOIN a1_1 USING (vec_id) JOIN a1_2 USING (vec_id)
            JOIN a1_3 USING (vec_id)
  JOIN qd_0 q0 ON q0.cl = a1_0.cl
  JOIN qd_1 q1 ON q1.cl = a1_1.cl AND q1.qid = q0.qid
  JOIN qd_2 q2 ON q2.cl = a1_2.cl AND q2.qid = q0.qid
  JOIN qd_3 q3 ON q3.cl = a1_3.cl AND q3.qid = q0.qid
  WHERE a1_0.vec_id <> q0.qid)
SELECT qid AS query_id, cid AS vec_id, adist, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY adist, cid) AS rank
  FROM sc) WHERE rank <= 5
""")


_PQ_ADC_SQL = _pq_adc_sql(3)


@register("emb_pq_adc_topk", sql=_PQ_ADC_SQL)
def emb_pq_adc(spark, sf_dir):
    # PQ asymmetric-distance top-k: queries score the 4-code corpus
    # relation via per-query m×k lookup tables — no float math against
    # raw vectors. The oracle recomputes the per-(query, centroid)
    # subspace distances against the same final codebooks.
    from ..ops.clustering import pq_adc_topk
    emb = load(spark, sf_dir, "embeddings").cache()
    try:
        queries = (emb.filter(F.col("vec_id") < 3)
                   .select(F.col("vec_id").alias("query_id"), "embedding"))
        out = pq_adc_topk(emb, queries, k=5, m=4, codebook_k=8, iters=1)
        return out.select("query_id", "vec_id", "adist",
                          F.col("rank").cast("long").alias("rank"))
    finally:
        emb.unpersist()


@register("emb_pq_adc_bcast_topk", sql=_pq_adc_sql(12))
def emb_pq_adc_bcast(spark, sf_dir):
    # Large-Q ADC: the per-query lookup tables are a broadcast
    # (qid, j, code, d) RELATION — no per-query plan branches, no
    # driver collect of the query side (the bounded-Q caveat on
    # pq_adc_topk does not apply). Same oracle shape, 12 queries.
    from ..ops.clustering import pq_adc_topk_broadcast
    emb = load(spark, sf_dir, "embeddings").cache()
    try:
        queries = (emb.filter(F.col("vec_id") < 12)
                   .select(F.col("vec_id").alias("query_id"), "embedding"))
        out = pq_adc_topk_broadcast(emb, queries, k=5, m=4,
                                    codebook_k=8, iters=1)
        return out.select("query_id", "vec_id", "adist",
                          F.col("rank").cast("long").alias("rank"))
    finally:
        emb.unpersist()


# Composite IVF+PQ oracle: the PQ preamble (1-based u, ids, 4 unrolled
# subspace k-means) + the IVF coarse-quantizer CTEs from the
# emb_ann_ivf_topk oracle (rebased onto the 1-based u — dot products
# only need index CONSISTENCY) + ADC scoring restricted to each
# query's probed lists.
_IVFPQ_SQL = ("""
WITH
u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),"""
              + ",".join(_pq_subspace_cte(j, j * 16 + 1, (j + 1) * 16)
                         for j in range(4)) + """,
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
cent_sel AS (
  SELECT vec_id AS cvid,
         row_number() OVER (
           ORDER BY ('0x' || substring(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
                    vec_id) - 1 AS list_id
  FROM embeddings),
cents AS (SELECT cvid, list_id FROM cent_sel WHERE list_id < 16),
cw AS (
  SELECT c.list_id, u.i,
         u.v / (CASE WHEN n.nrm = 0 THEN 1.0 ELSE n.nrm END) AS w
  FROM cents c JOIN u ON u.vec_id = c.cvid JOIN n ON n.vec_id = c.cvid),
adot AS (
  SELECT u.vec_id, cw.list_id, sum(u.v * cw.w) AS d
  FROM u JOIN cw USING (i) GROUP BY 1, 2),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d DESC, list_id) AS rn
    FROM adot) WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS qid, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d DESC, list_id) AS rn
    FROM adot WHERE vec_id < 5) WHERE rn <= 6),
cand AS (
  SELECT DISTINCT q.qid, a.vec_id AS cid
  FROM qprobe q JOIN assign a USING (list_id)
  WHERE a.vec_id <> q.qid),"""
              + ",".join(f"""
qd_{j} AS (
  SELECT u.vec_id AS qid, c.cl,
         round(sum((u.v - c.c) * (u.v - c.c)), 6) AS d
  FROM u{j} u JOIN c1_{j} c ON u.i = c.i
  WHERE u.vec_id < 5 GROUP BY 1, 2)""" for j in range(4)) + """,
sc AS (
  SELECT c.qid, c.cid,
         round(q0.d + q1.d + q2.d + q3.d, 6) AS adist
  FROM cand c
  JOIN a1_0 ON a1_0.vec_id = c.cid
  JOIN a1_1 ON a1_1.vec_id = c.cid
  JOIN a1_2 ON a1_2.vec_id = c.cid
  JOIN a1_3 ON a1_3.vec_id = c.cid
  JOIN qd_0 q0 ON q0.cl = a1_0.cl AND q0.qid = c.qid
  JOIN qd_1 q1 ON q1.cl = a1_1.cl AND q1.qid = c.qid
  JOIN qd_2 q2 ON q2.cl = a1_2.cl AND q2.qid = c.qid
  JOIN qd_3 q3 ON q3.cl = a1_3.cl AND q3.qid = c.qid)
SELECT qid AS query_id, cid AS vec_id, adist, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY adist, cid) AS rank
  FROM sc) WHERE rank <= 5
""")


_IVFPQ_INDEX: dict = {}


def _ivfpq_index(spark, sf_dir: str):
    import hashlib
    import tempfile
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/connectors_spark_ivfpq_index_{tag}"
    if path not in _IVFPQ_INDEX:
        _bounded_index_fixture(spark, path)
        from ..ops.clustering import build_ivf_pq_index
        emb = load(spark, sf_dir, "embeddings").cache()
        try:
            _IVFPQ_INDEX[path] = build_ivf_pq_index(
                emb, path, nlist=16, m=4, codebook_k=8, iters=1)
        finally:
            emb.unpersist()
    return path, _IVFPQ_INDEX[path]


@register("emb_ivf_pq_topk", sql=_IVFPQ_SQL)
def emb_ivf_pq(spark, sf_dir):
    # The FAISS-style IVFPQ composite: a list-partitioned Delta index
    # storing ONLY 4-byte PQ codes; probes partition-prune to each
    # query's top-6 lists and ADC-score against a broadcast distance
    # relation — floats are never read at query time. Not benched:
    # first call pays the one-time index build.
    from ..ops.clustering import ivf_pq_adc_topk
    emb = load(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    path, (cents, books) = _ivfpq_index(spark, sf_dir)
    out = ivf_pq_adc_topk(spark, path, queries, cents, books,
                          k=5, nprobe=6)
    return out.select("query_id", "vec_id", "adist",
                      F.col("rank").cast("long").alias("rank"))


@register("emb_pq_codes", sql=_PQ_SQL)
def emb_pq(spark, sf_dir):
    # Product quantization (Jégou et al. 2011): 4 independent 16-dim
    # codebooks (deterministic Lloyd, 1 iteration), every vector encoded
    # in ONE Arrow pass with all codebooks closed over — 64 floats → 4
    # codes + quantization error. The oracle unrolls all 4 subspace
    # k-means in SQL.
    from ..ops.clustering import pq_codes
    emb = load(spark, sf_dir, "embeddings").cache()
    try:
        return pq_codes(emb, m=4, k=8, iters=1)
    finally:
        emb.unpersist()


@register("emb_semdedup", sql=f"""
WITH {_KMEANS_CTES},
cs AS (SELECT cl, count(*) AS m FROM asg GROUP BY cl),
sb AS (
  SELECT asg.vec_id, asg.cl,
         CASE WHEN cs.m > 2500
              THEN ({_H64.format(v="asg.vec_id::VARCHAR")})
                   % ((cs.m + 2499) // 2500)
              ELSE 0 END AS sub
  FROM asg JOIN cs USING (cl)),
nr AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
p AS (
  SELECT ua.vec_id AS a, ub.vec_id AS b,
         round(sum(ua.v * ub.v) / na.nrm / nb.nrm, 6) AS sim
  FROM sb aa
  JOIN sb ab ON aa.cl = ab.cl AND aa.sub = ab.sub
            AND ab.vec_id > aa.vec_id
  JOIN u ua ON ua.vec_id = aa.vec_id
  JOIN u ub ON ub.vec_id = ab.vec_id AND ub.i = ua.i
  JOIN nr na ON na.vec_id = aa.vec_id
  JOIN nr nb ON nb.vec_id = ab.vec_id
  GROUP BY ua.vec_id, ub.vec_id, na.nrm, nb.nrm),
dr AS (SELECT DISTINCT b FROM p WHERE sim >= 0.35)
SELECT vec_id, cl::INT AS cluster,
       (vec_id IN (SELECT b FROM dr)) AS dropped
FROM asg
""")
def emb_semdedup(spark, sf_dir):
    # SemDeDup: within each k-means cluster, a vector is dropped when a
    # lower-id cluster-mate has cosine >= 0.35. Clusters above
    # max_cluster_size (2500) are deterministically sub-split
    # (hash64(id) % ceil(m/2500)) so candidate count stays LINEAR in n
    # with fixed k — the sf10 probe caught the uncapped version going
    # quadratic (625M-pair clusters). The oracle models the sub-split
    # (cs/sb CTEs).
    from ..ops.clustering import semdedup
    emb = load(spark, sf_dir, "embeddings").cache()
    return semdedup(emb, k=8, iters=2, threshold=0.35)


# --------------------------------------------------------------------------
# Mergeable sketches (ops/sketches.py): CountMin / HyperLogLog / Bloom.
# All hashing is md5-derived with no seeds, so the DuckDB oracles
# compute bit-identical sketches — same determinism rationale as
# ev_kmv_distinct.
# --------------------------------------------------------------------------

@register("doc_countmin_token_counts", sql=f"""
WITH {_TOKS},
tok AS (SELECT unnest(t) AS g FROM toks),
cnt AS (SELECT g, count(*)::BIGINT AS exact_n FROM tok GROUP BY 1),
top AS (SELECT g, exact_n FROM cnt ORDER BY exact_n DESC, g LIMIT 10),
buck AS (
  SELECT j.j,
         ('0x' || substring(md5('cm' || j.j || ':' || tok.g), 1, 15))::BIGINT
             % 256 AS bucket
  FROM tok, range(0, 4) j(j)),
sk AS (SELECT j, bucket, count(*)::BIGINT AS c FROM buck GROUP BY 1, 2),
pe AS (
  SELECT top.g, top.exact_n, j.j,
         ('0x' || substring(md5('cm' || j.j || ':' || top.g), 1, 15))::BIGINT
             % 256 AS bucket
  FROM top, range(0, 4) j(j))
SELECT pe.g AS token, pe.exact_n,
       min(coalesce(sk.c, 0))::BIGINT AS cm_est
FROM pe LEFT JOIN sk ON sk.j = pe.j AND sk.bucket = pe.bucket
GROUP BY pe.g, pe.exact_n
""")
def doc_countmin(spark, sf_dir):
    # CountMin (Cormode & Muthukrishnan 2005) over document tokens,
    # probed with the exact top-10: cm_est >= exact_n always, overshoot
    # = bucket collisions. The 4x256 counter relation is additive and
    # map-side combined — the 100 TB heavy-hitter shape.
    from ..functions.text import tokens
    from ..ops.sketches import countmin_estimate, countmin_sketch
    docs = load(spark, sf_dir, "documents")
    tok = (docs.select(F.explode_outer(tokens("text")).alias("g"))
           .where(F.col("g").isNotNull()))
    cnt = tok.groupBy("g").agg(F.count(F.lit(1)).alias("exact_n"))
    top = cnt.orderBy(F.desc("exact_n"), F.asc("g")).limit(10)
    sk = countmin_sketch(tok, "g", depth=4, width=256)
    est = countmin_estimate(sk, top.select("g"), "g", depth=4, width=256)
    return (top.join(est, "g")
            .select(F.col("g").alias("token"), "exact_n",
                    F.col("cm_est").cast("long").alias("cm_est")))


_HLL_RAW_NUM = repr(0.709 * 64 * 64)  # alpha_64 * m^2, identical literal


@register("ev_hll_distinct", sql=f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM events),
r AS (
  SELECT event_type, hv % 64 AS bucket,
         CASE WHEN hv // 64 = 0 THEN 55
              ELSE (floor(log2(((hv // 64) & -(hv // 64))::DOUBLE))
                    + 1)::INTEGER END AS rho
  FROM h),
g AS (SELECT event_type, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
s AS (SELECT event_type, sum(power(2.0::DOUBLE, -reg)) AS sm,
             count(*)::BIGINT AS n
      FROM g GROUP BY 1),
ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
       FROM events GROUP BY 1)
SELECT ex.event_type, ex.n_exact,
       round(CASE WHEN {_HLL_RAW_NUM} / (s.sm + (64 - s.n)) <= 160.0
                       AND s.n < 64
                  THEN 64.0 * ln(64.0 / (64 - s.n))
                  ELSE {_HLL_RAW_NUM} / (s.sm + (64 - s.n)) END, 2)
           AS hll_est,
       (64 - s.n)::INTEGER AS n_zero_regs
FROM ex JOIN s ON ex.event_type = s.event_type
""")
def ev_hll(spark, sf_dir):
    # HyperLogLog (Flajolet et al. 2007), m=64, deterministic md5-based
    # hashing + the small-range linear-counting correction. Register
    # max is the mergeable combiner; vs ev_kmv_distinct this is the
    # constant-memory (m registers) alternative to the k-minimum tree.
    from ..ops.sketches import hll_estimate, hll_registers
    ev = load(spark, sf_dir, "events")
    est = (hll_estimate(hll_registers(ev, "event_type", "user_id"))
           .withColumnRenamed("grp", "event_type"))
    ex = (ev.groupBy("event_type")
          .agg(F.countDistinct("user_id").alias("n_exact")))
    return ex.join(est, "event_type").select(
        "event_type", "n_exact", "hll_est", "n_zero_regs")


@register("doc_bloom_decontaminate", sql=f"""
WITH {_TOKS},
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(t) >= 3
              THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  for i in range(1, len(t) - 1)])
              ELSE [] END AS s
  FROM toks),
tg AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh
       WHERE source <> 'src0'),
eg AS (SELECT unnest(s) AS g FROM sh WHERE source = 'src0'),
bits AS (
  SELECT DISTINCT
         ('0x' || substring(md5('bl' || j.j || ':' || eg.g), 1, 15))::BIGINT
             % 4096 AS bit
  FROM eg, range(0, 3) j(j)),
pb AS (
  SELECT tg.doc_id, tg.g, j.j,
         ('0x' || substring(md5('bl' || j.j || ':' || tg.g), 1, 15))::BIGINT
             % 4096 AS bit
  FROM tg, range(0, 3) j(j)),
hit AS (
  SELECT pb.doc_id, pb.g, count(bits.bit) = 3 AS _in
  FROM pb LEFT JOIN bits USING (bit) GROUP BY 1, 2)
SELECT doc_id, count(*)::BIGINT AS n_grams,
       sum(CASE WHEN _in THEN 1 ELSE 0 END)::BIGINT AS n_bloom_hits
FROM hit GROUP BY 1
""")
def doc_bloom(spark, sf_dir):
    # Bloom-filter decontamination: the eval set compresses to a
    # <=4096-row bit relation (vs broadcasting its full gram set in
    # doc_decontaminate) — constant size however large the benchmark
    # suite, no false negatives, collision-bounded false positives.
    from ..functions.text import ngram_shingles
    from ..ops.sketches import bloom_bits, bloom_contains_counts
    docs = load(spark, sf_dir, "documents")
    train = (docs.filter(F.col("source") != "src0")
             .select("doc_id",
                     F.explode_outer(ngram_shingles(F.col("text"), 3))
                     .alias("g"))
             .where(F.col("g").isNotNull()))
    evalg = (docs.filter(F.col("source") == "src0")
             .select(F.explode_outer(ngram_shingles(F.col("text"), 3))
                     .alias("g"))
             .where(F.col("g").isNotNull()))
    bits = bloom_bits(evalg, "g", k=3, mbits=4096)
    return bloom_contains_counts(train, "doc_id", "g", bits,
                                 k=3, mbits=4096)


# --------------------------------------------------------------------------
# Mixture quotas + deterministic epoch shuffle (ops/sampling.py)
# --------------------------------------------------------------------------

@register("doc_mixture_quota", sql="""
WITH c AS (
  SELECT source AS "group", count(*)::BIGINT AS n_docs
  FROM documents GROUP BY 1),
e AS (
  SELECT "group", n_docs,
         round(pow(n_docs, 0.5) / sum(pow(n_docs, 0.5)) OVER () * 1000.0,
               6) AS _exact
  FROM c),
b AS (
  SELECT "group", n_docs, floor(_exact)::BIGINT AS _base,
         _exact - floor(_exact) AS _frac
  FROM e),
r AS (
  SELECT *, row_number() OVER (ORDER BY _frac DESC, "group") AS _rk,
         1000 - sum(_base) OVER () AS _rem
  FROM b)
SELECT "group", n_docs,
       (_base + CASE WHEN _rk <= _rem THEN 1 ELSE 0 END)::BIGINT AS quota
FROM r
""")
def doc_mixture_quota(spark, sf_dir):
    # Largest-remainder apportionment of the temperature mix: integer
    # per-source quotas summing exactly to the budget — directly
    # feedable to stratified sampling, unlike fractional expectations.
    from ..ops.sampling import mixture_allocate
    return mixture_allocate(load(spark, sf_dir, "documents"),
                            group_col="source", alpha=0.5, budget=1000)


@register("doc_epoch_shuffle", sql="""
SELECT doc_id,
       row_number() OVER (
           ORDER BY ('0x' || substring(md5('ep1:' || doc_id), 1, 15))::BIGINT,
                    doc_id) - 1 AS pos
FROM documents
""")
def doc_epoch_shuffle(spark, sf_dir):
    # Reproducible epoch permutation: the oracle is ONE global
    # ROW_NUMBER over the hash; the Spark plan computes the identical
    # rank with the two-pass range-bucket scheme — per-bucket windows
    # plus a tiny prefix-summed offset relation — so no data row ever
    # crosses a SinglePartition exchange (plan-pinned).
    from ..ops.sampling import epoch_shuffle
    return epoch_shuffle(load(spark, sf_dir, "documents"), seed=1)


# --------------------------------------------------------------------------
# Distributed BPE merge training (ops/bpe.py) — oracle unrolls k rounds
# --------------------------------------------------------------------------

def _bpe_ctes(k: int) -> str:
    rounds = []
    for r in range(1, k + 1):
        rounds.append(f"""
y{r} AS (
  SELECT c, string_split(substr(state, 2, length(state) - 2),
                         chr(31) || chr(31)) AS syms
  FROM s{r - 1}),
p{r} AS (
  SELECT pr[1] AS l, pr[2] AS r, sum(c)::BIGINT AS f
  FROM (SELECT c, unnest([[syms[i], syms[i + 1]]
                          for i in range(1, len(syms))]) AS pr
        FROM y{r} WHERE len(syms) >= 2)
  GROUP BY 1, 2),
b{r} AS (SELECT l, r, f FROM p{r} ORDER BY f DESC, l, r LIMIT 1),
s{r} AS (
  -- LEFT JOIN ON TRUE: when pairs run dry before round k, b{r} is
  -- empty and the state must pass through unchanged (matching the
  -- Spark side's early break), not collapse to an empty relation.
  SELECT w.word, w.c,
         CASE WHEN b.l IS NULL THEN w.state
              ELSE replace(w.state,
                 chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                 chr(31) || b.l || b.r || chr(31)) END AS state
  FROM s{r - 1} w LEFT JOIN b{r} b ON TRUE)""")
    return (f"WITH {_TOKS},\n"
            "w AS (SELECT u AS word, count(*)::BIGINT AS c\n"
            "      FROM (SELECT unnest(t) AS u FROM toks) GROUP BY 1),\n"
            "s0 AS (SELECT word, c,\n"
            "       regexp_replace(word, '(.)',\n"
            "                      chr(31) || '\\1' || chr(31), 'g')\n"
            "           AS state\n"
            "       FROM w)," + ",".join(rounds))


def _bpe_sql(k: int) -> str:
    union = "\nUNION ALL\n".join(
        f'SELECT {r} AS step, l AS "left", r AS "right", f AS pair_freq '
        f"FROM b{r}" for r in range(1, k + 1))
    return _bpe_ctes(k) + "\n" + union


@register("doc_bpe_merges", sql=_bpe_sql(6))
def doc_bpe_merges(spark, sf_dir):
    # BPE training (Sennrich et al. 2016): the corpus collapses to the
    # distinct-word relation, each round is one weighted pair aggregate
    # + a deterministic global top-1, merges apply as a delimiter-safe
    # string replace. The oracle unrolls the identical 6 rounds in SQL,
    # so the LEARNED MERGE TABLE itself is hash-gated.
    from ..ops.bpe import bpe_merge_table
    return bpe_merge_table(spark, load(spark, sf_dir, "documents"), k=6)


@register("doc_bpe_subword_counts", sql=_bpe_ctes(6) + """
SELECT t.doc_id, count(*)::BIGINT AS n_words,
       sum(len(string_split(substr(s.state, 2, length(s.state) - 2),
                            chr(31) || chr(31))))::BIGINT AS n_subwords
FROM (SELECT doc_id, unnest(t) AS word FROM toks) t
JOIN s6 s USING (word)
GROUP BY 1
""")
def doc_bpe_subwords(spark, sf_dir):
    # The ENCODE side of BPE: apply the 6 learned merges to every doc
    # (k literal replaces over wrapped symbol states — map-side JVM
    # expressions, merge table closed over as literals) and count the
    # resulting subwords. The oracle re-learns the identical merges in
    # SQL and joins each doc's words to the final word states.
    from ..ops.bpe import bpe_subword_counts, bpe_train
    docs = load(spark, sf_dir, "documents")
    merges = bpe_train(docs, k=6)
    return bpe_subword_counts(docs, merges)


@register("ev_value_histogram_quantiles", sql="""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND round(value * 100) >= 1),
b AS (
  SELECT event_type,
         (length(bin(cents)) - 1) * 2 +
         CASE WHEN substring(bin(cents), 2, 1) = '1' THEN 1 ELSE 0 END
             AS bin
  FROM c),
h AS (SELECT event_type, bin, count(*)::BIGINT AS cnt FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)::BIGINT
             AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n,
         round((pow(2.0::DOUBLE, bin // 2)
                + (bin % 2) * pow(2.0::DOUBLE, bin // 2 - 1)) / 100.0, 6)
             AS edge
  FROM h)
SELECT event_type, max(n)::BIGINT AS n_values,
       min(CASE WHEN cum >= ceil(0.5 * n) THEN edge END) AS p50_est,
       min(CASE WHEN cum >= ceil(0.9 * n) THEN edge END) AS p90_est,
       min(CASE WHEN cum >= ceil(0.99 * n) THEN edge END) AS p99_est
FROM cum GROUP BY 1
""")
def ev_hist_quantiles(spark, sf_dir):
    # Mergeable approx-quantiles: half-octave histogram over integer
    # cents with EXACT bit-arithmetic binning (a log2-based bin is one
    # libm ulp from a different bucket; bit_length can't disagree
    # between engines). The quantile read-out runs entirely on the tiny
    # (group, bin) relation — the 100 TB path sees one binning
    # aggregate, and slices merge by adding counts.
    from ..ops.sketches import histogram_quantiles, histogram_sketch
    ev = load(spark, sf_dir, "events")
    out = histogram_quantiles(histogram_sketch(ev, "event_type", "value"))
    return out.withColumnRenamed("grp", "event_type")


@register("mm_audio_decode_real", sql="""
WITH g AS (
  SELECT doc_id, 64 + doc_id % 129 AS n,
         (8000 + (doc_id % 3) * 4000)::INTEGER AS sample_rate
  FROM documents),
s AS (
  SELECT g.doc_id, g.sample_rate, g.n, r.i,
         (g.doc_id * 7919 + r.i * r.i) % 4001 - 2000 AS v
  FROM g, LATERAL (SELECT unnest(range(0, g.n)) AS i) r)
SELECT doc_id, sample_rate, 1::INTEGER AS channels,
       n::INTEGER AS n_samples,
       sum(v)::BIGINT AS amp_sum,
       sum(v * v)::BIGINT AS amp_sq_sum,
       sum((i + 1) * v)::BIGINT AS amp_xsum
FROM s GROUP BY doc_id, sample_rate, n
""")
def mm_audio_decode_real(spark, sf_dir):
    # REAL WAV decode (stdlib RIFF parser, ops/audiocodec.py): the
    # corpus is genuine PCM16 WAV bytes whose samples follow a
    # closed-form doc_id rule; the oracle recomputes the expected
    # amplitude statistics from the rule, Spark must parse actual RIFF
    # chunks to produce them. Closes the audio arm of the multimodal
    # family the way mm_image_decode_real closed images.
    docs = load(spark, sf_dir, "documents")
    return mm.decode_audio(mm.synth_wav_media(docs))


@register("mm_video_frames_real", sql="""
WITH g AS (
  SELECT doc_id, 2 + doc_id % 4 AS nf, 4 + doc_id % 5 AS w,
         2 + doc_id % 3 AS h
  FROM documents),
fr AS (
  SELECT g.doc_id, g.w, g.h, f.f
  FROM g, LATERAL (SELECT unnest(range(0, g.nf, 2)) AS f) f),
px AS (
  SELECT fr.doc_id, fr.f, fr.w, fr.h, r.i,
         (fr.doc_id * 131 + fr.f * 977 + r.i) % 256 AS v
  FROM fr, LATERAL (SELECT unnest(range(0, fr.w * fr.h * 3)) AS i) r)
SELECT doc_id, f::INTEGER AS frame_idx, w::INTEGER AS width,
       h::INTEGER AS height,
       sum(v)::BIGINT AS pix_sum, sum((i + 1) * v)::BIGINT AS pix_xsum
FROM px GROUP BY doc_id, f, w, h
""")
def mm_video_frames_real(spark, sf_dir):
    # REAL video frame sampling (stdlib raw-DIB AVI parser,
    # ops/videocodec.py): the corpus is genuine RIFF-AVI containers
    # whose frame pixels follow a closed-form rule; Spark must walk the
    # container and un-DIB each sampled frame to match the oracle's
    # rule-derived stats. Completes the multimodal trio — image, audio
    # and video all have real stdlib decode paths; compressed codecs
    # remain guarded.
    docs = load(spark, sf_dir, "documents")
    return mm.frame_sample_real(mm.synth_avi_media(docs), every_n=2)


# --------------------------------------------------------------------------
# DSIR importance weights (ops/quality.py dsir_importance_weights)
# --------------------------------------------------------------------------

@register("doc_dsir_weights", sql="""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
uni AS (SELECT doc_id, lang, unnest(t) AS f FROM toks),
big AS (
  SELECT doc_id, lang,
         unnest([t[i] || ' ' || t[i+1]
                 FOR i IN generate_series(1, len(t) - 1)]) AS f
  FROM toks WHERE len(t) > 1),
feats AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
fb AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(f), 1, 15))::BIGINT % 256 AS b
  FROM feats),
hist AS (
  SELECT b, count(*)::BIGINT AS c_raw,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS c_t
  FROM fb GROUP BY 1),
tot AS (SELECT sum(c_raw)::DOUBLE AS t_raw, sum(c_t)::DOUBLE AS t_t
        FROM hist),
lam AS (
  SELECT b, round(ln((c_t + 1) / (t_t + 256))
                - ln((c_raw + 1) / (t_raw + 256)), 6) AS lam
  FROM hist, tot)
SELECT doc_id, count(*)::BIGINT AS n_feat,
       round(sum(lam), 6) AS logw
FROM fb JOIN lam USING (b) GROUP BY 1
""")
def doc_dsir_weights(spark, sf_dir):
    # DSIR (Xie et al. 2023): hashed unigram+bigram importance weights
    # of every document against the lang='en' target subset — the
    # importance-resampling signal a pretraining pipeline uses to tilt
    # a raw web corpus toward a target domain without an external
    # model. The oracle recomputes the same md5-hashed buckets,
    # add-1-smoothed histograms and round-6 log-ratios in SQL.
    from ..ops.quality import dsir_importance_weights
    docs = load(spark, sf_dir, "documents")
    return dsir_importance_weights(docs, F.col("lang") == "en",
                                   buckets=256)


# --------------------------------------------------------------------------
# In-engine quality classifier (ops/regression.py logistic regression)
# --------------------------------------------------------------------------

def _logreg_sql(iters: int = 3) -> str:
    """Unroll full-batch GD in SQL: g{i} aggregates the round-6 per-doc
    gradient contributions under the previous weights, w{i} carries the
    round-6 updated weights (a0..a3); scoring applies the final w."""
    xs = ["x0", "x1", "x2", "x3"]
    z0 = "0"
    parts = []
    prev_w = None
    for i in range(1, iters + 1):
        z = z0 if prev_w is None else \
            " + ".join(f"{prev_w}.a{k} * {x}" for k, x in enumerate(xs))
        p = f"1.0 / (1.0 + exp(-({z})))"
        g = ", ".join(
            f"round(avg(round((y - {p}) * {x}, 6)), 6) AS g{k}"
            for k, x in enumerate(xs))
        src = "feat" if prev_w is None else f"feat, {prev_w}"
        parts.append(f"g{i} AS (SELECT {g} FROM {src})")
        base = "0.0" if prev_w is None else None
        upd = ", ".join(
            (f"round(0.0 + g{k}, 6) AS a{k}" if base else
             f"round({prev_w}.a{k} + g{k}, 6) AS a{k}")
            for k in range(len(xs)))
        wsrc = f"g{i}" if prev_w is None else f"{prev_w}, g{i}"
        parts.append(f"w{i} AS (SELECT {upd} FROM {wsrc})")
        prev_w = f"w{i}"
    zf = " + ".join(f"{prev_w}.a{k} * {x}" for k, x in enumerate(xs))
    joined = ",\n".join(parts)
    return f"""
WITH feat AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x0,
         len(t)::DOUBLE / 100 AS x1,
         n_chars::DOUBLE / 1000 AS x2,
         round(len(list_distinct(t))::DOUBLE / len(t), 6) AS x3
  FROM (SELECT doc_id, lang, n_chars,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents)
  WHERE len(t) > 0),
{joined}
SELECT doc_id, round(1.0 / (1.0 + exp(-({zf}))), 6) AS score,
       round(1.0 / (1.0 + exp(-({zf}))), 6) >= 0.5 AS pred
FROM feat, {prev_w}
"""


@register("doc_quality_logreg", sql=_logreg_sql(3))
def doc_quality_logreg(spark, sf_dir):
    # In-engine quality classifier: full-batch GD logistic regression
    # (3 iterations, one map-side-combined gradient aggregate each)
    # over cheap per-doc features, predicting the lang='en' target;
    # scoring is a pure JVM expression. The oracle unrolls the
    # identical iterations in SQL, so the gate hashes both the LEARNED
    # weights (through every score) and the scoring math.
    from ..functions.text import tokens
    from ..ops.regression import logreg_fit, logreg_score
    docs = load(spark, sf_dir, "documents")
    xs = ["x0", "x1", "x2", "x3"]
    feat = (docs.withColumn("_t", tokens(F.col("text")))
            .filter(F.size("_t") > 0)
            .select("doc_id",
                    (F.col("lang") == "en").cast("double").alias("y"),
                    F.lit(1.0).alias("x0"),
                    (F.size("_t") / F.lit(100.0)).alias("x1"),
                    (F.col("n_chars") / F.lit(1000.0)).alias("x2"),
                    F.round(F.size(F.array_distinct("_t")) /
                            F.size("_t"), 6).alias("x3"))
            .cache())
    try:
        w = logreg_fit(feat, xs, label_col="y", iters=3, lr=1.0)
        score = logreg_score(w, xs)
        return feat.select("doc_id", score.alias("score"),
                           (score >= 0.5).alias("pred"))
    finally:
        feat.unpersist()


# --------------------------------------------------------------------------
# Skew-safe grouped top-k (ops/skew.py grouped_topk)
# --------------------------------------------------------------------------

@register("ord_topk_per_status", sql="""
SELECT o_orderstatus, o_orderkey, totalprice, rank FROM (
  SELECT o_orderstatus, o_orderkey,
         round(o_totalprice, 2) AS totalprice,
         row_number() OVER (
             PARTITION BY o_orderstatus
             ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS rank
  FROM orders) WHERE rank <= 3
""")
def ord_topk_per_status(spark, sf_dir):
    # Exact top-3 orders by value per status. Skew-safe because the
    # plan carries a PARTIAL WindowGroupLimit before the shuffle
    # (Catalyst builds the two-phase top-k from the declarative
    # window; a hand-rolled variant measured 2.7x slower — see
    # ops/skew.py grouped_topk and the plan pin in test_plans.py).
    from ..ops.skew import grouped_topk
    od = load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"))
    out = grouped_topk(od, ["o_orderstatus"], "totalprice", k=3,
                       descending=True, tie_cols=["o_orderkey"])
    return out.select("o_orderstatus", "o_orderkey", "totalprice",
                      F.col("rank").cast("long").alias("rank"))


# --------------------------------------------------------------------------
# Adaptive per-group length filtering (corpus-derived quantile floors)
# --------------------------------------------------------------------------

@register("doc_adaptive_length_filter", sql="""
WITH n AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
             AS n_tok
  FROM documents),
th AS (
  SELECT lang, round(quantile_cont(n_tok, 0.1), 6) AS th
  FROM n GROUP BY 1)
SELECT n.lang, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n.n_tok >= th.th THEN 1 ELSE 0 END)::BIGINT
           AS n_kept,
       th.th
FROM n JOIN th ON n.lang = th.lang
GROUP BY n.lang, th.th
""")
def doc_adaptive_length_filter(spark, sf_dir):
    # Adaptive curation floor: instead of one corpus-wide minimum
    # length (which over-prunes terse languages), each language derives
    # its own p10 token-count floor from the corpus — exact interpolated
    # percentile (Spark `percentile` == DuckDB `quantile_cont`), tiny
    # per-group relation broadcast back onto the docs. Reports per-lang
    # keep counts against the derived threshold.
    from ..functions.text import token_count
    docs = load(spark, sf_dir, "documents")
    n = docs.select("doc_id", "lang",
                    token_count(F.col("text")).cast("long")
                    .alias("n_tok"))
    th = (n.groupBy("lang")
          .agg(F.round(F.expr("percentile(n_tok, 0.1)"), 6).alias("th")))
    return (n.join(F.broadcast(th), "lang")
            .groupBy("lang", "th")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("n_tok") >= F.col("th"), 1)
                       .otherwise(0)).alias("n_kept"))
            .select("lang", "n_docs", "n_kept", "th"))


@register("mm_jpeg_decode_real", sql="""
WITH g AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 3 THEN 16
              WHEN doc_id % 8 = 5 THEN 16
              ELSE 8 * (1 + doc_id % 3) END AS w,
         CASE WHEN doc_id % 4 = 3 THEN 16
              WHEN doc_id % 8 = 5 THEN 8
              ELSE 8 * (1 + doc_id % 2) END AS h,
         CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS c
  FROM documents),
px AS (
  SELECT g.doc_id, g.w, g.h, g.c, r.i,
         (((r.i // g.c) // g.w) // 8) * (g.w // 8)
             + (((r.i // g.c) % g.w) // 8) AS b
  FROM g, LATERAL (SELECT unnest(range(0, g.w * g.h * g.c)) AS i) r),
v AS (
  SELECT doc_id, w, h, c, i,
         128 + 2 * (((doc_id * 7 + b * 13) % 64) - 32) AS v
  FROM px)
SELECT doc_id, 'jpeg' AS fmt, w::INTEGER AS width, h::INTEGER AS height,
       c::INTEGER AS channels,
       sum(v)::BIGINT AS pix_sum, sum((i + 1) * v)::BIGINT AS pix_xsum
FROM v GROUP BY doc_id, w, h, c
""")
def mm_jpeg_decode_real(spark, sf_dir):
    # REAL compressed-format decode (stdlib baseline-JPEG codec,
    # ops/jpegcodec.py): the corpus is genuine JFIF streams — DQT/DHT/
    # SOF0/SOS markers, canonical Huffman entropy data with byte
    # stuffing; odd ids are COLOR (4:4:4; 4:2:0 for ids % 4 == 3;
    # 4:2:2 for ids % 8 == 5); ids % 8 in (1, 6) are PROGRESSIVE
    # (SOF2 multi-scan, same pixel rule so the oracle is unchanged) —
    # whose block-constant pixels follow a closed-form rule chosen to
    # quantize exactly. The oracle recomputes the rule; Spark must run
    # actual Huffman decode, dequantization, IDCT and YCbCr->RGB to
    # match. Closes the "compressed codecs remain guarded" gap: jpeg
    # now has a real decode path beside png/bmp/wav/avi.
    docs = load(spark, sf_dir, "documents")
    return mm.decode_image(mm.synth_jpeg_media(docs))


@register("mm_audio_xcodec_clusters", sql="""
SELECT min(doc_id) AS rep, count(*) AS n_members,
       count(DISTINCT doc_id % 3) AS n_fmts
FROM documents GROUP BY doc_id % 32
""")
def mm_audio_xcodec_clusters(spark, sf_dir):
    # Cross-codec audio dedup (ops/multimodal.py audio_fp_clusters):
    # the same closed-form clip per group is encoded through THREE
    # real codecs (PCM16 WAV / FLAC / lossy G.711 mu-law), and the
    # band-energy-ordering fingerprint must collapse renditions to one
    # cluster — Spark runs three real decoders + FFT banding; the
    # oracle only needs the group arithmetic. The 32 band orderings
    # are pinned pairwise-distinct and codec-stable in tests.
    docs = load(spark, sf_dir, "documents")
    return mm.audio_fp_clusters(mm.synth_audio_xcodec_media(docs))


@register("mm_phash_clusters", sql="""
SELECT min(doc_id) AS rep, count(*) AS n_members,
       count(DISTINCT doc_id % 3) AS n_sizes
FROM documents GROUP BY doc_id % 50
""", bench=True)
def mm_phash_clusters(spark, sf_dir):
    # Perceptual-hash image dedup (ops/multimodal.py phash_clusters):
    # the corpus renders each of 50 closed-form patterns as REAL
    # grayscale JPEGs at 32/64/128 px (doc_id % 3), and the DCT pHash
    # must collapse every scale-variant group to ONE cluster — Spark
    # runs actual entropy decode + box resize + 32x32 DCT; the oracle
    # only needs the group arithmetic. The 50 patterns are pinned
    # pairwise-distinct under pHash in tests, so cluster == group
    # exactly.
    docs = load(spark, sf_dir, "documents")
    return mm.phash_clusters(mm.synth_jpeg_scaled_media(docs))


@register("mm_jpeg_progressive_real", sql="""
WITH g AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 1 THEN 16
              WHEN doc_id % 4 = 3 THEN 32
              ELSE 8 * (1 + doc_id % 3) END AS w,
         CASE WHEN doc_id % 2 = 1 THEN 16
              ELSE 8 * (1 + doc_id % 2) END AS h,
         CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS c
  FROM documents),
px AS (
  SELECT g.doc_id, g.w, g.h, g.c, r.i,
         (((r.i // g.c) // g.w) // 8) * (g.w // 8)
             + (((r.i // g.c) % g.w) // 8) AS b
  FROM g, LATERAL (SELECT unnest(range(0, g.w * g.h * g.c)) AS i) r),
v AS (
  SELECT doc_id, w, h, c, i,
         128 + 2 * (((doc_id * 7 + b * 13) % 64) - 32) AS v
  FROM px)
SELECT doc_id, 'jpeg' AS fmt, w::INTEGER AS width, h::INTEGER AS height,
       c::INTEGER AS channels,
       sum(v)::BIGINT AS pix_sum, sum((i + 1) * v)::BIGINT AS pix_xsum
FROM v GROUP BY doc_id, w, h, c
""")
def mm_jpeg_progressive_real(spark, sf_dir):
    # Dedicated PROGRESSIVE-JPEG gate (VERDICT r10 #3): every stream
    # is SOF2 multi-scan — even ids multi-scan grayscale, odd ids
    # 4:2:0 color (16x16 / 32x16) — so the full Annex-G path (DC
    # successive approximation, spectral-selection AC scans, EOBn
    # runs, refinement correction bits, accumulate-then-IDCT, 2x2
    # chroma replication upsample) runs on every row; the oracle
    # recomputes the closed-form block-constant pixel rule, which the
    # flat quantizer reproduces bit-for-bit.
    docs = load(spark, sf_dir, "documents")
    return mm.decode_image(mm.synth_jpeg_progressive_media(docs))


@register("mm_gif_decode_real", sql="""
WITH g AS (
  SELECT doc_id, 1 + doc_id % 19 AS w, 1 + doc_id % 13 AS h,
         2 + doc_id % 255 AS ncol
  FROM documents),
px AS (
  SELECT g.doc_id, g.w, g.h, r.i,
         ((g.doc_id * 3 + (r.i // 3) * 5) % g.ncol) AS idx,
         r.i % 3 AS ch
  FROM g, LATERAL (SELECT unnest(range(0, g.w * g.h * 3)) AS i) r),
v AS (
  SELECT doc_id, w, h, i,
         CASE ch WHEN 0 THEN (idx * 7 + doc_id) % 256
                 WHEN 1 THEN (idx * 11 + 3 * doc_id) % 256
                 ELSE (idx * 13 + 5 * doc_id) % 256 END AS v
  FROM px)
SELECT doc_id, 'gif' AS fmt, w::INTEGER AS width, h::INTEGER AS height,
       3 AS channels,
       sum(v)::BIGINT AS pix_sum, sum((i + 1) * v)::BIGINT AS pix_xsum
FROM v GROUP BY doc_id, w, h
""")
def mm_gif_decode_real(spark, sf_dir):
    # REAL LZW decode (stdlib GIF codec, ops/imagecodec.py): the
    # corpus is genuine GIF89a streams — logical screen descriptor,
    # global color table, variable-width LSB-first LZW codes with
    # clear/end handling and 4096-entry dictionary resets, 255-byte
    # sub-blocks, 4-pass interlacing on odd ids. GIF is lossless, so
    # the oracle recomputes exact RGB bytes from the closed-form
    # palette/index rule; Spark must run the actual decompression,
    # palette lookup and de-interlace to match byte-for-byte.
    docs = load(spark, sf_dir, "documents")
    return mm.decode_image(mm.synth_gif_media(docs))


@register("doc_ccnet_buckets", sql="""
WITH toks AS (
  SELECT d.doc_id, d.lang,
         list_filter(string_split(d.text, ' '), x -> x <> '') AS t
  FROM documents d),
tok AS (SELECT doc_id, lang, unnest(t) AS w FROM toks),
v AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c)::DOUBLE AS s FROM v),
lp AS (SELECT w, -ln(c / s) AS nll FROM v, tot),
scored AS (
  SELECT tok.doc_id, tok.lang, round(avg(lp.nll), 6) AS nll
  FROM tok JOIN lp USING (w) GROUP BY 1, 2),
th AS (
  SELECT lang, round(quantile_cont(nll, 1.0/3), 6) AS t1,
         round(quantile_cont(nll, 2.0/3), 6) AS t2
  FROM scored GROUP BY 1),
b AS (
  SELECT s.lang,
         CASE WHEN s.nll <= th.t1 THEN 'head'
              WHEN s.nll <= th.t2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         s.nll
  FROM scored s JOIN th ON s.lang = th.lang)
SELECT lang, bucket, count(*)::BIGINT AS n_docs,
       round(avg(nll), 6) AS avg_nll
FROM b GROUP BY 1, 2
""")
def doc_ccnet_buckets(spark, sf_dir):
    # The CCNet head/middle/tail split (Wenzek et al. 2020 §4.3):
    # score every doc under the corpus LM (unigram stand-in,
    # doc_unigram_nll), cut each language at its own NLL terciles
    # (exact interpolated percentiles, tiny per-lang relation
    # broadcast back), and report per-(lang, bucket) counts — the
    # standard quality-mixture signal a pretraining pipeline feeds to
    # mixture weighting. Both engines round nll to 6 BEFORE the
    # tercile cut, so the bucket boundaries are identical.
    from ..ops.quality import unigram_nll_scores
    from pyspark.sql import functions as F
    docs = load(spark, sf_dir, "documents")
    scored = (unigram_nll_scores(docs)
              .join(docs.select("doc_id", "lang"), "doc_id"))
    th = (scored.groupBy("lang")
          .agg(F.round(F.expr("percentile(nll, 1.0D/3)"), 6).alias("t1"),
               F.round(F.expr("percentile(nll, 2.0D/3)"), 6).alias("t2")))
    b = (scored.join(F.broadcast(th), "lang")
         .withColumn("bucket",
                     F.when(F.col("nll") <= F.col("t1"), "head")
                     .when(F.col("nll") <= F.col("t2"), "middle")
                     .otherwise("tail")))
    return (b.groupBy("lang", "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("nll"), 6).alias("avg_nll")))


@register("doc_split_leakage", sql=f"""
WITH {_TOKS},
s AS (
  SELECT doc_id,
         CASE WHEN {_H64.format(v='doc_id::VARCHAR')} % 100 < 80
              THEN 'train'
              WHEN {_H64.format(v='doc_id::VARCHAR')} % 100 < 90
              THEN 'val' ELSE 'test' END AS split,
         CASE WHEN len(t) >= 5
              THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  || ' ' || t[i+3] || ' ' || t[i+4]
                                  for i in range(1, len(t) - 3)])
              ELSE [] END AS s5
  FROM toks),
ex AS (SELECT DISTINCT split, unnest(s5) AS g FROM s
       WHERE split <> 'val'),
flags AS (
  SELECT g, max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
         max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
  FROM ex GROUP BY 1)
SELECT sum(tr)::BIGINT AS n_train_grams,
       sum(te)::BIGINT AS n_test_grams,
       sum(tr * te)::BIGINT AS n_shared,
       round(sum(tr * te)::DOUBLE / sum(te), 6) AS leak_frac
FROM flags
""")
def doc_split_leakage(spark, sf_dir):
    # Split-leakage QA: after the deterministic hash split, how much
    # 5-gram mass does the test split share with train? The GPT-3-
    # style pre-training health check run BEFORE training (shared
    # n-grams between splits inflate eval scores). Gram-keyed work
    # rides 8-byte md5 hashes; the flag aggregate is map-side combined
    # and gram-count-sized; the final rollup is one row.
    from ..functions.text import hash64, hash_split, ngram_shingles
    docs = load(spark, sf_dir, "documents")
    ex = (docs.select(hash_split("doc_id").alias("split"),
                      F.explode_outer(ngram_shingles("text", 5))
                      .alias("g"))
          .where(F.col("g").isNotNull())
          .filter(F.col("split") != "val")
          .select("split", hash64("g").alias("h"))
          .distinct())
    flags = ex.groupBy("h").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0))
        .alias("tr"),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0))
        .alias("te"))
    return flags.agg(
        F.sum("tr").alias("n_train_grams"),
        F.sum("te").alias("n_test_grams"),
        F.sum(F.col("tr") * F.col("te")).alias("n_shared"),
        F.round(F.sum(F.col("tr") * F.col("te")) /
                F.sum("te").cast("double"), 6).alias("leak_frac"))


@register("doc_incremental_neardup", sql=f"""
WITH {_SIG_CTES},
candh AS (
  SELECT DISTINCT n.doc_id AS nid, hh.doc_id AS hid
  FROM bnd n JOIN bnd hh ON n.band = hh.band AND n.key = hh.key
  WHERE hh.doc_id % 2 = 0),
esth AS (
  SELECT c.nid, c.hid,
         sum(CASE WHEN sn.m = sh2.m THEN 1 ELSE 0 END) AS agree
  FROM candh c
  JOIN sig sn ON sn.doc_id = c.nid
  JOIN sig sh2 ON sh2.doc_id = c.hid AND sh2.i = sn.i
  GROUP BY 1, 2),
rejh AS (SELECT DISTINCT nid AS doc_id FROM esth WHERE agree >= 8),
candb AS (
  SELECT DISTINCT a.doc_id AS aid, b.doc_id AS bid
  FROM bnd a JOIN bnd b ON a.band = b.band AND a.key = b.key
                        AND a.doc_id < b.doc_id),
estb AS (
  SELECT c.aid, c.bid,
         sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS agree
  FROM candb c
  JOIN sig sa ON sa.doc_id = c.aid
  JOIN sig sb ON sb.doc_id = c.bid AND sb.i = sa.i
  GROUP BY 1, 2),
rejb AS (SELECT DISTINCT bid AS doc_id FROM estb WHERE agree >= 8)
SELECT d.doc_id, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM rejh)
  AND d.doc_id NOT IN (SELECT doc_id FROM rejb)
""")
def doc_incremental_neardup(spark, sf_dir):
    # The fuzzy sibling of doc_incremental_ingest: batch 1 (even ids)
    # seeds a persistent MINHASH index; batch 2 (the full corpus)
    # ingests against it — rejected when >= 8/16 signature values
    # agree with a bucket-sharing historical doc, or with a smaller-id
    # batch doc the same way. History's raw text is never re-read;
    # the oracle recomputes signatures, band buckets and agreement
    # counts from scratch in SQL.
    import hashlib
    import tempfile
    docs = load(spark, sf_dir, "documents")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/connectors_spark_mh_index_{tag}"
    _bounded_index_fixture(spark, path)
    dd.build_minhash_index(docs.where(F.col("doc_id") % 2 == 0), path)
    return dd.ingest_neardup(docs, path, threshold=0.5,
                             update_index=False) \
        .select("doc_id", "source")


@register("doc_pagerank_neardup", sql=f"""
WITH {_MINHASH_CTES},
e0 AS (SELECT a_id, b_id FROM ver
       WHERE c::DOUBLE / (za + zb - c) >= 0.8),
sym AS (SELECT a_id AS src, b_id AS dst FROM e0
        UNION
        SELECT b_id AS src, a_id AS dst FROM e0),
deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
n AS (SELECT doc_id AS id FROM documents),
p0 AS (SELECT id, 1.0 AS pr FROM n),
c1 AS (SELECT s.dst AS id, round(p.pr / d.deg, 6) AS c
       FROM sym s JOIN deg d ON d.src = s.src
                  JOIN p0 p ON p.id = s.src),
s1 AS (SELECT id, sum(c) AS t FROM c1 GROUP BY 1),
p1 AS (SELECT n.id, round(0.15 + 0.85 * coalesce(s1.t, 0), 6) AS pr
       FROM n LEFT JOIN s1 USING (id)),
c2 AS (SELECT s.dst AS id, round(p.pr / d.deg, 6) AS c
       FROM sym s JOIN deg d ON d.src = s.src
                  JOIN p1 p ON p.id = s.src),
s2 AS (SELECT id, sum(c) AS t FROM c2 GROUP BY 1),
p2 AS (SELECT n.id, round(0.15 + 0.85 * coalesce(s2.t, 0), 6) AS pr
       FROM n LEFT JOIN s2 USING (id))
SELECT id AS doc_id, pr FROM p2
""")
def doc_pagerank_neardup(spark, sf_dir):
    # Deterministic PageRank (2 power iterations, d=0.85) over the
    # MinHash near-dup graph: hub documents of duplicate clusters
    # surface with high rank, singletons settle at 1-d — a centrality
    # signal for choosing cluster representatives. Ranks stay
    # DISTRIBUTED between iterations (no driver sync beyond the loop
    # counter); the oracle unrolls both iterations in SQL over the
    # same edge construction.
    from ..ops.graph import pagerank
    docs = load(spark, sf_dir, "documents")
    edges = dd.minhash_lsh_pairs(docs, threshold=0.8)
    return pagerank(docs, edges, iters=2)


@register("emb_source_centroid_drift", sql="""
WITH j AS (
  SELECT d.source, e.vec_id, e.embedding
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
u AS (
  SELECT source, vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM j),
cent AS (
  SELECT source, i, round(avg(v), 6) AS c FROM u GROUP BY 1, 2),
dots AS (
  SELECT u.source, u.vec_id, sum(u.v * cent.c) AS dot,
         sum(u.v * u.v) AS na, sum(cent.c * cent.c) AS nc
  FROM u JOIN cent ON cent.source = u.source AND cent.i = u.i
  GROUP BY 1, 2),
sims AS (
  SELECT source, vec_id,
         round(dot / sqrt(na) / sqrt(nc), 6) AS sim
  FROM dots)
SELECT source, count(*)::BIGINT AS n_vectors,
       round(avg(sim), 6) AS avg_sim, round(min(sim), 6) AS min_sim
FROM sims GROUP BY 1
""")
def emb_source_centroid_drift(spark, sf_dir):
    # Cross-table curation signal (documents ⋈ embeddings by id): each
    # source's round-6 centroid, then every member's cosine to it —
    # low avg_sim / min_sim flags sources whose embeddings scatter
    # (noisy or mixed-domain feeds). Plan: one posexplode aggregate
    # for the centroids (map-side combined, sources × dim rows), the
    # tiny centroid-array relation broadcast back, cosines as pure
    # JVM lambda expressions — no Python, no corpus-sized shuffle of
    # vectors beyond the one join to attach sources.
    from ..functions.vectors import cosine_d
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load(spark, sf_dir, "embeddings")
    j = (emb.join(docs, emb["vec_id"] == docs["doc_id"])
         .select("source", "vec_id", "embedding"))
    ex = j.select("source",
                  F.posexplode("embedding").alias("i", "v"))
    cent = (ex.groupBy("source", "i")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c")))
    cent_arr = (cent.groupBy("source")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "c"))),
                    lambda s: s.getField("c")).alias("_cent")))
    scored = (j.join(F.broadcast(cent_arr), "source")
              .select("source",
                      F.round(cosine_d("embedding", "_cent"), 6)
                      .alias("sim")))
    return (scored.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.round(F.avg("sim"), 6).alias("avg_sim"),
                 F.round(F.min("sim"), 6).alias("min_sim")))


@register("doc_stupid_backoff_nll", sql="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
tok AS (
  SELECT doc_id, i.i AS pos, t[i.i + 1] AS w
  FROM toks, LATERAL (SELECT unnest(range(0, len(t))) AS i) i),
lagd AS (
  SELECT doc_id, pos, w,
         lag(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w_p,
         lag(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w_pp
  FROM tok),
tr AS (SELECT * FROM lagd WHERE doc_id % 10 <> 0),
c1 AS (SELECT w, count(*)::DOUBLE AS c FROM tr GROUP BY 1),
nv AS (SELECT sum(c) AS n, count(*)::DOUBLE AS v FROM c1),
c2 AS (SELECT w_p, w, count(*)::DOUBLE AS c FROM tr
       WHERE w_p IS NOT NULL GROUP BY 1, 2),
c3 AS (SELECT w_pp, w_p, w, count(*)::DOUBLE AS c FROM tr
       WHERE w_pp IS NOT NULL GROUP BY 1, 2, 3),
sc AS (
  SELECT l.doc_id, l.pos,
         (coalesce(u.c, 0) + 1) / (nv.n + nv.v) AS su,
         CASE WHEN b.c IS NOT NULL THEN b.c / up.c
              ELSE 0.4 * (coalesce(u.c, 0) + 1) / (nv.n + nv.v)
         END AS sb,
         t3.c AS ct, cb.c AS cctx
  FROM lagd l
  CROSS JOIN nv
  LEFT JOIN c1 u  ON u.w = l.w
  LEFT JOIN c1 up ON up.w = l.w_p
  LEFT JOIN c2 b  ON b.w_p = l.w_p AND b.w = l.w
  LEFT JOIN c2 cb ON cb.w_p = l.w_pp AND cb.w = l.w_p
  LEFT JOIN c3 t3 ON t3.w_pp = l.w_pp AND t3.w_p = l.w_p
                 AND t3.w = l.w),
s AS (
  SELECT doc_id,
         CASE WHEN pos = 0 THEN su
              WHEN pos = 1 THEN sb
              WHEN ct IS NOT NULL THEN ct / cctx
              ELSE 0.4 * sb END AS s,
         CASE WHEN pos >= 2 AND ct IS NULL THEN 1 ELSE 0 END AS bk
  FROM sc)
SELECT doc_id, count(*)::BIGINT AS n_tok,
       round(avg(-ln(s)), 6) AS sb_nll,
       sum(bk)::BIGINT AS n_backoff
FROM s GROUP BY 1
""")
def doc_stupid_backoff_nll(spark, sf_dir):
    # Distributed trigram LM perplexity filter (ops/lm.py): Stupid
    # Backoff (Brants et al. 2007) trained on the doc_id % 10 != 0
    # split, scoring EVERY document — the held-out tenth exercises the
    # full backoff chain (unseen trigram -> bigram -> add-one unigram
    # floor), which is the real CCNet-style quality gate: perplexity
    # under a target-corpus LM plus a backoff-rate coverage signal.
    # Count relations are map-side-combined groupBys; the unigram
    # relation broadcasts (Heaps-bounded), bigram/trigram relations
    # join sort-merge on their gram keys and are never collected.
    from ..ops.lm import stupid_backoff_scores
    return stupid_backoff_scores(load(spark, sf_dir, "documents"),
                                 F.col("doc_id") % 10 != 0)


@register("doc_cdc_dedup_stats", sql="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
tok AS (
  SELECT doc_id, i.i AS pos, t[i.i + 1] AS w
  FROM toks, LATERAL (SELECT unnest(range(0, len(t))) AS i) i),
b AS (
  SELECT doc_id, pos, w,
         CASE WHEN ('0x' || substring(md5(w), 1, 15))::BIGINT % 8 = 0
              THEN 1 ELSE 0 END AS f
  FROM tok),
c AS (
  SELECT doc_id, pos, w,
         coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cid
  FROM b),
ch AS (
  SELECT doc_id, cid, string_agg(w, ' ' ORDER BY pos) AS chunk,
         count(*)::BIGINT AS n_tok
  FROM c GROUP BY 1, 2),
k AS (
  SELECT doc_id, cid, n_tok,
         ('0x' || substring(md5(chunk), 1, 15))::BIGINT AS ck
  FROM ch),
r AS (
  SELECT *, row_number() OVER (PARTITION BY ck
                               ORDER BY doc_id, cid) AS rn
  FROM k)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_chunks,
       sum(n_tok)::BIGINT AS n_tok,
       sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END)::BIGINT AS dup_tok,
       round(sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END)
             / sum(n_tok)::DOUBLE, 6) AS dup_token_ratio
FROM r GROUP BY 1
""")
def doc_cdc_dedup_stats(spark, sf_dir):
    # Content-defined chunking dedup (ops/dedup.py cdc_chunks): chunk
    # boundaries follow token content (hash64(w) % 8 == 0 closes a
    # chunk), so sub-document duplicate detection survives insertions
    # that shift every fixed-width window — the LBFS/FastCDC property
    # fixed chunking lacks. A chunk instance is duplicate when an
    # identical chunk exists at an earlier global (doc_id, cid); the
    # per-doc duplicate-token ratio is the curation signal. All chunk
    # exchanges ride 8-byte md5-derived keys; strings only travel in
    # the doc-keyed reassembly.
    from ..ops.dedup import cdc_dedup_stats
    return cdc_dedup_stats(load(spark, sf_dir, "documents"))


@register("emb_hard_negatives", sql="""
WITH src AS (
  SELECT e.vec_id, d.source, e.embedding
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
u AS (
  SELECT vec_id, source, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM src),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
d AS (
  SELECT uq.vec_id AS qid, uc.vec_id AS cid,
         any_value(uc.source) AS neg_group, sum(uq.v * uc.v) AS dot
  FROM u uq JOIN u uc ON uq.i = uc.i AND uq.source <> uc.source
  WHERE uq.vec_id < 5
  GROUP BY 1, 2),
s AS (
  SELECT qid, cid, neg_group,
         round(dot / nq.nrm / nc.nrm, 6) AS sim
  FROM d JOIN n nq ON nq.vec_id = qid JOIN n nc ON nc.vec_id = cid)
SELECT qid AS query_id, cid AS vec_id, neg_group, sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, cid) AS rank
  FROM s) WHERE rank <= 5
""")
def emb_hard_negatives(spark, sf_dir):
    # Contrastive-training hard negatives (ops/similarity.py
    # hard_negative_topk): per query vector, exact top-5 cosine among
    # vectors from a DIFFERENT source — in-group rows are positives
    # and excluded, so the result is the hardest out-of-group
    # negatives. Bounded query side broadcast as a closure constant;
    # per-partition numpy matmul with local top-k means the ranking
    # window shuffles O(partitions x q x k), never corpus x queries.
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source")
    corpus = emb.join(docs, "vec_id")
    queries = (corpus.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"),
                       "embedding", "source"))
    return sim.hard_negative_topk(corpus, queries, k=5)


@register("doc_neardup_decontaminate", sql=f"""
WITH {_SIG_CTES},
cand AS (
  SELECT DISTINCT t.doc_id AS tid, e.doc_id AS eid
  FROM bnd t JOIN bnd e ON t.band = e.band AND t.key = e.key
  WHERE t.doc_id % 17 <> 0 AND e.doc_id % 17 = 0),
ver AS (
  SELECT tid, eid,
         len(list_intersect(st.s, se.s))::BIGINT AS c,
         len(st.s) AS zt, len(se.s) AS ze
  FROM cand JOIN sh st ON st.doc_id = tid
            JOIN sh se ON se.doc_id = eid)
SELECT tid AS doc_id, count(*)::BIGINT AS n_eval_matches,
       round(max(c::DOUBLE / (zt + ze - c)), 6) AS max_jaccard
FROM ver WHERE c::DOUBLE / (zt + ze - c) >= 0.5
GROUP BY 1
""")
def doc_neardup_decontaminate(spark, sf_dir):
    # Paraphrase-robust decontamination (ops/dedup.py
    # neardup_decontaminate): train docs (doc_id % 17 != 0) whose
    # shingle Jaccard against any pseudo-benchmark doc (doc_id % 17
    # == 0) clears 0.5 — the MinHash complement of the exact n-gram
    # contamination_report. The eval side's band buckets and shingle
    # arrays broadcast (benchmark-sized); the train corpus streams
    # through map-side hash joins and only LSH candidates reach the
    # exact verify.
    docs = load(spark, sf_dir, "documents")
    return dd.neardup_decontaminate(
        docs.filter(F.col("doc_id") % 17 != 0),
        docs.filter(F.col("doc_id") % 17 == 0),
        threshold=0.5)


@register("mm_audio_segments", sql="""
WITH b AS (
  SELECT d.doc_id, bb.b,
         ((d.doc_id + bb.b * bb.b) % 3) <> 0 AS act
  FROM documents d, LATERAL (SELECT unnest(range(0, 5)) AS b) bb),
g AS (
  SELECT doc_id, b, act,
         CASE WHEN act AND (lag(act) OVER w IS DISTINCT FROM true)
              THEN 1 ELSE 0 END AS new_seg
  FROM b WINDOW w AS (PARTITION BY doc_id ORDER BY b)),
s AS (
  SELECT doc_id, b,
         sum(new_seg) OVER (PARTITION BY doc_id ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS sid
  FROM g WHERE act)
SELECT doc_id, (min(b) * 4)::INTEGER AS seg_start,
       ((max(b) + 1) * 4)::INTEGER AS seg_end
FROM s GROUP BY doc_id, sid
""")
def mm_audio_segments(spark, sf_dir):
    # VAD-style audio segmentation (ops/multimodal.py audio_segments):
    # real RIFF/PCM16 decode, 100-sample energy framing, merged runs
    # of active frames. The corpus interleaves exact-silence and tone
    # blocks by a closed-form rule whose adjacent active blocks force
    # REAL merging; the oracle reproduces the merge with a lag/cumsum
    # window over the block arithmetic. The audio-curation primitive
    # behind silence trimming and utterance splitting.
    docs = load(spark, sf_dir, "documents")
    return mm.audio_segments(mm.synth_wav_segments_media(docs))


@register("mm_scene_cuts", sql="""
SELECT d.doc_id, f.f::INTEGER AS cut_idx
FROM documents d, LATERAL (SELECT unnest(range(1, 8)) AS f) f
WHERE (d.doc_id + f.f) % 3 = 0
""")
def mm_scene_cuts(spark, sf_dir):
    # Scene-cut detection (ops/multimodal.py scene_cuts): 8-frame real
    # MJPEG clips whose color changes exactly at the closed-form cut
    # set; Spark must parse the AVI and entropy-decode every frame to
    # find them (within-scene diffs are exactly zero, cut diffs >= 2 —
    # bit-exact block-constant JPEG decode is what makes the threshold
    # crisp). The video-curation primitive behind scene segmentation
    # and keyframe sampling.
    docs = load(spark, sf_dir, "documents")
    return mm.scene_cuts(mm.synth_mjpeg_scenes_media(docs))


@register("mm_mjpeg_frames_real", sql="""
WITH g AS (
  SELECT doc_id, 1 + doc_id % 3 AS nf, 8 * (1 + doc_id % 3) AS w,
         8 * (1 + doc_id % 2) AS h
  FROM documents),
fr AS (
  SELECT g.doc_id, g.w, g.h, f.f
  FROM g, LATERAL (SELECT unnest(range(0, g.nf)) AS f) f),
px AS (
  SELECT fr.doc_id, fr.f, fr.w, fr.h, r.i,
         128 + 2 * (((fr.doc_id * 7 + fr.f * 11
                      + (((r.i // 3) // fr.w) // 8 * (fr.w // 8)
                         + ((r.i // 3) % fr.w) // 8) * 13) % 64)
                    - 32) AS v
  FROM fr, LATERAL (SELECT unnest(range(0, fr.w * fr.h * 3)) AS i) r)
SELECT doc_id, f::INTEGER AS frame_idx, w::INTEGER AS width,
       h::INTEGER AS height,
       sum(v)::BIGINT AS pix_sum, sum((i + 1) * v)::BIGINT AS pix_xsum
FROM px GROUP BY doc_id, f, w, h
""")
def mm_mjpeg_frames_real(spark, sf_dir):
    # REAL Motion-JPEG video decode (ops/videocodec.py '00dc' path →
    # ops/jpegcodec.py): every frame of every AVI is a standalone
    # baseline 4:4:4 JPEG, so Spark runs the RIFF walk PLUS a full
    # entropy decode / dequant / IDCT / YCbCr→RGB per frame; the
    # block-constant even-offset rule makes the lossy codec bit-exact,
    # so the oracle recomputes every pixel from the rule alone. The
    # position-weighted pix_xsum pins frame order, row order and the
    # chroma path simultaneously.
    docs = load(spark, sf_dir, "documents")
    return mm.frame_sample_real(mm.synth_mjpeg_media(docs), every_n=1)


def _ima_steptab_sql() -> str:
    from ..ops.audiocodec import IMA_STEP_TABLE
    return "[" + ", ".join(str(v) for v in IMA_STEP_TABLE) + "]"


@register("mm_adpcm_decode_real", sql=f"""
WITH RECURSIVE
g AS (SELECT doc_id, 2 + doc_id % 3 AS nb FROM documents),
blks AS (SELECT g.doc_id, b.blk
         FROM g, LATERAL (SELECT unnest(range(0, g.nb)) AS blk) b),
st AS (
  SELECT doc_id, blk, 0 AS j,
         (((doc_id * 131 + blk * 4099) % 65536) - 32768)::BIGINT AS pred,
         ((doc_id + 11 * blk) % 89)::BIGINT AS idx
  FROM blks
  UNION ALL
  SELECT doc_id, blk, j + 1,
         greatest(-32768, least(32767,
             CASE WHEN code >= 8 THEN pred - diff
                  ELSE pred + diff END))::BIGINT,
         greatest(0, least(88, idx
             + [-1, -1, -1, -1, 2, 4, 6, 8][(code % 8) + 1]))::BIGINT
  FROM (
    SELECT doc_id, blk, j, pred, idx, code,
           stp // 8 + (code % 2) * (stp // 4)
           + ((code // 2) % 2) * (stp // 2)
           + ((code // 4) % 2) * stp AS diff
    FROM (
      SELECT doc_id, blk, j, pred, idx,
             (doc_id * 7 + blk * 5 + j * j * 3) % 16 AS code,
             {{STEPTAB}}[idx + 1] AS stp
      FROM st WHERE j < 16) q1) q2)
SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
       count(*)::INTEGER AS n_samples,
       sum(pred)::BIGINT AS amp_sum,
       sum(pred * pred)::BIGINT AS amp_sq_sum,
       sum((blk * 17 + j + 1) * pred)::BIGINT AS amp_xsum
FROM st GROUP BY doc_id
""".replace("{STEPTAB}", _ima_steptab_sql()))
def mm_adpcm_decode_real(spark, sf_dir):
    # REAL compressed audio, sequential-state edition: IMA ADPCM (WAV
    # tag 0x11, ~4:1) — unlike the memoryless G.711 step function the
    # decoder carries (predictor, step-index) state across samples, so
    # the oracle replays the IMA step with a recursive CTE (17
    # steps/block) over the corpus's closed-form nibble stream while
    # Spark parses the real RIFF container and runs the real blockwise
    # decoder (step function validated bit-exact against CPython's
    # audioop DVI implementation; low-nibble-first per the IMA WAV
    # layout). amp_xsum is position-weighted across block boundaries,
    # so a block-order or nibble-order bug cannot cancel out.
    docs = load(spark, sf_dir, "documents")
    return mm.decode_audio(mm.synth_adpcm_media(docs))



@register("mm_flac_decode_real", sql="""
WITH g AS (SELECT doc_id,
                  CASE WHEN doc_id % 4 = 2 THEN 2 ELSE 1 END AS ch,
                  300 + doc_id % 257 AS nfr
           FROM documents),
s AS (SELECT g.doc_id, g.ch, g.nfr, r.i,
             ((g.doc_id * 37 + r.i * r.i * 5 + (r.i % 7) * 911)
              % 65536) - 32768 AS v
      FROM g, LATERAL (SELECT unnest(range(0, g.nfr * g.ch)) AS i) r)
SELECT doc_id, 8000 AS sample_rate, ch AS channels,
       (nfr * ch)::INTEGER AS n_samples,
       sum(v)::BIGINT AS amp_sum,
       sum(v * v)::BIGINT AS amp_sq_sum,
       sum((i + 1) * v)::BIGINT AS amp_xsum
FROM s GROUP BY doc_id, ch, nfr
""")
def mm_flac_decode_real(spark, sf_dir):
    # REAL lossless compressed audio: FLAC (per-block best FIXED
    # predictor, Rice residuals, CRC-8/16 verified). Losslessness
    # makes the oracle a direct closed-form recompute — no state
    # replay — while Spark runs genuine Rice decode + polynomial
    # reconstruction; a block-boundary or interleave bug breaks the
    # position-weighted amp_xsum.
    docs = load(spark, sf_dir, "documents")
    return mm.decode_audio(mm.synth_flac_media(docs))


@register("mm_g711_decode_real", sql="""
WITH g AS (SELECT doc_id, 48 + doc_id % 97 AS n FROM documents),
raw AS (
  SELECT g.doc_id, r.i,
         ((g.doc_id * 7919 + r.i * r.i * 31) % 65536) - 32768 AS s
  FROM g, LATERAL (SELECT unnest(range(0, g.n)) AS i) r),
uu AS (
  SELECT doc_id, i, s, floor(s / 4.0)::BIGINT AS p0,
         least(CASE WHEN floor(s / 4.0) < 0 THEN -floor(s / 4.0)
                    ELSE floor(s / 4.0) END::BIGINT, 8159) + 33 AS pc
  FROM raw WHERE doc_id % 2 = 0),
useg AS (
  SELECT doc_id, i, p0, pc,
         CASE WHEN pc <= 63 THEN 0 WHEN pc <= 127 THEN 1
              WHEN pc <= 255 THEN 2 WHEN pc <= 511 THEN 3
              WHEN pc <= 1023 THEN 4 WHEN pc <= 2047 THEN 5
              WHEN pc <= 4095 THEN 6 WHEN pc <= 8191 THEN 7
              ELSE 8 END AS seg
  FROM uu),
ud AS (
  SELECT doc_id, i,
         CASE WHEN p0 < 0 THEN -1 ELSE 1 END
         * (((CASE WHEN seg = 8 THEN 15
                   ELSE (pc // (1 << (seg + 1))) % 16 END * 8 + 132)
             * (1 << CASE WHEN seg = 8 THEN 7 ELSE seg END)) - 132) AS d
  FROM useg),
aa AS (
  SELECT doc_id, i, floor(s / 8.0)::BIGINT AS p0,
         CASE WHEN floor(s / 8.0) >= 0 THEN floor(s / 8.0)
              ELSE -floor(s / 8.0) - 1 END::BIGINT AS pm
  FROM raw WHERE doc_id % 2 = 1),
aseg AS (
  SELECT doc_id, i, p0, pm,
         CASE WHEN pm <= 31 THEN 0 WHEN pm <= 63 THEN 1
              WHEN pm <= 127 THEN 2 WHEN pm <= 255 THEN 3
              WHEN pm <= 511 THEN 4 WHEN pm <= 1023 THEN 5
              WHEN pm <= 2047 THEN 6 ELSE 7 END AS seg
  FROM aa),
amant AS (
  SELECT doc_id, i, p0, seg,
         CASE WHEN seg <= 1 THEN (pm // 2) % 16
              ELSE (pm // (1 << seg)) % 16 END AS mant
  FROM aseg),
ad AS (
  SELECT doc_id, i,
         CASE WHEN p0 >= 0 THEN 1 ELSE -1 END
         * CASE WHEN seg = 0 THEN mant * 16 + 8
                WHEN seg = 1 THEN mant * 16 + 264
                ELSE (mant * 16 + 264) * (1 << (seg - 1)) END AS d
  FROM amant),
dec AS (SELECT * FROM ud UNION ALL SELECT * FROM ad)
SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
       count(*)::INTEGER AS n_samples,
       sum(d)::BIGINT AS amp_sum, sum(d * d)::BIGINT AS amp_sq_sum,
       sum((i + 1) * d)::BIGINT AS amp_xsum
FROM dec GROUP BY doc_id
""")
def mm_g711_decode_real(spark, sf_dir):
    # REAL compressed audio (ops/audiocodec.py G.711): mu-law WAVs for
    # even ids, A-law for odd — full-int16-range samples exercise every
    # companding segment both ways. Spark parses the RIFF container and
    # expands each companded byte through the CCITT algorithm
    # (exhaustively validated against CPython's audioop); the codec is
    # lossy but decode(encode(s)) is a closed-form step function, so
    # the oracle reproduces the decoded samples exactly and the
    # position-weighted amp_xsum pins sample order and sign handling.
    docs = load(spark, sf_dir, "documents")
    return mm.decode_audio(mm.synth_g711_media(docs))


@register("doc_substring_search", sql="""
WITH pats(pattern) AS (VALUES ('fast table'), ('merge batch part'),
                              ('spark a a'), ('zzzz missing'))
SELECT pattern, doc_id,
       ((length(text) - length(replace(text, pattern, '')))
        / length(pattern))::BIGINT AS n_occurrences
FROM documents, pats
WHERE contains(text, pattern)
""")
def doc_substring_search(spark, sf_dir):
    # pg_trgm-shaped literal substring search (ops/ranking.py): a doc
    # can contain a pattern only if it contains every char trigram of
    # it, so candidates come from a trigram equi-join (pattern side
    # broadcast, 8-byte hashed keys) and only candidates get the real
    # contains + occurrence-count verify. The oracle is the brute
    # LIKE-scan the index path must agree with. The persistent
    # bucket-partitioned Delta index variant (partition-pruned probes)
    # is pinned in tests/test_ops_pipeline.py + test_plans.py.
    from ..ops.ranking import substring_search
    return substring_search(
        load(spark, sf_dir, "documents"),
        ["fast table", "merge batch part", "spark a a",
         "zzzz missing"])


@register("doc_corpus_report", sql="""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS t,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents),
d AS (
  SELECT lang, source, count(*)::BIGINT AS n_docs,
         sum(len(t))::BIGINT AS n_tokens,
         round(avg(len(t)), 6) AS avg_len,
         min(len(t))::BIGINT AS min_len, max(len(t))::BIGINT AS max_len,
         (count(*) - count(DISTINCT fp))::BIGINT AS n_exact_dups
  FROM toks GROUP BY 1, 2),
v AS (
  SELECT lang, source, count(DISTINCT w)::BIGINT AS n_types
  FROM (SELECT lang, source, unnest(t) AS w FROM toks) GROUP BY 1, 2)
SELECT d.lang, d.source, d.n_docs, d.n_tokens, d.avg_len, d.min_len,
       d.max_len, d.n_exact_dups, v.n_types,
       round(v.n_types / d.n_tokens::DOUBLE, 6) AS ttr
FROM d JOIN v USING (lang, source)
""")
def doc_corpus_report(spark, sf_dir):
    # Corpus report card — the per-(lang, source) summary a curation
    # run publishes: volume, token-length distribution bounds, exact-
    # duplicate count (md5 fingerprint), vocabulary size and type-token
    # ratio. Two map-side-combined aggregates over one tokenize pass
    # (doc-level stats keyed (lang, source); type counts via one
    # distinct-token aggregate) joined on the tiny group relation —
    # no windows, no self-joins, O(tokens) total.
    from ..functions.text import fingerprint, token_count, tokens
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "lang", "source", fingerprint("text").alias("fp"),
        token_count("text").alias("n"),
        tokens(F.col("text")).alias("t"))
    d = (base.groupBy("lang", "source")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("n").cast("bigint").alias("n_tokens"),
              F.round(F.avg("n"), 6).alias("avg_len"),
              F.min("n").cast("bigint").alias("min_len"),
              F.max("n").cast("bigint").alias("max_len"),
              (F.count(F.lit(1)) - F.countDistinct("fp"))
              .cast("bigint").alias("n_exact_dups")))
    v = (base.select("lang", "source", F.explode_outer("t").alias("w"))
         .where(F.col("w").isNotNull())
         .groupBy("lang", "source")
         .agg(F.countDistinct("w").alias("n_types")))
    return (d.join(v, ["lang", "source"])
            .select("lang", "source", "n_docs", "n_tokens", "avg_len",
                    "min_len", "max_len", "n_exact_dups", "n_types",
                    F.round(F.col("n_types") /
                            F.col("n_tokens").cast("double"), 6)
                    .alias("ttr")))
