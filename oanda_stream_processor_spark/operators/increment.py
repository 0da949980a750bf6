"""Incremental / corpus-management operators — the shapes a production
training-data pipeline runs daily on top of the one-shot dedup family
(operators/dedup.py): dedup a NEW BATCH against an existing index
instead of re-clustering the corpus, profile the source mix, audit
per-source duplication, and sample to a target mix with deterministic
hashing.

All JVM-expression plans (no Python UDFs); every query has a DuckDB
oracle twin. Scale notes per query; the common theme is that the
*batch* side is small relative to the *index* side, and every join is
banded or keyed — never all-pairs, never index-wide shuffles beyond
one keyed exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .helpers import exact_tdiv
from .dedup import (
    HM,
    _BAND_KEYS_SQL,
    _MINHASH_AGGS_SQL,
    _minhash_signature_from_sh,
    _spark_shingle_hashes,
    BAND_ROWS,
    N_BANDS,
    SQL_SHINGLE_HASHES,
)

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# q109 — incremental dedup: the daily-increment shape. The corpus is
# split into an INDEX (doc_id % 10 != 0, the docs "already ingested")
# and a BATCH (doc_id % 10 == 0, "today's crawl"); each batch doc gets
# a verdict: 'exact' (its content hash exists in the index), 'near'
# (shares an LSH band with an index doc but is not an exact copy), or
# 'new'. Production keeps the index's signatures materialized; here
# both sides derive inline from the same corpus so the oracle can see
# identical inputs.
#
# Scale: batch<<index. Exact check = hash equi-join (broadcastable
# batch side). Near check = band-key equi-join of batch bands against
# index bands — candidate generation is banded exactly like q42, and
# the join output is bounded by band collisions, never |batch|x|index|.
# The index never shuffles except on the band key it is already
# bucketed by in a production layout.
# ---------------------------------------------------------------------------
_Q109_SQL = f"""
WITH sig AS (
  SELECT doc_id, {_MINHASH_AGGS_SQL}
  FROM ({SQL_SHINGLE_HASHES}) GROUP BY doc_id),
bands AS (
  SELECT doc_id, {_BAND_KEYS_SQL} FROM sig),
flat AS (
  {' UNION ALL '.join(f'SELECT doc_id, {b} AS band_id, band{b} AS band_key FROM bands'
                      for b in range(N_BANDS))}),
batch AS (SELECT doc_id, MD5(text) AS h FROM documents WHERE doc_id % 10 = 0),
index_h AS (SELECT DISTINCT MD5(text) AS h FROM documents WHERE doc_id % 10 != 0),
near AS (
  SELECT DISTINCT bf.doc_id
  FROM flat bf JOIN flat ix
    ON bf.band_id = ix.band_id AND bf.band_key = ix.band_key
   AND ix.doc_id % 10 != 0
  WHERE bf.doc_id % 10 = 0)
SELECT b.doc_id,
       CASE WHEN i.h IS NOT NULL THEN 'exact'
            WHEN n.doc_id IS NOT NULL THEN 'near'
            ELSE 'new' END AS verdict
FROM batch b
LEFT JOIN index_h i ON b.h = i.h
LEFT JOIN near n ON b.doc_id = n.doc_id
"""


@query("q109_incremental_dedup", _Q109_SQL)
def q109_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 10 == 0

    # exact: batch content hash semi-joined against index hashes
    hashed = d.select("doc_id", is_batch.alias("in_batch"),
                      F.md5(F.col("text").cast("binary")).alias("h"))
    batch = hashed.where("in_batch")
    index_h = hashed.where(~F.col("in_batch")).select("h").distinct()
    exact = (batch.join(index_h, "h", "left_semi")
             .select("doc_id", F.lit(True).alias("is_exact")))

    # near: band keys of batch vs band keys of index (q42's banding,
    # but batch x index instead of self-join)
    sig = _minhash_signature_from_sh(_spark_shingle_hashes(d))
    band_key = [
        F.concat_ws("|", *[F.col(f"h{b * BAND_ROWS + r}").cast("string")
                           for r in range(BAND_ROWS)]).alias(f"band{b}")
        for b in range(N_BANDS)]
    stack_expr = ", ".join(f"{b}, band{b}" for b in range(N_BANDS))
    flat = (sig.select("doc_id", *band_key)
            .selectExpr("doc_id",
                        f"stack({N_BANDS}, {stack_expr}) AS (band_id, band_key)"))
    near = (flat.where(is_batch)
            .join(flat.where(~is_batch).select("band_id", "band_key").distinct(),
                  ["band_id", "band_key"], "left_semi")
            .select("doc_id").distinct()
            .select("doc_id", F.lit(True).alias("is_near")))

    return (batch.select("doc_id")
            .join(exact, "doc_id", "left")
            .join(near, "doc_id", "left")
            .select("doc_id",
                    F.when(F.col("is_exact"), "exact")
                     .when(F.col("is_near"), "near")
                     .otherwise("new").alias("verdict")))


# ---------------------------------------------------------------------------
# q110 — source-mix report: the training-mix dashboard. Per
# (source, lang): doc count, total chars, share of corpus chars (ppm,
# integer — hash-stable), and cumulative ppm in descending-size order.
#
# Scale: one map-side-combinable aggregation; the window runs over the
# aggregated (source x lang) table — bounded by the source/language
# vocabulary (thousands at worst), not by corpus size, so the
# single-partition WindowExec is safe at any corpus size.
# ---------------------------------------------------------------------------
@query("q110_source_mix", """
WITH agg AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source, lang),
tot AS (SELECT SUM(total_chars) AS corpus_chars FROM agg),
j AS (
  SELECT source, lang, n_docs, total_chars, corpus_chars,
         CAST(total_chars AS DECIMAL(38,0)) * 1000000 AS num
  FROM agg CROSS JOIN tot)
SELECT source, lang, n_docs, total_chars,
       CAST((num - num % corpus_chars) / corpus_chars AS BIGINT) AS share_ppm,
       CAST(SUM(num - num % corpus_chars)
              OVER (ORDER BY total_chars DESC, source, lang)
            / corpus_chars AS BIGINT) AS cum_ppm
FROM j
""")
def q110_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    agg = (d.groupBy("source", "lang")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("total_chars")))
    tot = agg.agg(F.sum("total_chars").alias("corpus_chars"))
    j = agg.crossJoin(F.broadcast(tot))
    # integer ppm via explicit floor division (hash-stable across
    # engines; see dedup._idiv rationale). The numerator is widened to
    # DECIMAL(38,0) so chars*1e6 cannot overflow BIGINT (the bare
    # bigint product wraps silently in Spark / errors in DuckDB once
    # the corpus passes ~9.2e12 chars ≈ 9 TB of text); decimal
    # floor-division of an exact multiple is exact in both engines.
    num = F.col("total_chars").cast("decimal(38,0)") * 1_000_000
    ppm_num = num - num % F.col("corpus_chars")
    w = (W.orderBy(F.desc("total_chars"), "source", "lang")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (j.select("source", "lang", "n_docs", "total_chars",
                     (ppm_num / F.col("corpus_chars")).cast("bigint")
                     .alias("share_ppm"),
                     (F.sum(ppm_num).over(w) / F.col("corpus_chars"))
                     .cast("bigint").alias("cum_ppm")))


# ---------------------------------------------------------------------------
# q111 — per-source duplication audit: how much of each source is
# exact-duplicated, and how much of that duplication crosses source
# boundaries (cross-source dups are the expensive kind — they survive
# per-source dedup). dup_ppm is integer parts-per-million.
#
# Scale: two keyed aggregations on the content hash (uniform key) and
# one groupBy source — no joins wider than the hash-group table.
# ---------------------------------------------------------------------------
@query("q111_source_dup_profile", """
WITH h AS (SELECT doc_id, source, MD5(text) AS h FROM documents),
freq AS (
  SELECT h, COUNT(*) AS n_total, COUNT(DISTINCT source) AS n_sources
  FROM h GROUP BY h)
SELECT s.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN f.n_total > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(SUM(CASE WHEN f.n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_source,
       CAST((CAST(SUM(CASE WHEN f.n_total > 1 THEN 1 ELSE 0 END)
                  AS DECIMAL(38,0)) * 1000000
             - (CAST(SUM(CASE WHEN f.n_total > 1 THEN 1 ELSE 0 END)
                     AS DECIMAL(38,0)) * 1000000)
               % COUNT(*)) / COUNT(*) AS BIGINT) AS dup_ppm
FROM h s JOIN freq f ON s.h = f.h
GROUP BY s.source
""")
def q111_source_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = d.select("doc_id", "source",
                 F.md5(F.col("text").cast("binary")).alias("h"))
    freq = (h.groupBy("h")
            .agg(F.count("*").alias("n_total"),
                 F.countDistinct("source").alias("n_sources")))
    j = h.join(freq, "h")
    n_dup = F.sum(F.when(F.col("n_total") > 1, 1).otherwise(0))
    # DECIMAL(38,0) numerator: overflow-proof at any corpus size (q110)
    num = n_dup.cast("decimal(38,0)") * 1_000_000
    return (j.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 n_dup.alias("n_dup_docs"),
                 F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
                  .alias("n_cross_source"),
                 ((num - num % F.count("*")) / F.count("*"))
                 .cast("bigint").alias("dup_ppm")))


# ---------------------------------------------------------------------------
# q112 — quota sampling to a target mix: per language, keep
# floor(n_docs / 20) + 1 docs (a 5%-ish per-language quota with a
# 1-doc floor so rare languages survive — the mixing knob production
# pipelines tune), selected in deterministic md5 order so the "random"
# sample is stable across runs and engines.
#
# Scale: row_number is partitioned BY LANG — per-language sorted
# quota selection, the partition-parallel shape; no global sort. The
# quota derives from a map-side-combinable count broadcast back.
# ---------------------------------------------------------------------------
@query("q112_quota_sample", """
WITH q AS (
  SELECT lang, CAST((COUNT(*) - COUNT(*) % 20) / 20 AS BIGINT) + 1 AS quota
  FROM documents GROUP BY lang),
ranked AS (
  SELECT d.doc_id, d.lang, q.quota,
         ROW_NUMBER() OVER (PARTITION BY d.lang
                            ORDER BY MD5(d.text), d.doc_id) AS rk
  FROM documents d JOIN q ON d.lang = q.lang)
SELECT doc_id, lang, rk AS sample_rank
FROM ranked WHERE rk <= quota
""")
def q112_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n = F.count("*")
    quota = (d.groupBy("lang")
             .agg(((n - n % 20) / 20).cast("bigint").alias("quota")))
    quota = quota.select("lang", (F.col("quota") + 1).alias("quota"))
    w = (W.partitionBy("lang")
         .orderBy(F.md5(F.col("text").cast("binary")), "doc_id"))
    return (d.join(F.broadcast(quota), "lang")
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= F.col("quota"))
            .select("doc_id", "lang", F.col("rk").alias("sample_rank")))


# ---------------------------------------------------------------------------
# q114 — n-gram novelty scoring: data-selection primitive. For each
# batch doc (doc_id % 10 = 0), the fraction of its DISTINCT 3-gram
# shingles not present anywhere in the index (doc_id % 10 != 0) —
# high-novelty docs are the ones worth ingesting; near-zero novelty is
# another near-dup signal, complementary to q109's banding.
#
# Scale: the index's distinct-shingle set aggregates map-side to one
# (uniform int64) key set; the batch joins it per-shingle with a left
# anti/semi split — one keyed exchange each, no all-pairs, and the
# per-doc rollup is map-side combinable. novelty_ppm uses explicit
# floor division (engine-version-proof integer hash).
# ---------------------------------------------------------------------------
@query("q114_ngram_novelty", f"""
WITH shs AS (SELECT DISTINCT doc_id, sh FROM ({SQL_SHINGLE_HASHES})),
index_sh AS (SELECT DISTINCT sh FROM shs WHERE doc_id % 10 != 0),
batch AS (SELECT doc_id, sh FROM shs WHERE doc_id % 10 = 0),
flagged AS (
  SELECT b.doc_id, b.sh,
         CASE WHEN i.sh IS NULL THEN 1 ELSE 0 END AS novel
  FROM batch b LEFT JOIN index_sh i ON b.sh = i.sh)
SELECT doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(novel) AS BIGINT) AS n_novel,
       CAST((CAST(SUM(novel) AS DECIMAL(38,0)) * 1000000
             - (CAST(SUM(novel) AS DECIMAL(38,0)) * 1000000) % COUNT(*))
            / COUNT(*) AS BIGINT) AS novelty_ppm
FROM flagged GROUP BY doc_id
""")
def q114_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    shs = _spark_shingle_hashes(d).distinct()
    is_batch = F.col("doc_id") % 10 == 0
    index_sh = shs.where(~is_batch).select("sh").distinct()
    batch = shs.where(is_batch)
    flagged = (batch.join(index_sh.withColumn("hit", F.lit(1)), "sh", "left")
               .select("doc_id",
                       F.when(F.col("hit").isNull(), 1).otherwise(0)
                        .alias("novel")))
    n, nov = F.count("*"), F.sum("novel")
    # DECIMAL(38,0) numerator: overflow-proof at any corpus size (q110)
    num = nov.cast("decimal(38,0)") * 1_000_000
    return (flagged.groupBy("doc_id")
            .agg(n.alias("n_shingles"), nov.alias("n_novel"),
                 ((num - num % n) / n).cast("bigint").alias("novelty_ppm")))


# ---------------------------------------------------------------------------
# q115 — embedding centroid drift: monitoring op for a growing corpus.
# Split embeddings into snapshot A (vec_id % 2 = 0) and snapshot B
# (vec_id % 2 = 1); per label, the squared L2 distance between the two
# snapshots' centroids — the signal that a label's embedding
# distribution moved between ingests. Exact decimal means (q47's
# pattern) keep the hashes engine-stable; the final distance rounds to
# 6 places on identical double inputs.
#
# Scale: two map-side-combinable (label, pos) mean aggregations and a
# (label, pos)-keyed join of two centroid tables whose size is
# |labels| x dims — independent of corpus row count.
# ---------------------------------------------------------------------------
@query("q115_embedding_drift", """
WITH flat AS (
  SELECT label, vec_id % 2 AS snap,
         UNNEST(RANGE(LEN(embedding))) AS pos,
         UNNEST(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) AS val
  FROM embeddings),
cent AS (
  SELECT label, snap, pos,
         ROUND(CAST(SUM(CAST(val AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*), 6)
           AS c,
         COUNT(*) AS n
  FROM flat GROUP BY label, snap, pos)
SELECT a.label, a.n AS n_a, b.n AS n_b,
       ROUND(SUM((a.c - b.c) * (a.c - b.c)), 6) AS drift_sq
FROM (SELECT * FROM cent WHERE snap = 0) a
JOIN (SELECT * FROM cent WHERE snap = 1) b
  ON a.label = b.label AND a.pos = b.pos
GROUP BY a.label, a.n, b.n
""")
def q115_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    flat = (e.select("label", (F.col("vec_id") % 2).alias("snap"),
                     F.posexplode("embedding").alias("pos", "raw"))
            .select("label", "snap", "pos",
                    F.col("raw").cast("double").alias("val")))
    cent = (flat.groupBy("label", "snap", "pos")
            .agg(F.round(F.sum(F.col("val").cast("decimal(30,12)"))
                          .cast("double") / F.count("*"), 6).alias("c"),
                 F.count("*").alias("n")))
    a = cent.where(F.col("snap") == 0).select(
        "label", "pos", F.col("c").alias("ca"), F.col("n").alias("na"))
    b = cent.where(F.col("snap") == 1).select(
        "label", "pos", F.col("c").alias("cb"), F.col("n").alias("nb"))
    j = a.join(b, ["label", "pos"])
    # na/nb (vectors per label-snap) are constant across pos within a
    # label, so they ride the groupBy key
    d2 = (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
    return (j.groupBy("label", "na", "nb")
            .agg(F.round(F.sum(d2), 6).alias("drift_sq"))
            .select("label", F.col("na").alias("n_a"),
                    F.col("nb").alias("n_b"), "drift_sq"))


# ---------------------------------------------------------------------------
# q116 — deterministic train/val/test split: assign each doc to a split
# by content-hash bucket (md5-prefix bigint % 100: <80 train, <90 val,
# else test) and report the per-(split, lang) counts plus each split's
# integer ppm share. Hash-based assignment is the production pattern:
# stable across runs, machines, and re-ingests (no RNG state), and
# duplicate texts land in the same split so eval can't see training
# copies. The md5-prefix-bigint is the engine-parity digest proven by
# tests/test_cross_engine.py.
#
# Scale: pure projection + one map-side-combinable aggregation; the
# share window runs over the bounded (split x lang) table.
# ---------------------------------------------------------------------------
@query("q116_stratified_split", """
WITH assigned AS (
  SELECT lang,
         CAST('0x' || SUBSTR(MD5(text), 1, 15) AS BIGINT) % 100 AS bucket
  FROM documents),
labeled AS (
  SELECT lang, CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
  FROM assigned),
agg AS (SELECT split, lang, COUNT(*) AS n_docs FROM labeled
        GROUP BY split, lang),
tot AS (SELECT SUM(n_docs) AS n_total FROM agg)
SELECT split, lang, n_docs,
       CAST((CAST(n_docs AS DECIMAL(38,0)) * 1000000
             - (CAST(n_docs AS DECIMAL(38,0)) * 1000000) % n_total) / n_total
            AS BIGINT) AS share_ppm
FROM agg CROSS JOIN tot
""")
def q116_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 15),
                     16, 10).cast("bigint") % 100)
    labeled = d.select(
        "lang",
        F.when(bucket < 80, "train").when(bucket < 90, "val")
         .otherwise("test").alias("split"))
    agg = (labeled.groupBy("split", "lang")
           .agg(F.count("*").alias("n_docs")))
    tot = agg.agg(F.sum("n_docs").alias("n_total"))
    # DECIMAL(38,0) numerator: overflow-proof at any corpus size (q110)
    num = F.col("n_docs").cast("decimal(38,0)") * 1_000_000
    return (agg.crossJoin(F.broadcast(tot))
            .select("split", "lang", "n_docs",
                    ((num - num % F.col("n_total")) / F.col("n_total"))
                    .cast("bigint").alias("share_ppm")))


# ---------------------------------------------------------------------------
# q122 — per-source token-distribution drift: KL(P_source || P_corpus)
# over the unigram distribution — the monitoring primitive that tells a
# corpus curator WHICH ingest source moved away from the blend (q115 is
# the embedding-space analog; this is the token-space one).
#
# Cross-engine determinism (q93 pattern): each term's ln(p/q) is frozen
# to fixed-point bigint (round(ln * 1e6)) BEFORE the weighted sum, and
# the weighted sum accumulates CAST(c_st AS DECIMAL(38,0)) * ln_fp —
# exact integer arithmetic that neither wraps (q110 lesson: bigint
# would overflow once source-token-count * ln_fp passes ~9.2e18, i.e.
# corpus scale) nor depends on summation order.
#
# Scale: token explode is corpus-linear; the corpus vocab aggregate is
# map-side combinable and vocab grows ~log(corpus) -> broadcast join
# onto the per-source counts; per-source totals are a tiny broadcast.
# One wide shuffle (the per-(source, token) groupBy) total.
# ---------------------------------------------------------------------------
@query("q122_token_kl_drift", """
WITH tok AS (
  SELECT source, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))
           AS token
  FROM documents),
st AS (SELECT source, token, COUNT(*) AS c_st FROM tok GROUP BY source, token),
ct AS (SELECT token, COUNT(*) AS c_t FROM tok GROUP BY token),
ns AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY source),
tot AS (SELECT SUM(c_t) AS n FROM ct),
terms AS (
  SELECT s.source, x.n_s, s.c_st,
         CAST(ROUND(LN((CAST(s.c_st AS DOUBLE) * t.n)
                       / (CAST(x.n_s AS DOUBLE) * c.c_t)) * 1000000)
              AS BIGINT) AS ln_fp
  FROM st s
  JOIN ct c USING (token)
  JOIN ns x USING (source)
  CROSS JOIN tot t)
SELECT source, CAST(n_s AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
       ROUND(SUM(CAST(c_st AS DECIMAL(38,0)) * ln_fp)
             / (n_s * 1000000.0), 6) AS kl_nats
FROM terms GROUP BY source, n_s
""")
def q122_token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    tok = d.select("source", F.explode(toks).alias("token"))
    st = tok.groupBy("source", "token").agg(F.count("*").alias("c_st"))
    ct = tok.groupBy("token").agg(F.count("*").alias("c_t"))
    ns = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    tot = ct.agg(F.sum("c_t").alias("n"))
    # identical operand order to the oracle: (c_st * n) / (n_s * c_t)
    ln_fp = F.round(
        F.log((F.col("c_st").cast("double") * F.col("n"))
              / (F.col("n_s").cast("double") * F.col("c_t"))) * 1_000_000
    ).cast("bigint")
    # ct is vocabulary cardinality — unhinted (see curation.q93), AQE
    # decides; ns (one row per source) and tot (one row) stay hinted
    terms = (st.join(ct, "token")
               .join(F.broadcast(ns), "source")
               .crossJoin(F.broadcast(tot))
               .select("source", "n_s", "c_st", ln_fp.alias("ln_fp")))
    kl = (F.sum(F.col("c_st").cast("decimal(38,0)") * F.col("ln_fp"))
          / (F.col("n_s") * 1_000_000.0))
    return (terms.groupBy("source", "n_s")
            .agg(F.count("*").alias("n_distinct"),
                 F.round(kl, 6).alias("kl_nats"))
            .select(F.col("source"), F.col("n_s").alias("n_tokens"),
                    "n_distinct", "kl_nats"))


# ---------------------------------------------------------------------------
# q130 — effective training-token budget per source: how many tokens
# each source contributes BEFORE and AFTER exact dedup, with duplicate
# tokens attributed to the canonical copy's source (corpus-wide
# min-doc_id per content digest — q40's canonical rule). This is the
# number a data-mixture planner actually budgets with: q110 reports raw
# char shares, q111 reports dup RATES; this reports surviving TOKENS.
#
# Scale: one md5-keyed groupBy (uniform key, no skew) for canonicals,
# one semi-join back (digest equi-join), two map-side-combinable
# per-source aggs. effective_ppm uses the DECIMAL(38,0) numerator +
# explicit floor-divide (q110's overflow-proof, version-proof pattern).
# ---------------------------------------------------------------------------
@query("q130_effective_tokens", """
WITH d AS (
  SELECT doc_id, source, MD5(text) AS dig,
         LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_tok
  FROM documents),
canon AS (SELECT dig, MIN(doc_id) AS keep_id FROM d GROUP BY dig),
kept AS (
  SELECT d.source, COUNT(*) AS kept_docs,
         CAST(SUM(d.n_tok) AS BIGINT) AS kept_tokens
  FROM d JOIN canon c ON d.doc_id = c.keep_id
  GROUP BY d.source),
tot AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens
  FROM d GROUP BY source)
SELECT t.source, t.n_docs, t.total_tokens,
       COALESCE(k.kept_docs, 0) AS kept_docs,
       COALESCE(k.kept_tokens, 0) AS kept_tokens,
       CAST((CAST(COALESCE(k.kept_tokens, 0) AS DECIMAL(38,0)) * 1000000
             - (CAST(COALESCE(k.kept_tokens, 0) AS DECIMAL(38,0)) * 1000000)
               % t.total_tokens) / t.total_tokens AS BIGINT)
         AS effective_ppm
FROM tot t LEFT JOIN kept k ON t.source = k.source
""")
def q130_effective_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    d = doc.select(
        "doc_id", "source",
        F.md5(F.col("text").cast("binary")).alias("dig"),
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
            .cast("long").alias("n_tok"))
    canon = d.groupBy("dig").agg(F.min("doc_id").alias("keep_id"))
    kept = (d.join(canon, d["doc_id"] == canon["keep_id"], "left_semi")
            .groupBy("source")
            .agg(F.count("*").alias("kept_docs"),
                 F.sum("n_tok").alias("kept_tokens")))
    tot = (d.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tok").alias("total_tokens")))
    j = (tot.join(kept, "source", "left")
         .select("source", "n_docs", "total_tokens",
                 F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
                 F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens")))
    num = F.col("kept_tokens").cast("decimal(38,0)") * 1_000_000
    return j.select(
        "source", "n_docs", "total_tokens", "kept_docs", "kept_tokens",
        ((num - num % F.col("total_tokens")) / F.col("total_tokens"))
            .cast("bigint").alias("effective_ppm"))


# ---------------------------------------------------------------------------
# q135 — temporal split with leakage audit: the time-based counterpart
# of q116's hash split (train = events before the cutoff, test = at or
# after), plus the number that decides whether the split is USABLE:
# how many users appear on BOTH sides (cross-boundary users leak
# user-level signal into eval). The cutoff is data-derived (the 80th
# percentile event, taken as an exact ordered offset, not an
# interpolated percentile — integer row arithmetic both engines agree
# on). Integer-only output.
#
# Scale: one pass for the cutoff (a count + an ordered LIMIT/OFFSET
# over ts — at cluster scale swap in the q108 GK sketch for the
# offset scan, same trade documented for q33), one map-side-combinable
# per-side user distinct, one semi-join for the leak set. No windows
# over the raw log.
# ---------------------------------------------------------------------------
SPLIT_PCT = 80

@query("q135_temporal_split", f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
n AS (SELECT COUNT(*) AS n_total FROM ev),
ordered AS (
  SELECT ts, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn FROM ev),
cut AS (
  SELECT ts AS cutoff FROM ordered CROSS JOIN n
  WHERE rn = CAST((n_total * {SPLIT_PCT}
                   - (n_total * {SPLIT_PCT}) % 100) / 100 AS BIGINT) + 1),
sides AS (
  SELECT CASE WHEN e.ts < c.cutoff THEN 'train' ELSE 'test' END AS split,
         e.user_id, e.event_id
  FROM ev e CROSS JOIN cut c),
leak AS (
  SELECT COUNT(DISTINCT a.user_id) AS n_leaked FROM
    (SELECT DISTINCT user_id FROM sides WHERE split = 'train') a
    JOIN (SELECT DISTINCT user_id FROM sides WHERE split = 'test') b
      ON a.user_id = b.user_id)
SELECT split, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       (SELECT n_leaked FROM leak) AS n_leaked_users
FROM sides GROUP BY split
""")
def q135_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()
    offset = (n_total * SPLIT_PCT) // 100
    # exact ordered-offset cutoff: TakeOrdered(offset+1) then last —
    # at cluster scale the q108 GK sketch replaces this scan (q33 trade)
    cutoff = (ev.select("ts", "event_id")
              .orderBy("ts", "event_id").limit(offset + 1)
              .orderBy(F.desc("ts"), F.desc("event_id")).limit(1)
              .select("ts"))
    sides = (ev.crossJoin(F.broadcast(cutoff.withColumnRenamed("ts", "cutoff")))
             .select(F.when(F.col("ts") < F.col("cutoff"), "train")
                     .otherwise("test").alias("split"),
                     "user_id"))
    train_u = (sides.where(F.col("split") == "train")
               .select("user_id").distinct())
    test_u = (sides.where(F.col("split") == "test")
              .select("user_id").distinct())
    # leak count stays in-plan: a 1-row aggregate broadcast onto the
    # 2-row result (no second driver action)
    leak = (train_u.join(test_u, "user_id", "left_semi")
            .agg(F.count("*").alias("n_leaked_users")))
    return (sides.groupBy("split")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"))
            .crossJoin(F.broadcast(leak)))


# ---------------------------------------------------------------------------
# q136 — Bloom pre-filter for incremental dedup: compress the INDEX
# side's shingle set (q114's split: doc_id % 10 != 0 = ingested corpus,
# % 10 == 0 = today's batch) into a BLOOM_BITS-bit filter materialized
# as <=8192 (word, bits) bigint rows via BIT_OR aggregation, probe every
# batch shingle against it, and report what the filter would save:
# probes, Bloom-positives, true hits (exact semi-join ground truth),
# and the false-positive ppm.
#
# Why it matters at 100 TB: streaming/incremental.py joins every batch
# against the full shingle index — a shuffle whose index side is
# corpus-sized. A Bloom filter is ~KB of broadcast state that discards
# most novel shingles BEFORE that shuffle (only Bloom-positives join);
# this query measures the discard rate and FP tax on real data.
# Deterministic affine hashes (q132's family) -> integer-only output,
# no rounding discipline needed.
#
# Scale: filter build = one map-side-combinable BIT_OR groupBy over
# <=8192 word keys; probe = broadcast join of the 8192-row bitset onto the
# batch shingle stream; ground truth = one hash equi-join (the thing
# the filter exists to shrink).
# ---------------------------------------------------------------------------
# The filter is sized FROM THE DATA: bits = max(10 * |index shingles|,
# 4096) — ~1% FP at k=3 regardless of corpus size (a fixed width
# saturates the moment the index outgrows it; the 10x scale sweep
# showed exactly that failure before this sizing). 32-bit words keep
# 1<<bit <= 1<<31 — no 1<<63 sign-bit overflow in either engine.
BLOOM_BITS_PER_KEY = 10
BLOOM_MIN_BITS = 4096
BLOOM_K = 3
_BLOOM_AFFINE = [(2 * ((k * 32_452_843 + 15_485_863) % (HM // 2)) + 1,
                  (k * 49_979_687 + 24_036_583) % HM)
                 for k in range(BLOOM_K)]


def _bloom_pos_sql(k: int) -> str:
    a, b = _BLOOM_AFFINE[k]
    return f"((sh * {a} + {b}) % {HM}) % m.bits"


@query("q136_bloom_prefilter", f"""
WITH sh_all AS ({SQL_SHINGLE_HASHES}),
index_sh AS (SELECT DISTINCT sh FROM sh_all WHERE doc_id % 10 != 0),
batch_sh AS (SELECT DISTINCT sh FROM sh_all WHERE doc_id % 10 = 0),
m AS (SELECT GREATEST(COUNT(*) * {BLOOM_BITS_PER_KEY}, {BLOOM_MIN_BITS})
        AS bits FROM index_sh),
positions AS (
  {' UNION ALL '.join(f'SELECT sh, {_bloom_pos_sql(k)} AS pos FROM index_sh CROSS JOIN m'
                      for k in range(BLOOM_K))}),
bitset AS (
  SELECT CAST((pos - pos % 32) / 32 AS BIGINT) AS word,
         BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
  FROM positions GROUP BY 1),
probe AS (
  {' UNION ALL '.join(f'SELECT sh, {k} AS k, {_bloom_pos_sql(k)} AS pos FROM batch_sh CROSS JOIN m'
                      for k in range(BLOOM_K))}),
hits AS (
  SELECT p.sh,
         MIN(CASE WHEN (b.bits >> CAST(p.pos % 32 AS INTEGER)) & 1 = 1
                  THEN 1 ELSE 0 END) AS bloom_hit
  FROM probe p LEFT JOIN bitset b
    ON b.word = CAST((p.pos - p.pos % 32) / 32 AS BIGINT)
  GROUP BY p.sh),
truth AS (
  SELECT h.sh, h.bloom_hit,
         CASE WHEN i.sh IS NOT NULL THEN 1 ELSE 0 END AS true_hit
  FROM hits h LEFT JOIN index_sh i ON h.sh = i.sh)
SELECT COUNT(*) AS n_probes,
       CAST(SUM(bloom_hit) AS BIGINT) AS n_bloom_pos,
       CAST(SUM(true_hit) AS BIGINT) AS n_true_hits,
       CAST(SUM(CASE WHEN bloom_hit = 1 AND true_hit = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN bloom_hit = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_filtered,
       CAST((SUM(CASE WHEN bloom_hit = 1 AND true_hit = 0 THEN 1 ELSE 0 END)
             * 1000000
             - (SUM(CASE WHEN bloom_hit = 1 AND true_hit = 0
                         THEN 1 ELSE 0 END) * 1000000) % COUNT(*))
            / COUNT(*) AS BIGINT) AS fp_ppm
FROM truth
""")
def q136_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plan note: ONE pass over the shingle chain computes both
    memberships — groupBy(sh) with in_index/in_batch flags, eagerly
    checkpointed — so the index bitset, the probe stream, AND the
    ground truth all read the same materialized frame (the oracle's
    index_sh/batch_sh CTEs + semi-join, fused). true_hit is the
    in_index flag on the probe row itself: the ground-truth equi-join
    costs nothing beyond the one shingle shuffle."""
    from .dedup import _spark_shingle_hashes
    d = load_table(spark, sf_dir, "documents")
    sh_all = _spark_shingle_hashes(d)
    flags = (sh_all.groupBy("sh")
             .agg(F.max(F.when(F.col("doc_id") % 10 != 0, 1).otherwise(0))
                   .alias("in_index"),
                  F.max(F.when(F.col("doc_id") % 10 == 0, 1).otherwise(0))
                   .alias("in_batch"))
             .localCheckpoint(eager=True))
    index_sh = flags.where(F.col("in_index") == 1)
    batch_sh = flags.where(F.col("in_batch") == 1)

    nbits = index_sh.agg(
        F.greatest(F.count("*") * BLOOM_BITS_PER_KEY,
                   F.lit(BLOOM_MIN_BITS)).alias("bits"))

    def pos(k: int) -> F.Column:
        a, b = _BLOOM_AFFINE[k]
        return ((F.col("sh") * a + b) % HM) % F.col("bits")

    pos_arr = F.array(*[pos(k) for k in range(BLOOM_K)])
    positions = (index_sh.crossJoin(F.broadcast(nbits))
                 .select(F.explode(pos_arr).alias("pos")))
    bitset = (positions
              .select((F.col("pos") / 32).cast("bigint").alias("word"),
                      F.expr("shiftleft(cast(1 as bigint), "
                             "cast(pos % 32 as int))").alias("bit"))
              .groupBy("word").agg(F.bit_or("bit").alias("bits")))
    probe = (batch_sh.crossJoin(F.broadcast(nbits))
             .select("sh", F.col("in_index").alias("true_hit"),
                     F.explode(pos_arr).alias("pos")))
    hit = F.when(
        F.expr("shiftright(bits, cast(pos % 32 as int)) & 1") == 1,
        1).otherwise(0)
    truth = (probe.join(F.broadcast(bitset),
                        (F.col("pos") / 32).cast("bigint") == F.col("word"),
                        "left")
             .groupBy("sh", "true_hit").agg(F.min(hit).alias("bloom_hit")))
    fp = F.sum(F.when((F.col("bloom_hit") == 1)
                      & (F.col("true_hit") == 0), 1).otherwise(0))
    n = F.count("*")
    # DECIMAL(38,0) before *1e6 (the q110 lesson): probe counts are
    # corpus-scale
    num = fp.cast("decimal(38,0)") * 1_000_000
    return truth.agg(
        n.alias("n_probes"),
        F.sum("bloom_hit").alias("n_bloom_pos"),
        F.sum("true_hit").alias("n_true_hits"),
        fp.alias("n_false_pos"),
        F.sum(F.when(F.col("bloom_hit") == 0, 1).otherwise(0))
            .alias("n_filtered"),
        exact_tdiv(num, n).alias("fp_ppm"))


# ---------------------------------------------------------------------------
# q143 — source-mix reweighting plan: compute, per source, the sampling
# rate that downsamples every source to the SMALLEST source's volume
# (uniform mix without upsampling) and the epoch multiplier that
# upsamples every source to the LARGEST (uniform mix with repetition) —
# the two endpoints a training-mix designer interpolates between.
# rate_ppm / kept_chars / epochs_fp2 are integer fixed-point via the
# q110 floor-division pattern (DECIMAL(38,0) numerators), so the plan
# hashes identically on both engines at any corpus size.
#
# Scale (100 TB): one map-side-combinable groupBy(source) over the
# corpus, then a 1-row global agg broadcast back onto the per-source
# rows — no shuffle of the big side beyond the first keyed agg, and
# the per-source frame is tiny (sources number in the hundreds).
# ---------------------------------------------------------------------------
@query("q143_mix_reweight", """
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source),
bounds AS (
  SELECT MIN(total_chars) AS floor_chars, MAX(total_chars) AS cap_chars
  FROM per_src)
SELECT source, n_docs, total_chars,
       CAST((CAST(floor_chars AS DECIMAL(38,0)) * 1000000
             - (CAST(floor_chars AS DECIMAL(38,0)) * 1000000) % total_chars)
            / total_chars AS BIGINT) AS rate_ppm,
       CAST((CAST(total_chars AS DECIMAL(38,0))
               * CAST((CAST(floor_chars AS DECIMAL(38,0)) * 1000000
                       - (CAST(floor_chars AS DECIMAL(38,0)) * 1000000)
                         % total_chars) / total_chars AS BIGINT)
             - (CAST(total_chars AS DECIMAL(38,0))
               * CAST((CAST(floor_chars AS DECIMAL(38,0)) * 1000000
                       - (CAST(floor_chars AS DECIMAL(38,0)) * 1000000)
                         % total_chars) / total_chars AS BIGINT)) % 1000000)
            / 1000000 AS BIGINT) AS kept_chars,
       CAST((CAST(cap_chars AS DECIMAL(38,0)) * 100
             - (CAST(cap_chars AS DECIMAL(38,0)) * 100) % total_chars)
            / total_chars AS BIGINT) AS epochs_fp2
FROM per_src CROSS JOIN bounds
""")
def q143_mix_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_src = (d.groupBy("source")
                .agg(F.count("*").alias("n_docs"),
                     F.sum("n_chars").alias("total_chars")))
    bounds = per_src.agg(F.min("total_chars").alias("floor_chars"),
                         F.max("total_chars").alias("cap_chars"))
    j = per_src.crossJoin(F.broadcast(bounds))

    def _fdiv(num, den):
        return ((num - num % den) / den).cast("bigint")

    rate_num = F.col("floor_chars").cast("decimal(38,0)") * 1_000_000
    rate_ppm = _fdiv(rate_num, F.col("total_chars"))
    kept_num = F.col("total_chars").cast("decimal(38,0)") * rate_ppm
    kept_chars = _fdiv(kept_num, F.lit(1_000_000))
    ep_num = F.col("cap_chars").cast("decimal(38,0)") * 100
    epochs_fp2 = _fdiv(ep_num, F.col("total_chars"))
    return j.select("source", "n_docs", "total_chars",
                    rate_ppm.alias("rate_ppm"),
                    kept_chars.alias("kept_chars"),
                    epochs_fp2.alias("epochs_fp2"))


# ---------------------------------------------------------------------------
# q160/q161 — incremental connected-components, ORACLE-GATED: the
# batch/oracle twins of `streaming/incremental.build_component_index +
# incremental_component_updates` (see that module's block comment for
# the production union-find-applier shape). The corpus splits q109's
# way (doc_id % 10: index vs today's batch); q160 emits each batch
# doc's assigned component REFERENCE — min over its batch-connected
# group of {batch ids} ∪ {matched index component ids} — and q161 the
# merge events (group label absorbs every other matched index
# component). Both are pure fixpoints (min reachable id), so DuckDB
# computes them with recursive-CTE closures over the SAME band graph:
# index-side components, batch-side connectivity groups, and the
# matched-component join — no dependence on Spark's propagation order.
#
# Scale: identical joins to q109 (banded, candidate-bounded) plus the
# q55 loop over the index (one-time build) and over the micro-batch
# subgraph (tiny). Nothing here shuffles more than the labeled band
# index once.
# ---------------------------------------------------------------------------
_INC_COMP_SQL = f"""
sig AS (
  SELECT doc_id, {_MINHASH_AGGS_SQL}
  FROM ({SQL_SHINGLE_HASHES}) GROUP BY doc_id),
bands AS (
  SELECT doc_id, {_BAND_KEYS_SQL} FROM sig),
flat AS (
  {' UNION ALL '.join(f'SELECT doc_id, {b} AS band_id, band{b} AS band_key FROM bands'
                      for b in range(N_BANDS))}),
ipairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM flat a JOIN flat b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  WHERE a.doc_id % 10 != 0 AND b.doc_id % 10 != 0),
iedges(src, dst) AS (
  SELECT doc_a, doc_b FROM ipairs UNION ALL SELECT doc_b, doc_a FROM ipairs),
ireach(doc, r) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id % 10 != 0
  UNION
  SELECT e.dst, ireach.r FROM ireach JOIN iedges e ON ireach.doc = e.src),
icomp AS (SELECT doc AS doc_id, MIN(r) AS component FROM ireach GROUP BY doc),
ibands AS (
  SELECT DISTINCT f.band_id, f.band_key, c.component
  FROM flat f JOIN icomp c USING (doc_id)),
matched AS (
  SELECT DISTINCT bf.doc_id, ib.component
  FROM flat bf JOIN ibands ib
    ON bf.band_id = ib.band_id AND bf.band_key = ib.band_key
  WHERE bf.doc_id % 10 = 0),
bpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM flat a JOIN flat b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 = 0),
bedges(src, dst) AS (
  SELECT doc_a, doc_b FROM bpairs UNION ALL SELECT doc_b, doc_a FROM bpairs),
breach(doc, r) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id % 10 = 0
  UNION
  SELECT e.dst, breach.r FROM breach JOIN bedges e ON breach.doc = e.src),
bgrp AS (SELECT doc AS doc_id, MIN(r) AS grp FROM breach GROUP BY doc),
seedmin AS (
  SELECT g.grp, MIN(LEAST(g.doc_id, COALESCE(m.component, g.doc_id)))
           AS label
  FROM bgrp g LEFT JOIN matched m USING (doc_id) GROUP BY g.grp)
"""


@query("q160_incremental_components", f"""
WITH RECURSIVE
{_INC_COMP_SQL}
SELECT g.doc_id, s.label AS component
FROM bgrp g JOIN seedmin s USING (grp)
""")
def q160_incremental_components(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from ..streaming.incremental import (
        build_component_index, incremental_component_updates)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _, lbl_bands = build_component_index(
        docs.where(F.col("doc_id") % 10 != 0))
    assignments, _ = incremental_component_updates(
        docs.where(F.col("doc_id") % 10 == 0), lbl_bands)
    return assignments


@query("q161_component_merge_events", f"""
WITH RECURSIVE
{_INC_COMP_SQL}
SELECT DISTINCT s.label AS component_keep,
       m.component AS component_absorb
FROM bgrp g
JOIN seedmin s USING (grp)
JOIN matched m USING (doc_id)
WHERE m.component <> s.label
""")
def q161_component_merge_events(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from ..streaming.incremental import (
        build_component_index, incremental_component_updates)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _, lbl_bands = build_component_index(
        docs.where(F.col("doc_id") % 10 != 0))
    _, merges = incremental_component_updates(
        docs.where(F.col("doc_id") % 10 == 0), lbl_bands)
    return merges
