"""Corpus-curation operators (north-star extension; SURVEY.md §2.2
'LLM-pipeline extensions', third batch).

The quality/safety gates a 100 TB pretraining pipeline runs before
tokenization: Gopher/C4-style repetition filters, benchmark-
contamination detection via n-gram overlap, greedy sequence packing
into fixed token budgets, and a recursive-CTE hierarchy walk (Spark
4.x `WITH RECURSIVE`). All pure built-in expressions — zero Python
UDFs — with DuckDB oracle twins.

Scale notes (100 TB):
* repetition filter — pure per-row projection (array HOFs compute the
  bigram set in-place); NO shuffle anywhere. The cheapest possible
  shape: runs at scan speed, pushes column pruning to the reader.
* contamination — the benchmark gram set is tiny relative to the
  corpus (benchmarks are MBs, corpora are TBs): distinct-reduce it,
  then BROADCAST it; the corpus side streams through a broadcast hash
  join with no big-side shuffle. Gram hashes are the same base-131/137
  polynomial ints the dedup family uses (no digest machinery).
* packing — one window per (lang) partition ordered by doc_id (the
  shuffle key is the stratum, uniform), then a map-side-combinable
  groupBy on (lang, pack_id). At 100 TB the window partitions by the
  stratum key and each stratum streams in sorted order — no global
  sort, no driver state.
* hierarchy walk — recursion depth is the number of key digits
  (log10 n: 7 levels at 10M customers); each level is one
  self-union; Spark's recursive CTE executes it as an iterative
  union with AQE sizing each step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .helpers import exact_tdiv
from .dedup import HB, HM, SB, SQL_TOKS
from .llmprep import SQL_TOKS as SQL_TOKS_LANG  # includes the lang column

QUERIES: dict = {}
ORACLES: dict = {}

CONTAM_GRAM = 5       # token n-gram width for contamination checks
BENCH_MOD = 97        # doc_id % BENCH_MOD == 0 -> "benchmark" member
PACK_BUDGET = 256     # tokens per training sequence (packing bin)
MAX_DUP_BIGRAM = 0.20  # repetition-filter thresholds (Gopher-style)
MIN_CHARS_PER_TOK = 3.0
MAX_CHARS_PER_TOK = 12.0


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# q79 — Gopher/C4-style repetition + length quality filter.
# Per-document: token count, duplicate-token fraction, duplicate-bigram
# fraction, chars-per-token; `keep` applies the standard thresholds.
# Everything is a per-row array expression: zero shuffles.
# ---------------------------------------------------------------------------
@query("q79_repetition_filter", f"""
WITH t AS (
  SELECT doc_id, toks, n_chars FROM (
    SELECT doc_id, n_chars,
           LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS toks
    FROM documents) WHERE LEN(toks) >= 2),
m AS (
  SELECT doc_id,
         LEN(toks) AS n_tokens,
         LEN(LIST_DISTINCT(toks)) AS n_unique,
         LEN(LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(toks)),
             i -> LIST_EXTRACT(toks, i) || ' ' || LIST_EXTRACT(toks, i + 1))))
           AS n_unique_bigrams,
         n_chars FROM t)
SELECT doc_id, n_tokens,
       ROUND(1.0 - n_unique / CAST(n_tokens AS DOUBLE), 4) AS dup_token_frac,
       ROUND(1.0 - n_unique_bigrams / CAST(n_tokens - 1 AS DOUBLE), 4)
         AS dup_bigram_frac,
       ROUND(n_chars / CAST(n_tokens AS DOUBLE), 4) AS chars_per_tok,
       (1.0 - n_unique_bigrams / CAST(n_tokens - 1 AS DOUBLE)
          <= {MAX_DUP_BIGRAM}
        AND n_chars / CAST(n_tokens AS DOUBLE) >= {MIN_CHARS_PER_TOK}
        AND n_chars / CAST(n_tokens AS DOUBLE) <= {MAX_CHARS_PER_TOK})
         AS keep
FROM m
""")
def q79_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = (d.select("doc_id", "n_chars", toks.alias("toks"))
         .where(F.size("toks") >= 2))
    bigrams = F.zip_with(
        F.slice("toks", 1, F.size("toks") - 1),
        F.slice("toks", 2, F.size("toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b))
    m = t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_unique"),
        F.size(F.array_distinct(bigrams)).alias("n_unique_bigrams"),
        "n_chars")
    dup_tok = 1.0 - F.col("n_unique") / F.col("n_tokens").cast("double")
    dup_big = (1.0 - F.col("n_unique_bigrams")
               / (F.col("n_tokens") - 1).cast("double"))
    cpt = F.col("n_chars") / F.col("n_tokens").cast("double")
    return m.select(
        "doc_id", "n_tokens",
        F.round(dup_tok, 4).alias("dup_token_frac"),
        F.round(dup_big, 4).alias("dup_bigram_frac"),
        F.round(cpt, 4).alias("chars_per_tok"),
        ((dup_big <= MAX_DUP_BIGRAM)
         & (cpt >= MIN_CHARS_PER_TOK)
         & (cpt <= MAX_CHARS_PER_TOK)).alias("keep"))


# ---------------------------------------------------------------------------
# q80 — benchmark-contamination check: which corpus documents share
# CONTAM_GRAM-token n-grams with the "benchmark" subset
# (doc_id % BENCH_MOD == 0 stands in for an eval set). Gram identity is
# the dedup family's polynomial hash chain: one char-fold per token,
# then a SB-base fold across the n-gram — pure int64 arithmetic.
# ---------------------------------------------------------------------------
_SQL_TOKH = (f"LIST_TRANSFORM(toks, t -> LIST_REDUCE("
             f"LIST_TRANSFORM(RANGE(LENGTH(t)), "
             f"i -> CAST(ASCII(SUBSTR(t, CAST(i+1 AS INTEGER), 1)) AS BIGINT)), "
             f"(acc, x) -> (acc * {HB} + x) % {HM}))")

_SQL_GRAMS = f"""
SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
         RANGE(LEN(th) - {CONTAM_GRAM - 1}),
         i -> ((((th[i+1] * {SB} + th[i+2]) % {HM} * {SB} + th[i+3]) % {HM}
                * {SB} + th[i+4]) % {HM} * {SB} + th[i+5]) % {HM}))) AS gh
FROM (SELECT doc_id, {_SQL_TOKH} AS th FROM ({SQL_TOKS})
      WHERE LEN(toks) >= {CONTAM_GRAM})
"""

def gram_array(d: DataFrame, *keep: str) -> DataFrame:
    """(doc_id, ghs) — the DISTINCT CONTAM_GRAM-token gram hashes of
    each document as an array column (polynomial char fold per token,
    SB-base fold across the gram; pure int64 arithmetic, array HOFs
    only — a per-row projection with no shuffle). Shared by q80 / q165
    and the streaming contamination gate, where the array form lets
    the bottom-k sketch be computed per row (array_sort + slice)
    instead of via a window. Extra ``keep`` columns ride along
    (default doc_id only) — q169's HLL needs (source, ghs) without a
    join back to the corpus."""
    cols = list(keep) or ["doc_id"]
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = (d.select(*cols, toks.alias("toks"))
         .where(F.size("toks") >= CONTAM_GRAM))
    tok_h = F.expr(
        f"transform(toks, t -> aggregate(transform(split(t, ''), "
        f"c -> cast(ascii(c) as bigint)), 0L, "
        f"(acc, x) -> (acc * {HB} + x) % {HM}))")
    th = t.select(*cols, tok_h.alias("th"))
    gram = F.expr(
        f"array_distinct(transform(sequence(1, size(th) - {CONTAM_GRAM - 1}), "
        f"i -> ((((element_at(th, i) * {SB} + element_at(th, i + 1)) % {HM} "
        f"* {SB} + element_at(th, i + 2)) % {HM} "
        f"* {SB} + element_at(th, i + 3)) % {HM} "
        f"* {SB} + element_at(th, i + 4)) % {HM}))")
    # Lazy materialization barrier (round-10 finding): without it,
    # downstream explode()/slice() consumers inline this whole chain
    # into the Generate/probe pipeline and the per-token aggregate()
    # char fold gets re-evaluated per OUTPUT row — measured 0.35 ms
    # per emitted gram (one full-document fold each) = 88 s to explode
    # a 250k-gram corpus vs 0.9 s with the barrier. The checkpoint
    # stores exactly the (keep, ghs) rows the consumers need anyway
    # (linear in distinct grams, spillable), evaluates once per doc on
    # first action, and is valid inside foreachBatch bodies (all
    # streaming consumers are foreachBatch gates).
    return th.select(*cols, gram.alias("ghs")).localCheckpoint(eager=False)


def gram_hashes(d: DataFrame) -> DataFrame:
    """Exploded (doc_id, gh) view of gram_array."""
    return gram_array(d).select("doc_id", F.explode("ghs").alias("gh"))


@query("q80_contamination", f"""
WITH grams AS ({_SQL_GRAMS}),
bench AS (SELECT DISTINCT doc_id AS bench_id, gh FROM grams
          WHERE doc_id % {BENCH_MOD} = 0),
corpus AS (SELECT doc_id, gh FROM grams WHERE doc_id % {BENCH_MOD} <> 0)
SELECT c.doc_id,
       COUNT(DISTINCT c.gh) AS n_overlap_grams,
       COUNT(DISTINCT b.bench_id) AS n_bench_docs
FROM corpus c JOIN bench b USING (gh)
GROUP BY c.doc_id
""")
def q80_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = gram_hashes(load_table(spark, sf_dir, "documents"))
    bench = (grams.where(F.col("doc_id") % BENCH_MOD == 0)
             .select(F.col("doc_id").alias("bench_id"), "gh").distinct())
    corpus = grams.where(F.col("doc_id") % BENCH_MOD != 0)
    return (corpus.join(F.broadcast(bench), "gh")
            .groupBy("doc_id")
            .agg(F.countDistinct("gh").alias("n_overlap_grams"),
                 F.countDistinct("bench_id").alias("n_bench_docs")))


# ---------------------------------------------------------------------------
# q81 — greedy sequence packing: fill PACK_BUDGET-token training bins
# with consecutive documents per language stratum. A document is
# assigned to the bin its running total starts in (contiguous fill —
# deterministic, single window pass, no bin-state loop).
# ---------------------------------------------------------------------------
@query("q81_sequence_packing", f"""
WITH t AS (SELECT doc_id, lang, LEN(toks) AS n_tokens FROM ({SQL_TOKS_LANG})
           WHERE LEN(toks) > 0),
c AS (SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
SELECT lang,
       CAST(((cum - n_tokens) - (cum - n_tokens) % {PACK_BUDGET})
            / {PACK_BUDGET} AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       ROUND(SUM(n_tokens) / CAST({PACK_BUDGET} AS DOUBLE), 4) AS fill_rate
FROM c GROUP BY lang, pack_id
""")
def q81_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = (d.select("doc_id", "lang", F.size(toks).alias("n_tokens"))
         .where(F.col("n_tokens") > 0))
    w = (W.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    pack = F.floor((F.col("cum") - F.col("n_tokens")) / PACK_BUDGET)
    return (c.select("lang", pack.alias("pack_id"), "n_tokens")
            .groupBy("lang", "pack_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("pack_tokens"),
                 F.round(F.sum("n_tokens") / float(PACK_BUDGET), 4)
                  .alias("fill_rate")))


# ---------------------------------------------------------------------------
# q82 — recursive CTE (Spark 4.x WITH RECURSIVE): walk the implicit
# decimal hierarchy parent(c) = c div 10 from every customer up to the
# root, then profile the tree by depth. Exercises the recursive-query
# machinery end-to-end against DuckDB's implementation of the same SQL.
# ---------------------------------------------------------------------------
_RECURSIVE_SQL = """
WITH RECURSIVE walk (custkey, node, depth) AS (
  SELECT CAST(c_custkey AS BIGINT) AS custkey,
         CAST(c_custkey AS BIGINT) AS node, 0 AS depth
  FROM {src}
  UNION ALL
  SELECT custkey, {parent} AS node, depth + 1 AS depth
  FROM walk WHERE node >= 10
)
SELECT depth, COUNT(*) AS n_nodes, COUNT(DISTINCT node) AS n_distinct,
       CAST(SUM(node) AS BIGINT) AS node_sum
FROM walk GROUP BY depth
"""

# oracle parent step spelled with the version-proof mod identity (the
# dedup._idiv discipline — DuckDB's `//` semantics have shifted across
# releases); Spark keeps the native integral `div`
@query("q82_recursive_hierarchy",
       _RECURSIVE_SQL.format(
           src="customer",
           parent="CAST((node - node % 10) / 10 AS BIGINT)"))
def q82_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer_rec_src")
    # Spark's recursive-CTE safety valve defaults to 1M total rows; this
    # walk legitimately produces n_customers x depth rows (depth <=
    # digits(custkey) <= 19), which passes 1M at ~150k customers — a
    # real output size, not runaway recursion. Raise the valve; the
    # level limit (default 100) still guards non-termination.
    spark.conf.set("spark.sql.cteRecursionRowLimit", 2_000_000_000)
    return spark.sql(
        _RECURSIVE_SQL.format(src="customer_rec_src",
                              parent="node div 10"))


# ---------------------------------------------------------------------------
# q93 — unigram language-model scoring (the CCNet/perplexity quality
# gate): train unigram stats on the corpus itself (token -> count, total
# N), score each document by its average per-token negative
# log-likelihood, and keep the low-perplexity band. Real pipelines score
# against a reference-corpus LM; self-scoring exercises the identical
# plan (train pass + broadcast join + per-doc fold).
#
# Cross-engine determinism: ln() may differ between engines in the last
# ulp, so each token's NLL is frozen to a fixed-point bigint
# (round(-ln(c/N) * 1e6)) BEFORE summation; integer sums are
# order-independent, so the per-doc total is bit-exact even though the
# doc's tokens are summed in different orders by different engines.
#
# Scale: the vocab aggregate is map-side combinable and its result is
# tiny relative to the corpus (vocab grows ~log of corpus size) ->
# broadcast join onto the exploded token stream; one per-doc sum.
# ---------------------------------------------------------------------------
NLL_KEEP_MAX = 3.6   # keep docs with avg NLL <= this (nats/token)

@query("q93_unigram_nll", f"""
WITH tok AS (
  SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))
           AS token
  FROM documents),
vocab AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
scal AS (SELECT SUM(c) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         CAST(ROUND(-LN(CAST(v.c AS DOUBLE) / s.n) * 1000000) AS BIGINT)
           AS nll_fp
  FROM tok t JOIN vocab v USING (token) CROSS JOIN scal s)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(SUM(nll_fp) / (COUNT(*) * 1000000.0), 4) AS avg_nll,
       SUM(nll_fp) / (COUNT(*) * 1000000.0) <= {NLL_KEEP_MAX} AS keep
FROM scored GROUP BY doc_id
""")
def q93_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    tok = d.select("doc_id", F.explode(toks).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").alias("c"))
    scal = vocab.agg(F.sum("c").alias("n"))
    nll_fp = F.round(-F.log(F.col("c").cast("double") / F.col("n"))
                     * 1_000_000).cast("bigint")
    # vocab is vocabulary cardinality (Heaps-law growth) — no forced
    # broadcast hint (AQE converts when measured size permits); the
    # SHUFFLE_HASH hint keeps the fallback a hash join — sort-merging
    # would sort the corpus-sized exploded token stream (measured 5.2x
    # at x10 once the grown vocab passed the broadcast threshold; the
    # per-partition vocab build side cannot OOM). scal's one-row hint
    # stays.
    scored = (tok.join(vocab.crossJoin(F.broadcast(scal))
                            .hint("shuffle_hash"), "token")
              .select("doc_id", nll_fp.alias("nll_fp")))
    avg = F.col("sum_fp") / (F.col("n_tokens") * 1_000_000.0)
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("nll_fp").alias("sum_fp"))
            .select("doc_id", "n_tokens",
                    F.round(avg, 4).alias("avg_nll"),
                    (avg <= NLL_KEEP_MAX).alias("keep")))


# ---------------------------------------------------------------------------
# q99 — the curation pipeline, composed: exact-dedup -> quality gate ->
# passage-dup drop -> unigram-NLL band -> PPS sample, emitting the
# per-stage survivor funnel a 100 TB curation run reports. Each stage
# recomputes its statistics over the *surviving* set (the pipeline
# semantics), and every predicate is integer arithmetic (cross-
# multiplied ratios, fixed-point NLL) so both engines agree bit-forbit.
#
# Scale: stage frames are materialized once each (localCheckpoint) and
# every stage is the same shuffle shape as its standalone operator
# (q40/q50/q89/q93/q94); the funnel output is 6 rows.
# ---------------------------------------------------------------------------
PIPE_PASSAGE = 16
PIPE_NLL_MAX_FP = 3_600_000        # 3.6 nats/token * 1e6
PIPE_PPS_TARGET = 100

@query("q99_curation_pipeline", f"""
WITH s1 AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1),
feat AS (
  SELECT doc_id, text,
         LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_tokens,
         LENGTH(text) AS n_chars,
         LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[a-z]', '', 'g')) AS n_alpha
  FROM s1),
s2 AS (
  SELECT doc_id, text, n_tokens FROM feat
  WHERE n_tokens >= 10 AND n_alpha * 10 > n_chars * 6),
toks2 AS (SELECT doc_id, text, n_tokens,
                 LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS toks
          FROM s2),
passages AS (
  SELECT doc_id,
         MD5(ARRAY_TO_STRING(
           LIST_SLICE(toks, start + 1, start + {PIPE_PASSAGE}), ' ')) AS ph
  FROM (SELECT doc_id, toks, UNNEST(RANGE(0, LEN(toks), {PIPE_PASSAGE})) AS start
        FROM toks2)),
pfreq AS (SELECT ph, COUNT(*) AS c FROM passages GROUP BY ph),
pstat AS (
  SELECT p.doc_id, COUNT(*) AS n_passages,
         COUNT(*) FILTER (WHERE f.c > 1) AS n_dup
  FROM passages p JOIN pfreq f USING (ph) GROUP BY p.doc_id),
s3 AS (
  SELECT t.doc_id, t.text, t.n_tokens, t.toks FROM toks2 t
  JOIN pstat s USING (doc_id)
  WHERE 2 * s.n_dup < s.n_passages),
tok3 AS (SELECT doc_id, UNNEST(toks) AS token FROM s3),
vocab AS (SELECT token, COUNT(*) AS c FROM tok3 GROUP BY token),
vn AS (SELECT SUM(c) AS n FROM vocab),
nll AS (
  SELECT t.doc_id,
         SUM(CAST(ROUND(-LN(CAST(v.c AS DOUBLE) / s.n) * 1000000) AS BIGINT))
           AS sum_fp,
         COUNT(*) AS n_tok
  FROM tok3 t JOIN vocab v USING (token) CROSS JOIN vn s
  GROUP BY t.doc_id),
s4 AS (
  SELECT s3.doc_id, s3.n_tokens FROM s3 JOIN nll USING (doc_id)
  WHERE nll.sum_fp <= {PIPE_NLL_MAX_FP} * nll.n_tok),
wsum AS (SELECT SUM(n_tokens) AS s FROM s4),
s5 AS (
  SELECT doc_id FROM s4 CROSS JOIN wsum
  WHERE (CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         % 1000000) * s < {PIPE_PPS_TARGET} * n_tokens * 1000000)
SELECT * FROM (
  SELECT 0 AS stage_n, 'raw' AS stage, (SELECT COUNT(*) FROM documents) AS n_docs
  UNION ALL SELECT 1, 'exact_dedup', (SELECT COUNT(*) FROM s1)
  UNION ALL SELECT 2, 'quality', (SELECT COUNT(*) FROM s2)
  UNION ALL SELECT 3, 'passage_dedup', (SELECT COUNT(*) FROM s3)
  UNION ALL SELECT 4, 'lm_band', (SELECT COUNT(*) FROM s4)
  UNION ALL SELECT 5, 'pps_sample', (SELECT COUNT(*) FROM s5))
""")
def q99_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")

    w = W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    s1 = (d.withColumn("rn", F.row_number().over(w))
          .where(F.col("rn") == 1).select("doc_id", "text")
          .localCheckpoint(eager=True))

    toks = F.filter(F.split("text", " "), lambda x: x != "")
    alpha = F.length("text") - F.length(F.regexp_replace("text", "[a-z]", ""))
    feat = s1.select("doc_id", "text", F.size(toks).alias("n_tokens"),
                     F.length("text").alias("n_chars"),
                     alpha.alias("n_alpha"))
    s2 = (feat.where((F.col("n_tokens") >= 10)
                     & (F.col("n_alpha") * 10 > F.col("n_chars") * 6))
          .select("doc_id", "text", "n_tokens")
          .localCheckpoint(eager=True))

    toks2 = s2.select("doc_id", "text", "n_tokens", toks.alias("toks"))
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(PIPE_PASSAGE))
    ph = F.md5(F.array_join(
        F.slice("toks", F.col("start") + 1, PIPE_PASSAGE), " ").cast("binary"))
    passages = (toks2.select("doc_id", "toks", F.explode(starts).alias("start"))
                .select("doc_id", ph.alias("ph")))
    pfreq = passages.groupBy("ph").agg(F.count("*").alias("c"))
    pstat = (passages.join(pfreq, "ph")
             .groupBy("doc_id")
             .agg(F.count("*").alias("n_passages"),
                  F.count(F.when(F.col("c") > 1, True)).alias("n_dup")))
    s3 = (toks2.join(pstat, "doc_id")
          .where(2 * F.col("n_dup") < F.col("n_passages"))
          .select("doc_id", "n_tokens", "toks")
          .localCheckpoint(eager=True))

    tok3 = s3.select("doc_id", F.explode("toks").alias("token"))
    vocab = tok3.groupBy("token").agg(F.count("*").alias("c"))
    vn = vocab.agg(F.sum("c").alias("n"))
    nll_fp = F.round(-F.log(F.col("c").cast("double") / F.col("n"))
                     * 1_000_000).cast("bigint")
    # vocab: unhinted broadcast, SHUFFLE_HASH fallback (see q93)
    nll = (tok3.join(vocab.crossJoin(F.broadcast(vn))
                          .hint("shuffle_hash"), "token")
           .groupBy("doc_id")
           .agg(F.sum(nll_fp).alias("sum_fp"), F.count("*").alias("n_tok")))
    s4 = (s3.join(nll, "doc_id")
          .where(F.col("sum_fp") <= PIPE_NLL_MAX_FP * F.col("n_tok"))
          .select("doc_id", "n_tokens")
          .localCheckpoint(eager=True))

    wsum = s4.agg(F.sum("n_tokens").alias("s"))
    u = (F.conv(F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15),
            16, 10).cast("bigint") % 1_000_000)
    s5 = (s4.crossJoin(F.broadcast(wsum))
          .where(u * F.col("s")
                 < F.lit(PIPE_PPS_TARGET) * F.col("n_tokens").cast("long")
                   * 1_000_000))

    def stage_row(n: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count("*").alias("n_docs")).select(
            F.lit(n).alias("stage_n"), F.lit(name).alias("stage"), "n_docs")

    out = stage_row(0, "raw", d)
    for n, (stage, frame) in enumerate(
            [("exact_dedup", s1), ("quality", s2), ("passage_dedup", s3),
             ("lm_band", s4), ("pps_sample", s5)], start=1):
        out = out.unionByName(stage_row(n, stage, frame))
    return out


# ---------------------------------------------------------------------------
# q154 — length-bucket padding-waste audit: assign every document to
# the power-of-two token-length bucket a fixed-shape training batcher
# would pad it to, and measure the padding tax per bucket and overall
# (padded = bucket_size * n_docs; waste = padded - real tokens). This
# is the measurement behind choosing bucketed batching / sequence
# packing (q81) over naive padding for LLM training throughput.
#
# Determinism: the bucket is an unrolled integer CASE (identical text
# in both engines) — no log2() on doubles, whose last-ulp behavior at
# exact powers of two is libm-dependent. Waste ppm is the mod-identity
# floor division.
#
# Scale: per-row projection + one map-side-combinable groupBy on a
# bounded key (16 buckets); the overall row is a second tiny agg.
# ---------------------------------------------------------------------------
_PAD_EXPS = list(range(16))   # buckets 1, 2, 4, ..., 32768

def _bucket_case(n: str) -> str:
    """Smallest power-of-two >= n, as an unrolled CASE both engines
    evaluate identically (documents past 2^15 tokens clamp to the top
    bucket; widen _PAD_EXPS for longer-context corpora)."""
    whens = " ".join(f"WHEN {n} <= {1 << e} THEN {1 << e}"
                     for e in _PAD_EXPS)
    return f"(CASE {whens} ELSE {1 << _PAD_EXPS[-1]} END)"


@query("q154_padding_waste", f"""
WITH t AS (
  SELECT doc_id,
         LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))
           AS n_tokens
  FROM documents),
b AS (
  SELECT doc_id, n_tokens, {_bucket_case('n_tokens')} AS bucket
  FROM t WHERE n_tokens > 0),
per AS (
  SELECT bucket, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS real_tokens,
         CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens
  FROM b GROUP BY bucket)
SELECT bucket, n_docs, real_tokens, padded_tokens,
       CAST(((padded_tokens - real_tokens) * 1000000
             - ((padded_tokens - real_tokens) * 1000000) % padded_tokens)
            / padded_tokens AS BIGINT) AS waste_ppm
FROM per
""")
def q154_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    b = (d.select("doc_id", n_tokens.alias("n_tokens"))
          .where(F.col("n_tokens") > 0)
          .selectExpr("doc_id", "n_tokens",
                      f"{_bucket_case('n_tokens')} AS bucket"))
    per = (b.groupBy("bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("real_tokens"),
                 (F.first("bucket") * F.count("*")).cast("bigint")
                  .alias("padded_tokens")))
    # DECIMAL(38,0) before *1e6: token counts per bucket can pass
    # 9.2e12 at corpus scale (the q110 lesson)
    waste = ((F.col("padded_tokens") - F.col("real_tokens"))
             .cast("decimal(38,0)") * 1_000_000)
    return per.select(
        "bucket", "n_docs", "real_tokens", "padded_tokens",
        exact_tdiv(waste, F.col("padded_tokens")).alias("waste_ppm"))


# ---------------------------------------------------------------------------
# q162 — passage-removal rewrite (RefinedWeb/MassiveText line-level
# dedup, applied): where q89 only SCORES the duplicated-passage ratio,
# this operator applies the rewrite rule production pipelines run —
# any PASSAGE-token block whose hash occurs REWRITE_T+ times anywhere
# in the corpus is removed from EVERY document that contains it — and
# reports the per-document token retention the rewrite leaves behind.
# The passage grid is q89's (non-overlapping PASSAGE-token windows,
# md5 over the joined slice), so the two operators agree on what a
# "passage" is; the tail window can be short, and its true length
# (not the nominal PASSAGE) is what the token accounting uses.
#
# Scale (100 TB): identical shape to q89 — explode to passage rows
# (corpus-linear), one map-side-combinable count per hash, join back
# on the uniform md5 key, aggregate per doc. The rewrite itself is
# metadata-only here (which blocks survive + exact token accounting);
# reconstructing the cleaned text is one more array_join over the
# surviving slices with the same plan shape.
# ---------------------------------------------------------------------------
REWRITE_T = 2   # passage occurs REWRITE_T+ times corpus-wide -> removed

@query("q162_passage_rewrite", f"""
WITH t AS (SELECT doc_id, toks FROM ({SQL_TOKS}) WHERE LEN(toks) > 0),
p AS (
  SELECT doc_id,
         MD5(ARRAY_TO_STRING(
           LIST_SLICE(toks, start + 1, start + {PIPE_PASSAGE}), ' ')) AS ph,
         LEAST({PIPE_PASSAGE}, LEN(toks) - start) AS plen
  FROM (SELECT doc_id, toks,
               UNNEST(RANGE(0, LEN(toks), {PIPE_PASSAGE})) AS start
        FROM t)),
freq AS (SELECT ph, COUNT(*) AS c FROM p GROUP BY ph),
acc AS (
  SELECT p.doc_id,
         COUNT(*) AS n_passages,
         COUNT(*) FILTER (WHERE f.c >= {REWRITE_T}) AS n_removed,
         CAST(SUM(plen) AS BIGINT) AS tokens_before,
         CAST(COALESCE(SUM(plen) FILTER (WHERE f.c < {REWRITE_T}), 0)
              AS BIGINT) AS tokens_after
  FROM p JOIN freq f USING (ph) GROUP BY p.doc_id)
SELECT doc_id, n_passages, n_removed, tokens_before, tokens_after,
       CAST((tokens_after * 1000000 - (tokens_after * 1000000) % tokens_before)
            / tokens_before AS BIGINT) AS retained_ppm
FROM acc
""")
def q162_passage_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(PIPE_PASSAGE))
    ph = F.md5(F.array_join(
        F.slice("toks", F.col("start") + 1, PIPE_PASSAGE), " ").cast("binary"))
    plen = F.least(F.lit(PIPE_PASSAGE), F.size("toks") - F.col("start"))
    p = (t.select("doc_id", "toks", F.explode(starts).alias("start"))
         .select("doc_id", ph.alias("ph"), plen.alias("plen")))
    freq = p.groupBy("ph").agg(F.count("*").alias("c"))
    removed = F.col("c") >= REWRITE_T
    acc = (p.join(freq, "ph")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_passages"),
                F.count(F.when(removed, True)).alias("n_removed"),
                F.sum("plen").cast("bigint").alias("tokens_before"),
                F.coalesce(F.sum(F.when(~removed, F.col("plen"))), F.lit(0))
                 .cast("bigint").alias("tokens_after")))
    return acc.select(
        "doc_id", "n_passages", "n_removed", "tokens_before", "tokens_after",
        exact_tdiv(F.col("tokens_after").cast("decimal(38,0)") * 1_000_000,
                   F.col("tokens_before")).alias("retained_ppm"))


# ---------------------------------------------------------------------------
# q163 — filter-cascade attribution: the ablation accounting a corpus
# curation run reports alongside its keep/drop verdicts (Dolma /
# RefinedWeb style). Four Gopher-class rules are evaluated INDEPENDENTLY
# on every document, and each rule row carries three counts:
#   n_fail       — docs failing the rule at all (marginal rate),
#   n_first_fail — docs whose LOWEST-numbered failing rule is this one
#                  (the waterfall attribution a sequential pipeline logs),
#   n_sole_fail  — docs failing ONLY this rule (the docs this rule
#                  uniquely removes — dropping the rule would re-admit
#                  exactly these).
# Row 0 reports the surviving count. All predicates are the integer
# cross-multiplied forms of q79/q99's thresholds, so both engines agree
# bit-for-bit.
#
# Scale (100 TB): per-row flag projection (array HOFs, no shuffle), one
# map-side-combinable global agg, 5 output rows. The cheapest possible
# audit shape — it runs at scan speed next to the filter itself.
# ---------------------------------------------------------------------------
_R1 = "n_tokens < 10"                                   # too short
_R2 = "NOT (n_alpha * 10 > n_chars * 6)"                # low alpha ratio
_R3 = ("n_tokens >= 2 AND "
       "(n_tokens - 1 - n_unique_bigrams) * 5 > (n_tokens - 1)")
                                                        # dup-bigram > 0.2
_R4 = "n_chars < 3 * n_tokens OR n_chars > 12 * n_tokens"  # cpt band


def attribution_flags(d: DataFrame) -> DataFrame:
    """Per-document independent rule flags (doc_id, f1..f4) — the shared
    per-row projection behind batch q163 and the streaming quality gate
    (streaming/qualitygate.py). Scan-speed: array HOFs only, no shuffle."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    bigrams = F.zip_with(
        F.slice("toks", 1, F.size("toks") - 1),
        F.slice("toks", 2, F.size("toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b))
    alpha = F.length("text") - F.length(F.regexp_replace("text", "[a-z]", ""))
    feat = (d.select("doc_id", "text", "n_chars", toks.alias("toks"))
            .select("doc_id",
                    F.size("toks").alias("n_tokens"),
                    "n_chars",
                    alpha.alias("n_alpha"),
                    F.size(F.array_distinct(bigrams))
                     .alias("n_unique_bigrams")))
    return feat.selectExpr(
        "doc_id",
        f"CASE WHEN {_R1} THEN 1 ELSE 0 END AS f1",
        f"CASE WHEN {_R2} THEN 1 ELSE 0 END AS f2",
        f"CASE WHEN {_R3} THEN 1 ELSE 0 END AS f3",
        f"CASE WHEN {_R4} THEN 1 ELSE 0 END AS f4")


def attribution_partial(flags: DataFrame) -> DataFrame:
    """One 13-count row over a flag frame. Every count is a SUM over
    disjoint documents, so partials over document partitions (or
    micro-batches) merge by columnwise addition — the property the
    streaming twin rides."""
    c = F.col
    return flags.agg(
        F.count(F.when(c("f1") + c("f2") + c("f3") + c("f4") == 0, True))
         .alias("kept"),
        F.sum("f1").alias("a1"), F.sum("f2").alias("a2"),
        F.sum("f3").alias("a3"), F.sum("f4").alias("a4"),
        F.sum("f1").alias("w1"),
        F.count(F.when((c("f1") == 0) & (c("f2") == 1), True)).alias("w2"),
        F.count(F.when((c("f1") == 0) & (c("f2") == 0) & (c("f3") == 1),
                       True)).alias("w3"),
        F.count(F.when((c("f1") == 0) & (c("f2") == 0) & (c("f3") == 0)
                       & (c("f4") == 1), True)).alias("w4"),
        F.count(F.when((c("f1") == 1) & (c("f2") + c("f3") + c("f4") == 0),
                       True)).alias("s1"),
        F.count(F.when((c("f2") == 1) & (c("f1") + c("f3") + c("f4") == 0),
                       True)).alias("s2"),
        F.count(F.when((c("f3") == 1) & (c("f1") + c("f2") + c("f4") == 0),
                       True)).alias("s3"),
        F.count(F.when((c("f4") == 1) & (c("f1") + c("f2") + c("f3") == 0),
                       True)).alias("s4"))


def attribution_rows(agg: DataFrame) -> DataFrame:
    """Render the 13-count row as the 5-row attribution table."""
    return agg.selectExpr(
        "stack(5, "
        "0, 'kept',        CAST(kept AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), "
        "1, 'min_tokens',  CAST(a1 AS BIGINT), CAST(w1 AS BIGINT), CAST(s1 AS BIGINT), "
        "2, 'alpha_ratio', CAST(a2 AS BIGINT), CAST(w2 AS BIGINT), CAST(s2 AS BIGINT), "
        "3, 'dup_bigram',  CAST(a3 AS BIGINT), CAST(w3 AS BIGINT), CAST(s3 AS BIGINT), "
        "4, 'cpt_band',    CAST(a4 AS BIGINT), CAST(w4 AS BIGINT), CAST(s4 AS BIGINT)) "
        "AS (rule_n, rule, n_fail, n_first_fail, n_sole_fail)")


@query("q163_filter_attribution", f"""
WITH feat AS (
  SELECT doc_id,
         LEN(toks) AS n_tokens,
         n_chars,
         LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[a-z]', '', 'g'))
           AS n_alpha,
         LEN(LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(toks)),
             i -> LIST_EXTRACT(toks, i) || ' ' || LIST_EXTRACT(toks, i + 1))))
           AS n_unique_bigrams
  FROM (SELECT doc_id, text, n_chars,
               LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS toks
        FROM documents)),
flags AS (
  SELECT CASE WHEN {_R1} THEN 1 ELSE 0 END AS f1,
         CASE WHEN {_R2} THEN 1 ELSE 0 END AS f2,
         CASE WHEN {_R3} THEN 1 ELSE 0 END AS f3,
         CASE WHEN {_R4} THEN 1 ELSE 0 END AS f4
  FROM feat),
agg AS (
  SELECT COUNT(*) FILTER (WHERE f1 + f2 + f3 + f4 = 0) AS kept,
         SUM(f1) AS a1, SUM(f2) AS a2, SUM(f3) AS a3, SUM(f4) AS a4,
         SUM(f1) AS w1,
         COUNT(*) FILTER (WHERE f1 = 0 AND f2 = 1) AS w2,
         COUNT(*) FILTER (WHERE f1 = 0 AND f2 = 0 AND f3 = 1) AS w3,
         COUNT(*) FILTER (WHERE f1 = 0 AND f2 = 0 AND f3 = 0 AND f4 = 1) AS w4,
         COUNT(*) FILTER (WHERE f1 = 1 AND f2 + f3 + f4 = 0) AS s1,
         COUNT(*) FILTER (WHERE f2 = 1 AND f1 + f3 + f4 = 0) AS s2,
         COUNT(*) FILTER (WHERE f3 = 1 AND f1 + f2 + f4 = 0) AS s3,
         COUNT(*) FILTER (WHERE f4 = 1 AND f1 + f2 + f3 = 0) AS s4
  FROM flags)
SELECT 0 AS rule_n, 'kept' AS rule,
       CAST(kept AS BIGINT) AS n_fail, CAST(0 AS BIGINT) AS n_first_fail,
       CAST(0 AS BIGINT) AS n_sole_fail FROM agg
UNION ALL SELECT 1, 'min_tokens', CAST(a1 AS BIGINT), CAST(w1 AS BIGINT),
       CAST(s1 AS BIGINT) FROM agg
UNION ALL SELECT 2, 'alpha_ratio', CAST(a2 AS BIGINT), CAST(w2 AS BIGINT),
       CAST(s2 AS BIGINT) FROM agg
UNION ALL SELECT 3, 'dup_bigram', CAST(a3 AS BIGINT), CAST(w3 AS BIGINT),
       CAST(s3 AS BIGINT) FROM agg
UNION ALL SELECT 4, 'cpt_band', CAST(a4 AS BIGINT), CAST(w4 AS BIGINT),
       CAST(s4 AS BIGINT) FROM agg
""")
def q163_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return attribution_rows(attribution_partial(attribution_flags(d)))


# ---------------------------------------------------------------------------
# q165 — fuzzy benchmark decontamination (bottom-k containment): q80
# flags EXACT n-gram overlap; production decontamination also needs the
# fuzzy variant — "what fraction of this document's shingle set appears
# in the benchmark" — robust to partial rewording. Per corpus document
# keep the CONTAIN_K smallest gram hashes (a bottom-k sketch: the
# classic uniform sample of the shingle set, deterministic because the
# hash IS the sampling order); the containment estimate is the fraction
# of those present in the benchmark's gram-hash set. This is the
# one-sided Jaccard containment estimator min-hash decontamination
# pipelines use (cf. Broder's bottom-k sketches); CONTAIN_T is the drop
# threshold.
#
# Scale (100 TB): bottom-k is one window over the doc_id exchange
# (uniform key, k rows kept per doc); the benchmark gram set is a real
# eval suite — MBs against a TB corpus — so after distinct-reduction it
# is broadcast exactly like q80's, and the corpus side never shuffles
# for the probe. Output is one row per corpus document.
# ---------------------------------------------------------------------------
CONTAIN_K = 32        # bottom-k sketch size per document
CONTAIN_T = 200_000   # contained_ppm >= 20% -> contaminated

@query("q165_fuzzy_contamination", f"""
WITH grams AS ({_SQL_GRAMS}),
bench AS (SELECT DISTINCT gh FROM grams WHERE doc_id % {BENCH_MOD} = 0),
bk AS (
  SELECT doc_id, gh FROM (
    SELECT doc_id, gh,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY gh) AS rn
    FROM grams WHERE doc_id % {BENCH_MOD} <> 0)
  WHERE rn <= {CONTAIN_K}),
acc AS (
  SELECT bk.doc_id,
         COUNT(*) AS k_used,
         COUNT(b.gh) AS n_hit
  FROM bk LEFT JOIN bench b USING (gh)
  GROUP BY bk.doc_id)
SELECT doc_id, k_used, n_hit,
       CAST((n_hit * 1000000 - (n_hit * 1000000) % k_used) / k_used
            AS BIGINT) AS contained_ppm,
       (n_hit * 1000000 - (n_hit * 1000000) % k_used) / k_used
         >= {CONTAIN_T} AS contaminated
FROM acc
""")
def q165_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # real benchmarks are MBs vs a TB corpus: broadcast after
    # distinct-reduction is the right call at any corpus size (the
    # fixture's 1/97 stand-in inflates it, same contract as q80)
    bench = benchmark_gram_set(d)
    corpus = gram_array(d).where(F.col("doc_id") % BENCH_MOD != 0)
    return contamination_scores(corpus, bench)


def benchmark_gram_set(d: DataFrame) -> DataFrame:
    """Distinct gram hashes of the benchmark subset, flagged for the
    left-join probe — the STATIC side the gate broadcasts."""
    return (gram_hashes(d.where(F.col("doc_id") % BENCH_MOD == 0))
            .select("gh").distinct().withColumn("hit", F.lit(1)))


def contamination_scores(corpus: DataFrame, bench: DataFrame) -> DataFrame:
    """Bottom-k containment scores for a (doc_id, ghs) corpus frame
    against a benchmark gram set. The sketch is computed PER ROW
    (array_sort + slice — the distinct gram array is already in hand,
    so no window/shuffle; bit-identical to the q165 oracle's
    row_number-over-gh spelling); only the <= CONTAIN_K sketch rows
    are exploded for the broadcast probe, then one map-side-combinable
    groupBy(doc_id) folds the verdict. Shared by batch q165 and the
    streaming contamination gate (same per-doc math on either side —
    verdicts cannot depend on trigger boundaries)."""
    bk = (corpus.select(
            "doc_id",
            F.explode(F.slice(F.array_sort("ghs"), 1, CONTAIN_K))
             .alias("gh")))
    acc = (bk.join(F.broadcast(bench), "gh", "left")
           .groupBy("doc_id")
           .agg(F.count("*").alias("k_used"),
                F.count("hit").alias("n_hit")))
    ppm = exact_tdiv(F.col("n_hit").cast("decimal(38,0)") * 1_000_000,
                     F.col("k_used"))
    return acc.select("doc_id", "k_used", "n_hit",
                      ppm.alias("contained_ppm"),
                      (ppm >= CONTAIN_T).alias("contaminated"))


# ---------------------------------------------------------------------------
# q180 — deterministic training-shard assignment + writer (r11 verdict,
# Next-round #4: the end-of-pipeline op the curation suite lacked).
#
# A training run wants the curated corpus as N FIXED shards in a
# SEEDED global permutation order (so data order is reproducible
# across reruns and resumable mid-epoch), with documents sequence-
# packed into fixed token budgets inside each shard.  All of that is
# pure integer arithmetic both engines mirror:
#
#   pk       = ((doc_id % HM) * A + seed) % HM * B + 11) % HM
#              (multiplicative scatter, Knuth constant A; products
#               stay < 2.7e18, inside BIGINT in both engines)
#   shard_id = pk % n_shards
#   seq      = ROW_NUMBER over (shard_id ORDER BY pk, doc_id)
#   pack_id  = q81's contiguous fill over the PERMUTED order (cum
#              token count div PACK_BUDGET) — shuffling before
#              packing is the point: consecutive docs in a pack are
#              a random sample, not neighbors in crawl order.
#
# Scale (100 TB): one hash projection (no shuffle), one shuffle on
# shard_id, and per-shard windows.  n_shards is the parallelism AND
# file-size unit — a real deployment picks n_shards so each shard is
# one task/file worth of data (e.g. 100k 1-GB shards), exactly like
# every production shard writer; the per-shard window then sorts one
# task's worth of rows.  The writer emits one seq-ordered file per
# shard plus a manifest row per shard, all executor-side — zero
# driver collects.
# ---------------------------------------------------------------------------
N_SHARDS = 16
SHARD_SEED = 1069
_SH_A = 2654435761      # Knuth 32-bit multiplicative constant
_SH_B = 40503


_EPOCH_STRIDE = 7919  # prime stride separating per-epoch order seeds


def shard_keys(d: DataFrame, *, n_shards: int = N_SHARDS,
               seed: int = SHARD_SEED) -> DataFrame:
    """(doc_id, n_tokens, pk, shard_id) — the TEXT-PASS half of the
    shard assignment: tokenize-count + the seeded multiplicative-hash
    permutation key + the shard membership it induces.  Everything
    here is a pure per-row projection of (doc_id, text), so it is
    computable at ingest with no global state — exactly what the
    streaming shard gate (streaming/shardgate.py) persists per batch.
    The epoch order key is NOT included: it is a pure function of
    doc_id alone (no text), recomputed at read time by
    ``assignment_from_keys`` so one stored index serves every epoch."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = (d.select("doc_id", F.size(toks).cast("bigint").alias("n_tokens"))
         .where(F.col("n_tokens") > 0))
    h1 = (F.col("doc_id") % HM * F.lit(_SH_A) + F.lit(seed)) % HM
    pk = (h1 * F.lit(_SH_B) + F.lit(11)) % HM
    return (t.select("doc_id", "n_tokens", pk.alias("pk"))
            .withColumn("shard_id", F.col("pk") % n_shards))


def assignment_from_keys(s: DataFrame, *, seed: int = SHARD_SEED,
                         epoch: int = 0) -> DataFrame:
    """(doc_id, shard_id, seq, pack_id, n_tokens) from an explicit
    keys frame (``shard_keys``' shape) — the WINDOW half: the
    epoch-rekeyed intra-shard order, dense seq, and q81 packing over
    the permuted order.  Shared by one-shot q180 and the served read
    (streaming/shardgate.py), so parity reduces to the keys frames
    being equal.  epoch=0 reproduces the written layout exactly
    (ok == pk), which is what q180 oracles."""
    e_seed = seed + epoch * _EPOCH_STRIDE
    h1e = (F.col("doc_id") % HM * F.lit(_SH_A) + F.lit(e_seed)) % HM
    ok = (h1e * F.lit(_SH_B) + F.lit(11)) % HM
    w = W.partitionBy("shard_id").orderBy("ok", "doc_id")
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    o = (s.withColumn("ok", ok)
         .withColumn("seq", F.row_number().over(w).cast("bigint"))
         .withColumn("cum", F.sum("n_tokens").over(wc)))
    pack = F.floor((F.col("cum") - F.col("n_tokens")) / PACK_BUDGET)
    return o.select("doc_id", "shard_id", "seq",
                    pack.alias("pack_id"), "n_tokens")


def shard_assignment(d: DataFrame, *, n_shards: int = N_SHARDS,
                     seed: int = SHARD_SEED,
                     epoch: int = 0) -> DataFrame:
    """(doc_id, shard_id, seq, pack_id, n_tokens) — the pure
    assignment half of the shard writer (everything q180 oracles).
    Deterministic in (data, n_shards, seed, epoch); empty docs drop
    (the q81 convention).

    ``epoch`` reshuffles the INTRA-shard order (and therefore the
    packing) without moving any document between shards — the
    training-loop semantics: shard membership is a storage/locality
    decision made once, per-epoch data order comes from re-keying the
    permutation with seed + epoch·stride.  Composed from the
    shard_keys text pass + the assignment_from_keys window half (the
    split the streaming shard gate shares, r12 verdict ask #1)."""
    return assignment_from_keys(shard_keys(d, n_shards=n_shards,
                                           seed=seed),
                                seed=seed, epoch=epoch)


@query("q180_training_shards", f"""
WITH t AS (SELECT doc_id, LEN(toks) AS n_tokens FROM ({SQL_TOKS})
           WHERE LEN(toks) > 0),
a AS (SELECT doc_id, n_tokens,
             ((doc_id % {HM}) * {_SH_A} + {SHARD_SEED}) % {HM} AS h1
      FROM t),
b AS (SELECT doc_id, n_tokens, (h1 * {_SH_B} + 11) % {HM} AS pk FROM a),
s AS (SELECT doc_id, n_tokens, pk, pk % {N_SHARDS} AS shard_id FROM b),
o AS (SELECT doc_id, shard_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY shard_id
                                ORDER BY pk, doc_id) AS seq,
             SUM(n_tokens) OVER (PARTITION BY shard_id
                                 ORDER BY pk, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM s)
SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id,
       CAST(seq AS BIGINT) AS seq,
       CAST(((cum - n_tokens) - (cum - n_tokens) % {PACK_BUDGET})
            / {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM o
""")
def q180_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded-permutation shard/pack assignment over documents — the
    oracled contract behind write_training_shards."""
    return shard_assignment(load_table(spark, sf_dir, "documents"))


def write_training_shards(d: DataFrame, out_dir: str, *,
                          n_shards: int = N_SHARDS,
                          seed: int = SHARD_SEED,
                          max_records_per_file: int | None = None
                          ) -> None:
    """Materialize the shards: one seq-ordered parquet file per
    shard_id=<k> directory (each shard lives in exactly one hash
    partition, so partitionBy splits it into exactly one file) plus a
    manifest row per shard.  Entirely executor-side.

    ``max_records_per_file`` (r18; VERDICT r17 Next-round #7, guide
    §6 output sizing): caps rows per parquet file so production
    shards land in the 128 MB-1 GB band instead of one arbitrarily
    large file per shard — set it to target_bytes / avg_row_bytes
    (SCALE.md's sizing row).  Spark splits the seq-sorted partition
    into CONSECUTIVE files, so within-shard seq order is preserved
    across the file sequence and the rows written are identical.
    Default: $SPARK_GRAFT_SHARD_MAX_RECORDS, else 0 = unlimited (the
    pre-r18 one-file-per-shard test-scale behavior)."""
    import os
    if max_records_per_file is None:
        max_records_per_file = int(os.environ.get(
            "SPARK_GRAFT_SHARD_MAX_RECORDS", "0") or 0)
    a = shard_assignment(d, n_shards=n_shards, seed=seed)
    rows = (a.join(d.select("doc_id", "text"), "doc_id")
            .repartition(n_shards, "shard_id")
            .sortWithinPartitions("shard_id", "seq"))
    rows.write.mode("overwrite").partitionBy("shard_id") \
        .option("maxRecordsPerFile", max(0, int(max_records_per_file))) \
        .parquet(os.path.join(out_dir, "shards"))
    man = (a.groupBy("shard_id")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("shard_tokens"),
                (F.max("pack_id") + 1).alias("n_packs"),
                F.max("seq").alias("max_seq")))
    man.write.mode("overwrite").parquet(os.path.join(out_dir, "manifest"))
