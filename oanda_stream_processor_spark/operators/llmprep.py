"""Training-data preparation operators (north-star extension;
SURVEY.md §2.2 'LLM-pipeline extensions', second batch).

The curation steps a 100 TB corpus pipeline runs between dedup and
tokenization: TF-IDF term weighting, fixed-stride token chunking,
pattern redaction (PII-shaped), deterministic stratified sampling, and
vocabulary construction. All pure built-in expressions — zero Python
UDFs — with DuckDB oracle twins.

Scale notes (100 TB):
* tfidf — one token explode + two map-side-combinable groupBys (tf per
  (doc, term); df per term); the df table is tiny after aggregation and
  broadcasts. Per-doc top-k is a window over (doc) — the shuffle is on
  doc_id, uniform.
* chunking — per-row array HOFs (no explode until the final chunk
  rows); output row count = ceil(tokens/stride) per doc, linear.
* redaction — per-row regexp projection; no shuffle.
* sampling — keep/drop decided by md5(doc_id) mod 100: deterministic,
  seedless, reproducible on any engine and any cluster size, and
  resample-stable under repartitioning (the property `TABLESAMPLE`
  lacks). One map-side-combinable groupBy for the per-stratum audit.
* vocab — one explode + one map-side-combinable count groupBy; top-k
  via TakeOrdered-shaped window on a frame that is already tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .helpers import exact_tdiv

QUERIES: dict = {}
ORACLES: dict = {}

CHUNK = 16        # tokens per chunk
STRIDE = 12       # tokens between chunk starts (CHUNK-STRIDE overlap)
TOP_TERMS = 3     # tf-idf terms kept per document
VOCAB_K = 20      # vocabulary entries kept
SAMPLE_PCT = 20   # stratified sample keep-rate (percent)

REDACT_TERMS = ("customer", "supplier")   # entity terms, hit the fixture
RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
RE_PHONE = "\\+?[0-9][0-9 ()-]{7,}[0-9]"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


SQL_TOKS = ("SELECT doc_id, lang, LIST_FILTER(STRING_SPLIT(text, ' '), "
            "x -> x <> '') AS toks FROM documents")


def _toks(d: DataFrame) -> DataFrame:
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return d.select("doc_id", "lang", toks.alias("toks"))


# ---------------------------------------------------------------------------
# TF-IDF: tf = in-doc term count, idf = ln((N+1)/(df+1)) (smoothed),
# top TOP_TERMS terms per doc by rounded score. Rounding before ranking
# makes the order robust to last-ulp ln() differences across engines.
# ---------------------------------------------------------------------------
@query("q74_tfidf_top_terms", f"""
WITH tok AS (SELECT doc_id, UNNEST(toks) AS term FROM ({SQL_TOKS})),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT doc_id, term, score, rank FROM ranked WHERE rank <= {TOP_TERMS}
""")
def q74_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = _toks(d).select("doc_id", F.explode("toks").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a ONE-ROW broadcast frame (the textops.q150 cut
    # pattern), not an eager d.count() — no driver action mid-plan.
    # The per-TERM df frame is vocabulary cardinality (Heaps-law
    # growth): no broadcast hint, AQE decides from measured size.
    n = d.agg(F.count("*").alias("n_docs"))
    score = F.round(
        F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
        6)
    scored = (tf.join(df, "term")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "term", score.alias("score")))
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOP_TERMS)
            .select("doc_id", "term", "score", "rank"))


# ---------------------------------------------------------------------------
# Token-window chunking: fixed CHUNK-token windows every STRIDE tokens
# (the standard overlapping-context split before tokenization).
# ---------------------------------------------------------------------------
@query("q75_doc_chunks", f"""
WITH t AS (SELECT doc_id, toks FROM ({SQL_TOKS}) WHERE LEN(toks) > 0),
starts AS (
  SELECT doc_id, toks,
         UNNEST(RANGE(0, GREATEST(LEN(toks) - {CHUNK - STRIDE}, 1), {STRIDE}))
           AS start
  FROM t)
SELECT doc_id, CAST(start / {STRIDE} AS BIGINT) AS chunk_id,
       CAST(LEN(LIST_SLICE(toks, start + 1, start + {CHUNK})) AS INTEGER)
         AS n_tokens,
       ARRAY_TO_STRING(LIST_SLICE(toks, start + 1, start + {CHUNK}), ' ')
         AS chunk_text
FROM starts
""")
def q75_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = _toks(d).where(F.size("toks") > 0)
    # chunk starts: 0, STRIDE, 2*STRIDE, ... while start < len-(CHUNK-STRIDE)
    # (last window may be short but never empty; every token is covered)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("toks") - (CHUNK - STRIDE + 1), F.lit(0)),
        F.lit(STRIDE))
    chunk = F.slice("toks", F.col("start") + 1, CHUNK)
    return (t.select("doc_id", "toks", F.explode(starts).alias("start"))
            .select("doc_id",
                    (F.col("start") / STRIDE).cast("long").alias("chunk_id"),
                    F.size(chunk).cast("int").alias("n_tokens"),
                    F.array_join(chunk, " ").alias("chunk_text")))


# ---------------------------------------------------------------------------
# Pattern redaction: email/phone (PII shapes; zero-hit on the synthetic
# fixture, verifying the no-op path) + entity-term redaction (hits).
# ---------------------------------------------------------------------------
_SQL_TERM_ALT = "|".join(REDACT_TERMS)

@query("q76_redaction", f"""
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '{RE_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '{RE_PHONE}')) AS BIGINT) AS n_phones,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\b({_SQL_TERM_ALT})\\b')) AS BIGINT)
         AS n_entities,
       MD5(REGEXP_REPLACE(
             REGEXP_REPLACE(
               REGEXP_REPLACE(text, '{RE_EMAIL}', '[EMAIL]', 'g'),
               '{RE_PHONE}', '[PHONE]', 'g'),
             '\\b({_SQL_TERM_ALT})\\b', '[ENTITY]', 'g')) AS redacted_md5
FROM documents
""")
def q76_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    term_re = f"\\b({_SQL_TERM_ALT})\\b"
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", RE_EMAIL, "[EMAIL]"),
            RE_PHONE, "[PHONE]"),
        term_re, "[ENTITY]")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(RE_EMAIL)).alias("n_emails"),
        F.regexp_count("text", F.lit(RE_PHONE)).alias("n_phones"),
        F.regexp_count("text", F.lit(term_re)).alias("n_entities"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"))


# ---------------------------------------------------------------------------
# Deterministic stratified sampling: md5(doc_id) mod 100 < SAMPLE_PCT.
# Seedless, engine-independent, repartition-stable — the reproducibility
# a TABLESAMPLE lacks. Audit: per-stratum totals + achieved rate.
# ---------------------------------------------------------------------------
_SQL_KEEP = (f"CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15) "
             f"AS BIGINT) % 100 < {SAMPLE_PCT}")

@query("q77_stratified_sample", f"""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_SQL_KEEP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled,
       ROUND(SUM(CASE WHEN {_SQL_KEEP} THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS rate
FROM documents GROUP BY lang
""")
def q77_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    digest = F.conv(F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
    keep = (digest.cast("bigint") % 100 < SAMPLE_PCT).cast("int")
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_total"),
                 F.sum(keep).alias("n_sampled"),
                 F.round(F.sum(keep) / F.count("*").cast("double"), 4)
                  .alias("rate")))


# ---------------------------------------------------------------------------
# Vocabulary construction: corpus-wide token counts, top VOCAB_K by
# (count desc, token) — the first step of tokenizer training.
# ---------------------------------------------------------------------------
@query("q78_vocab_topk", f"""
WITH tok AS (SELECT UNNEST(toks) AS token FROM ({SQL_TOKS})),
counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
SELECT token, n,
       ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
FROM counts ORDER BY rank LIMIT {VOCAB_K}
""")
def q78_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = _toks(d).select(F.explode("toks").alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    # distributed top-k FIRST (orderBy+limit -> TakeOrderedAndProject:
    # per-partition heaps, never a global sort), then rank the K
    # survivors; a row_number window over the full vocabulary would
    # single-partition every distinct token at corpus scale
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(VOCAB_K)
    w = W.orderBy(F.desc("n"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# q89 — passage-level dedup (RefinedWeb/FineWeb-style): documents are cut
# into non-overlapping PASSAGE-token windows, each passage is hashed, and
# a passage is "duplicated" when its hash occurs more than once in the
# corpus (any document, including elsewhere in the same one). The per-doc
# duplicated-passage ratio drives the drop verdict — the granularity
# between whole-document exact dedup (q40) and shingle similarity (q44).
#
# Scale: one explode to passage rows (corpus-linear), one map-side-
# combinable count per passage hash, one broadcast-sized?? no — the
# frequency table is corpus-sized, so it joins back on the md5 key
# (uniform, skew-free) and aggregates per doc. Three shuffles total, all
# on uniform keys.
# ---------------------------------------------------------------------------
PASSAGE = 16        # tokens per passage (non-overlapping)
DUP_RATIO_DROP = 0.5

@query("q89_passage_dedup", f"""
WITH t AS (SELECT doc_id, toks FROM ({SQL_TOKS}) WHERE LEN(toks) > 0),
passages AS (
  SELECT doc_id,
         MD5(ARRAY_TO_STRING(
           LIST_SLICE(toks, start + 1, start + {PASSAGE}), ' ')) AS ph
  FROM (SELECT doc_id, toks,
               UNNEST(RANGE(0, LEN(toks), {PASSAGE})) AS start
        FROM t)),
freq AS (SELECT ph, COUNT(*) AS c FROM passages GROUP BY ph)
SELECT p.doc_id,
       COUNT(*) AS n_passages,
       COUNT(*) FILTER (WHERE f.c > 1) AS n_dup,
       ROUND(COUNT(*) FILTER (WHERE f.c > 1) / CAST(COUNT(*) AS DOUBLE), 6)
         AS dup_ratio,
       COUNT(*) FILTER (WHERE f.c > 1) / CAST(COUNT(*) AS DOUBLE)
         >= {DUP_RATIO_DROP} AS drop_doc
FROM passages p JOIN freq f USING (ph)
GROUP BY p.doc_id
""")
def q89_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = _toks(d).where(F.size("toks") > 0)
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(PASSAGE))
    ph = F.md5(F.array_join(
        F.slice("toks", F.col("start") + 1, PASSAGE), " ").cast("binary"))
    passages = (t.select("doc_id", "toks", F.explode(starts).alias("start"))
                .select("doc_id", ph.alias("ph")))
    freq = passages.groupBy("ph").agg(F.count("*").alias("c"))
    dup = (F.count(F.when(F.col("c") > 1, True))).alias("n_dup")
    ratio = F.col("n_dup") / F.col("n_passages").cast("double")
    return (passages.join(freq, "ph")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_passages"), dup)
            .select("doc_id", "n_passages", "n_dup",
                    F.round(ratio, 6).alias("dup_ratio"),
                    (ratio >= DUP_RATIO_DROP).alias("drop_doc")))


# ---------------------------------------------------------------------------
# q94 — weight-proportional (PPS / Poisson) sampling: inclusion
# probability proportional to document length in tokens, the importance-
# sampling step that rebalances a training mix toward content-rich
# documents. Deterministic and engine/cluster-invariant like q77: the
# uniform draw is md5(doc_id), the inclusion test
# u * S < K * w * U_MOD is pure bigint arithmetic (S = corpus token
# mass, K = expected sample size), so the same doc set is kept on any
# engine and any partitioning — the reproducibility property TABLESAMPLE
# cannot give.
#
# Scale: corpus mass S is one tiny aggregate broadcast back; the keep
# decision is a per-row projection; the audit one map-side-combinable
# groupBy per stratum.
# ---------------------------------------------------------------------------
PPS_TARGET = 100    # expected sample size (docs)
_U_MOD = 1_000_000

_SQL_W = "LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))"
_SQL_U = (f"CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15) "
          f"AS BIGINT) % {_U_MOD}")

@query("q94_pps_sample", f"""
WITH w AS (SELECT doc_id, lang, {_SQL_W} AS w, {_SQL_U} AS u FROM documents),
scal AS (SELECT SUM(w) AS s FROM w),
dec AS (
  SELECT lang, w, (u * s < {PPS_TARGET} * w * {_U_MOD}) AS kept
  FROM w CROSS JOIN scal)
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(w) AS BIGINT) AS w_total,
       CAST(SUM(CASE WHEN kept THEN w ELSE 0 END) AS BIGINT) AS w_sampled
FROM dec GROUP BY lang
""")
def q94_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = F.size(F.filter(F.split("text", " "), lambda x: x != "")).cast("long")
    u = (F.conv(F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15),
            16, 10).cast("bigint") % _U_MOD)
    base = d.select("doc_id", "lang", w.alias("w"), u.alias("u"))
    scal = base.agg(F.sum("w").alias("s"))
    kept = (F.col("u") * F.col("s")
            < F.lit(PPS_TARGET) * F.col("w") * F.lit(_U_MOD))
    dec = (base.crossJoin(F.broadcast(scal))
           .select("lang", "w", kept.alias("kept")))
    return (dec.groupBy("lang")
            .agg(F.count("*").alias("n_total"),
                 F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_sampled"),
                 F.sum("w").alias("w_total"),
                 F.sum(F.when(F.col("kept"), F.col("w")).otherwise(0))
                  .alias("w_sampled")))


# ---------------------------------------------------------------------------
# q152 — DSIR-style importance weighting (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling", arXiv
# 2302.03169): score every raw document by how target-like its hashed
# unigram features are. Feature map = polynomial char hash of each
# token folded mod 1e9+7 (the q44/q52 hash family; Spark `aggregate`
# with seed 0 == DuckDB LIST_REDUCE seedless, since (0*B + c) % M = c)
# bucketed into DSIR_BUCKETS. Train: add-one-smoothed bucket
# frequencies for the TARGET source vs the full RAW pool; per-bucket
# log-ratio frozen to fixed-point bigint (round(ln(ratio) * 1e6), the
# q93 NLL discipline — integer sums are then order-independent, so the
# per-doc score is bit-exact on any engine/partitioning). Score: sum
# of bucket log-ratios over the doc's token occurrences; keep when
# MORE TARGET-LIKE THAN THE CORPUS AVERAGE (the add-one smoothing
# floor shifts every absolute score, so the meaningful DSIR signal is
# relative rank — the average is one broadcast scalar, trunc-divided
# identically on both engines).
#
# Scale (100 TB): the hash is computed once per DISTINCT vocabulary
# token (vocab ~ log of corpus) and broadcast back onto the token
# stream; bucket training tables are DSIR_BUCKETS rows (tiny,
# broadcast); the scoring pass is one token explode + one
# map-side-combinable per-doc sum. No shuffle keyed on anything bigger
# than doc_id.
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 1024
DSIR_TARGET = "src0"
_DSIR_HMOD = 1_000_000_007
_DSIR_BASE = 131

_SQL_TOKH = (
    "LIST_REDUCE(LIST_TRANSFORM(STRING_SPLIT(token, ''), "
    f"c -> CAST(ASCII(c) AS BIGINT)), (a, b) -> (a * {_DSIR_BASE} + b) "
    f"% {_DSIR_HMOD})")

def dsir_bucket_col() -> F.Column:
    """Hashed-unigram feature bucket of the `token` column — Spark
    aggregate with seed 0 == DuckDB LIST_REDUCE seedless fold."""
    codes = F.transform(F.split("token", ""),
                        lambda c: F.ascii(c).cast("long"))
    h = F.aggregate(codes, F.lit(0).cast("long"),
                    lambda a, c: (a * _DSIR_BASE + c) % _DSIR_HMOD)
    return h % DSIR_BUCKETS


def _dsir_tokens(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id", "source",
        F.explode(F.filter(F.split("text", " "),
                           lambda x: x != "")).alias("token"))


def _dsir_tables(d: DataFrame):
    """(bt, lr): bucketized token stream (checkpointed — three
    consumers) and the per-bucket fixed-point log-ratio table."""
    tok = _dsir_tokens(d)
    # hash once per distinct token (vocab-sized), broadcast back
    vocab = (tok.select("token").distinct()
             .select("token", dsir_bucket_col().alias("bucket")))
    # vocab-cardinality frame: unhinted (see q74/q93), AQE decides
    bt = (tok.join(vocab, "token")
             .select("doc_id", "source", "bucket")
             .localCheckpoint(eager=True))
    tc = (bt.where(F.col("source") == DSIR_TARGET)
            .groupBy("bucket").agg(F.count("*").alias("tc")))
    rc = bt.groupBy("bucket").agg(F.count("*").alias("rc"))
    tots = bt.agg(
        F.count("*").alias("r_tot"),
        F.sum(F.when(F.col("source") == DSIR_TARGET, 1).otherwise(0))
         .alias("t_tot"))
    ratio = ((F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
             * (F.col("r_tot") + DSIR_BUCKETS)
             / ((F.col("rc") + 1).cast("double")
                * (F.col("t_tot") + DSIR_BUCKETS)))
    lr = (rc.join(tc, "bucket", "left")
            .crossJoin(F.broadcast(tots))
            .select("bucket",
                    F.round(F.log(ratio) * 1_000_000).cast("bigint")
                     .alias("lr_fp")))
    return bt, lr


def _dsir_scores(bt: DataFrame, lr: DataFrame) -> DataFrame:
    return (bt.join(F.broadcast(lr), "bucket")
              .groupBy("doc_id", "source")
              .agg(F.count("*").alias("n_tokens"),
                   F.sum("lr_fp").cast("bigint").alias("importance_fp")))


def _dsir_avg(scores: DataFrame) -> DataFrame:
    ssum, n = F.sum("importance_fp"), F.count("*")
    return scores.agg(exact_tdiv(ssum, n).alias("avg_fp"))


def _dsir_default(bt: DataFrame) -> DataFrame:
    """One-row (default_fp): the smoothed log-ratio of a bucket UNSEEN
    in training (tc = rc = 0 ⇒ ratio = (r_tot + B)/(t_tot + B)), in the
    same fixed-point rounding as lr_fp.  Streaming batches score NEW
    documents, whose tokens can hash to buckets the training corpus
    never produced — those tokens must contribute this nonzero smoothed
    value, not silently vanish from the inner join."""
    t_tot = F.sum(F.when(F.col("source") == DSIR_TARGET, 1).otherwise(0))
    return bt.agg(
        F.round(F.log((F.count("*") + DSIR_BUCKETS).cast("double")
                      / (t_tot + DSIR_BUCKETS).cast("double"))
                * 1_000_000).cast("bigint").alias("default_fp"))


def dsir_train(d: DataFrame):
    """(lr, avg, dflt): the broadcastable trained state for scoring
    OTHER frames (e.g. streaming micro-batches — streaming/dsirgate.py):
    the per-bucket log-ratio table, the corpus-average keep gate, and
    the unseen-bucket default scalar. All eagerly checkpointed: train
    once, reuse per batch."""
    bt, lr = _dsir_tables(d)
    lr = lr.localCheckpoint(eager=True)
    avg = _dsir_avg(_dsir_scores(bt, lr)).localCheckpoint(eager=True)
    dflt = _dsir_default(bt).localCheckpoint(eager=True)
    return lr, avg, dflt


@query("q152_dsir_importance", f"""
WITH tok AS (
  SELECT doc_id, source,
         UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))
           AS token
  FROM documents),
vocab AS (
  SELECT token, CAST({_SQL_TOKH} % {DSIR_BUCKETS} AS BIGINT) AS bucket
  FROM (SELECT DISTINCT token FROM tok)),
bt AS (
  SELECT t.doc_id, t.source, v.bucket
  FROM tok t JOIN vocab v USING (token)),
tc AS (
  SELECT bucket, COUNT(*) AS c FROM bt
  WHERE source = '{DSIR_TARGET}' GROUP BY bucket),
rc AS (SELECT bucket, COUNT(*) AS c FROM bt GROUP BY bucket),
tots AS (
  SELECT (SELECT COUNT(*) FROM bt WHERE source = '{DSIR_TARGET}') AS t_tot,
         (SELECT COUNT(*) FROM bt) AS r_tot),
lr AS (
  SELECT r.bucket,
         CAST(ROUND(LN((CAST(COALESCE(t.c, 0) + 1 AS DOUBLE)
                        * (s.r_tot + {DSIR_BUCKETS}))
                       / (CAST(r.c + 1 AS DOUBLE)
                          * (s.t_tot + {DSIR_BUCKETS}))) * 1000000)
              AS BIGINT) AS lr_fp
  FROM rc r LEFT JOIN tc t ON t.bucket = r.bucket CROSS JOIN tots s),
scores AS (
  SELECT b.doc_id, b.source, COUNT(*) AS n_tokens,
         CAST(SUM(l.lr_fp) AS BIGINT) AS importance_fp
  FROM bt b JOIN lr l USING (bucket)
  GROUP BY b.doc_id, b.source),
avg_s AS (
  SELECT CAST((SUM(importance_fp) - SUM(importance_fp) % COUNT(*))
              / COUNT(*) AS BIGINT) AS avg_fp
  FROM scores)
SELECT s.doc_id, s.source, s.n_tokens, s.importance_fp,
       s.importance_fp > a.avg_fp AS keep
FROM scores s CROSS JOIN avg_s a
""")
def q152_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bt, lr = _dsir_tables(d)
    scores = _dsir_scores(bt, lr)
    return (scores.crossJoin(F.broadcast(_dsir_avg(scores)))
                  .select("doc_id", "source", "n_tokens", "importance_fp",
                          (F.col("importance_fp") > F.col("avg_fp"))
                          .alias("keep")))


# ---------------------------------------------------------------------------
# q155 — BPE merge training (Sennrich et al. 2016, "Neural Machine
# Translation of Rare Words with Subword Units"): learn the first
# BPE_MERGES merge rules of a byte-pair-encoding tokenizer over the
# corpus, exactly as real trainers do — on the WORD-FREQUENCY table,
# not the raw corpus. Each step counts adjacent symbol pairs weighted
# by word frequency, merges the most frequent pair (ties broken
# lexicographically), and re-symbolizes every word. Output: the merge
# table (step, lhs, rhs, merged, pair_count).
#
# Determinism (the q90 unrolled-iteration discipline): pair counts are
# integer sums of integer frequencies; the argmax is ORDER BY (count
# DESC, lhs, rhs) LIMIT 1; and the merge application is EXACT
# left-to-right non-overlapping semantics — for lhs != rhs adjacent
# matches cannot overlap, and for lhs == rhs runs of matches keep
# every other position (gaps-and-islands run grouping + offset parity),
# reproducing greedy single-pass BPE bit-for-bit in both engines.
#
# Scale (100 TB): the corpus is touched ONCE by the map-side-
# combinable word count; everything after runs on the vocabulary
# (~log of corpus size — exactly why production BPE trainers operate
# on word-freq dicts). Each step is one explode over vocab-sized
# symbol arrays, one bounded-key count, a 1-row broadcast argmax, and
# a vocab-keyed rebuild; localCheckpoint per step caps plan depth.
# ---------------------------------------------------------------------------
BPE_MERGES = 5
_EOW = "</w>"


def _bpe_sql() -> str:
    steps = []
    prev = "w0"
    for k in range(1, BPE_MERGES + 1):
        steps.append(f"""
p{k} AS MATERIALIZED (
  SELECT l AS lhs, r AS rhs, CAST(SUM(freq) AS BIGINT) AS c FROM (
    SELECT freq, syms[i] AS l, syms[i + 1] AS r FROM (
      SELECT token, freq, syms,
             UNNEST(RANGE(1, LEN(syms))) AS i
      FROM {prev})) GROUP BY l, r),
b{k} AS MATERIALIZED (SELECT lhs, rhs, c FROM p{k} ORDER BY c DESC, lhs, rhs LIMIT 1),
m{k} AS MATERIALIZED (
  SELECT token, i FROM (
    SELECT token, i, MIN(i) OVER (PARTITION BY token, grp) AS run_start
    FROM (
      SELECT token, i,
             i - ROW_NUMBER() OVER (PARTITION BY token ORDER BY i) AS grp
      FROM (
        SELECT s.token, s.syms,
               UNNEST(RANGE(1, LEN(s.syms))) AS i
        FROM {prev} s) x CROSS JOIN b{k} b
      WHERE x.syms[x.i] = b.lhs AND x.syms[x.i + 1] = b.rhs))
  WHERE (i - run_start) % 2 = 0),
w{k} AS MATERIALIZED (
  SELECT x.token, x.freq,
         LIST(CASE WHEN km.i IS NOT NULL THEN b.lhs || b.rhs
                   ELSE x.sym END ORDER BY x.pos) AS syms
  FROM (
    SELECT token, freq, pos, syms[pos] AS sym FROM (
      SELECT token, freq, syms,
             UNNEST(RANGE(1, LEN(syms) + 1)) AS pos
      FROM {prev})) x
  CROSS JOIN b{k} b
  LEFT JOIN m{k} km ON km.token = x.token AND km.i = x.pos
  LEFT JOIN m{k} kc ON kc.token = x.token AND kc.i = x.pos - 1
  WHERE kc.i IS NULL
  GROUP BY x.token, x.freq)""")
        prev = f"w{k}"
    # shared WITH-body through w{BPE_MERGES}: tokd carries doc_id so the
    # encode pass (q158) can re-join the corpus token stream; q155's
    # merge output aggregates it away
    chain = f"""tokd AS (
  SELECT doc_id,
         UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))
           AS token
  FROM documents),
wf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
       FROM tokd GROUP BY token),
w0 AS MATERIALIZED (SELECT token, freq,
              LIST_APPEND(STRING_SPLIT(token, ''), '{_EOW}') AS syms
       FROM wf),
{','.join(steps)}"""
    merges = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, lhs, rhs, lhs || rhs AS merged, "
        f"c AS pair_count FROM b{k}"
        for k in range(1, BPE_MERGES + 1))
    return f"WITH {chain}\n{merges}\n", chain


_BPE_MERGES_SQL, _BPE_CHAIN_SQL = _bpe_sql()


def _bpe_train(spark: SparkSession, sf_dir: str):
    """(merge_table, final_vocab): the BPE_MERGES learned merge rows
    and the word-frequency table in its FINAL symbolization — which IS
    the corpus encoded under the learned tokenizer (q158 re-joins it
    onto the token stream)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.filter(F.split("text", " "),
                                      lambda x: x != "")).alias("token"))
    wf = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("freq"))
    w = wf.select(
        "token", "freq",
        F.concat(F.split("token", ""), F.array(F.lit(_EOW))).alias("syms")) \
        .localCheckpoint(eager=True)

    # greedy single-pass merge application as ONE left-to-right array
    # fold per word (round-8 rewrite): if the previous position merged,
    # skip this one; else merge when (syms[i], syms[i+1]) is the best
    # pair.  Identical semantics to the oracle's run-parity windows
    # (for lhs != rhs matches cannot overlap; for lhs == rhs the skip
    # flag keeps exactly the even offsets of each run).  The rebuild is
    # a pure PROJECTION — the former explode + two windows + two joins
    # + collect_list paid three vocab shuffles and an eager checkpoint
    # job per round (~2.9 s at sf0.1; now ~1 s, one argmax job/round).
    merge_fold = F.expr(
        "aggregate(sequence(1, size(syms)), "
        "named_struct('out', cast(array() as array<string>), "
        "'skip', false), "
        "(acc, i) -> IF(acc.skip, "
        "named_struct('out', acc.out, 'skip', false), "
        "IF(i < size(syms) AND element_at(syms, i) = lhs "
        "AND element_at(syms, i + 1) = rhs, "
        "named_struct('out', concat(acc.out, array(concat(lhs, rhs))), "
        "'skip', true), "
        "named_struct('out', concat(acc.out, array(element_at(syms, i))), "
        "'skip', false))), "
        "acc -> acc.out)")

    out = None
    for k in range(1, BPE_MERGES + 1):
        pair = F.expr(
            "explode(transform(sequence(1, size(syms) - 1), i -> "
            "struct(element_at(syms, i) AS l, "
            "element_at(syms, i + 1) AS r)))")
        # size >= 2 guard: Spark sequence(1, 0) DESCENDS (DuckDB
        # RANGE(1,1) is empty), so fully-merged single-symbol words
        # must be excluded before the pair explode
        counts = (w.where(F.expr("size(syms) >= 2"))
                   .select("freq", pair.alias("pr"))
                   .groupBy(F.col("pr.l").alias("lhs"),
                            F.col("pr.r").alias("rhs"))
                   .agg(F.sum("freq").cast("bigint").alias("c")))
        best = (counts.orderBy(F.desc("c"), F.asc("lhs"), F.asc("rhs"))
                .limit(1).localCheckpoint(eager=True))
        # re-symbolize: shuffle-free fold; lineage stays shallow (one
        # crossJoin + projection per round on top of the w0 checkpoint)
        # so no per-round materialization is needed — the next round's
        # argmax job recomputes k cheap vocab-array projections
        # lazy persist: materializes INSIDE the next round's argmax
        # job (no job floor of its own), and later rounds read the
        # cache instead of recomputing the fold chain
        w = (w.crossJoin(F.broadcast(best.select("lhs", "rhs")))
              .select("token", "freq", merge_fold.alias("syms"))
              .persist())
        row = best.select(F.lit(k).alias("step"), "lhs", "rhs",
                          F.concat("lhs", "rhs").alias("merged"),
                          F.col("c").alias("pair_count"))
        out = row if out is None else out.unionByName(row)
    return out, w


@query("q155_bpe_merges", _BPE_MERGES_SQL)
def q155_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bpe_train(spark, sf_dir)[0]


# ---------------------------------------------------------------------------
# q158 — BPE encoding / token-budget accounting: apply q155's learned
# merge table to the corpus and report, per document, words vs emitted
# subword tokens and the subwords-per-word rate — the number a training
# pipeline budgets sequence lengths and packing with AFTER choosing a
# tokenizer (completes the train->apply pair the way q156 completes
# the IVF family). Because training operates on the word-frequency
# table, the final symbolization IS the encoder: encoding the corpus
# is one vocab join back onto the token stream — no per-document merge
# application, which is exactly why production BPE trainers work on
# word-freq dicts.
#
# Scale: the token explode is corpus-linear; the vocab join is
# vocabulary-cardinality (NO broadcast hint — AQE decides, the r8
# rule); one map-side-combinable per-doc sum. Rate ppm uses exact
# integer trunc-division on both engines.
# ---------------------------------------------------------------------------
@query("q158_bpe_encode", f"""
WITH {_BPE_CHAIN_SQL}
SELECT t.doc_id, COUNT(*) AS n_words,
       CAST(SUM(LEN(w.syms)) AS BIGINT) AS n_subwords,
       CAST((SUM(LEN(w.syms)) * 1000000
             - SUM(LEN(w.syms)) * 1000000 % COUNT(*))
            / COUNT(*) AS BIGINT) AS subwords_per_word_ppm
FROM tokd t JOIN w{BPE_MERGES} w USING (token)
GROUP BY t.doc_id
""")
def q158_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, vocab = _bpe_train(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(F.filter(F.split("text", " "),
                                      lambda x: x != "")).alias("token"))
    n_sub = F.sum(F.size("syms")).cast("bigint")
    return (tok.join(vocab.select("token", "syms"), "token")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_words"),
                    n_sub.alias("n_subwords"),
                    exact_tdiv(n_sub * 1_000_000, F.count("*"))
                     .alias("subwords_per_word_ppm")))


# ---------------------------------------------------------------------------
# q164 — temperature-flattened mixture weights: the sampling-weight
# table a multi-source pretraining run derives before building its data
# mix (cf. multilingual temperature sampling and Pile-style source
# upweighting): at temperature alpha = 0.5 each source's probability is
# proportional to sqrt of its token mass, flattening the natural
# distribution toward small sources. Per source the plan reports the
# natural share, the flattened share, the token allotment when the
# TOTAL corpus token mass is re-spent under the flattened shares, and
# the resulting epoch multiplier (allotment / own mass, fp2) — small
# sources repeat (epochs > 1.00), large ones are subsampled.
#
# Determinism: sqrt over a BIGINT-cast double is a single
# correctly-rounded IEEE op — bit-identical on both engines — and is
# immediately FLOORed into the fixed-point integer s = floor(sqrt(n) *
# 1e3); every share/allotment/epoch after that is exact integer
# arithmetic (DECIMAL(38,0) mod-identity on the Spark side, rounding
# cast exactness on the DuckDB side, both documented in helpers).
#
# Scale (100 TB): one map-side-combinable groupBy(source) over the
# corpus; the per-source frame (hundreds of rows) then carries one
# 1-row global agg broadcast back. Same shape as q143.
# ---------------------------------------------------------------------------
@query("q164_mixture_weights", """
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
s AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS sq
  FROM per_src),
tot AS (SELECT SUM(n_tokens) AS t_tok, SUM(sq) AS t_sq FROM s),
w AS (
  SELECT source, n_docs, n_tokens,
         CAST((n_tokens * 1000000 - (n_tokens * 1000000) % t_tok) / t_tok
              AS BIGINT) AS natural_ppm,
         CAST((sq * 1000000 - (sq * 1000000) % t_sq) / t_sq
              AS BIGINT) AS temp_ppm,
         t_tok
  FROM s CROSS JOIN tot),
a AS (
  SELECT source, n_docs, n_tokens, natural_ppm, temp_ppm,
         CAST((t_tok * temp_ppm - (t_tok * temp_ppm) % 1000000) / 1000000
              AS BIGINT) AS alloc_tokens
  FROM w)
SELECT source, n_docs, n_tokens, natural_ppm, temp_ppm, alloc_tokens,
       CAST((alloc_tokens * 100 - (alloc_tokens * 100) % n_tokens) / n_tokens
            AS BIGINT) AS epochs_fp2
FROM a
""")
def q164_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    per_src = (d.groupBy("source")
               .agg(F.count("*").alias("n_docs"),
                    F.sum(n_tok).cast("bigint").alias("n_tokens")))
    sq = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000) \
          .cast("bigint")
    s = per_src.withColumn("sq", sq)
    tot = s.agg(F.sum("n_tokens").alias("t_tok"), F.sum("sq").alias("t_sq"))
    w = s.crossJoin(F.broadcast(tot))
    natural_ppm = exact_tdiv(
        F.col("n_tokens").cast("decimal(38,0)") * 1_000_000, F.col("t_tok"))
    temp_ppm = exact_tdiv(
        F.col("sq").cast("decimal(38,0)") * 1_000_000, F.col("t_sq"))
    w2 = w.select("source", "n_docs", "n_tokens", "t_tok",
                  natural_ppm.alias("natural_ppm"),
                  temp_ppm.alias("temp_ppm"))
    alloc = exact_tdiv(
        F.col("t_tok").cast("decimal(38,0)") * F.col("temp_ppm"),
        F.lit(1_000_000))
    a = w2.withColumn("alloc_tokens", alloc)
    epochs = exact_tdiv(
        F.col("alloc_tokens").cast("decimal(38,0)") * 100, F.col("n_tokens"))
    return a.select("source", "n_docs", "n_tokens", "natural_ppm",
                    "temp_ppm", "alloc_tokens",
                    epochs.alias("epochs_fp2"))
