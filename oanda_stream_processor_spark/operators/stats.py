"""Statistical / aggregate extras: histograms, correlation, ordered
string aggregation, linear regression, bitwise aggregates.

Determinism strategy for second-moment statistics (corr, slope): the
built-in corr/covar/regr_* accumulate doubles in partition order —
nondeterministic across engines. Instead the inputs are rounded to
integers (corr is scale-free) and all five sums (n, Σx, Σy, Σxy, Σx²,
Σy²) are exact int64 arithmetic; the closed-form formula then runs in
double identically on both sides. Bounds: |x| ≤ 1e5 ⇒ Σx² ≤ 1e10·rows —
safe past 1e8 rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

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
# Histogram via width_bucket (DuckDB lacks it -> arithmetic emulation).
# ---------------------------------------------------------------------------
@query("q65_histogram", """
SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000 THEN 11
            ELSE FLOOR(o_totalprice / 600000.0 * 10) + 1 END AS BIGINT) AS bucket,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM orders GROUP BY 1
""")
def q65_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy(F.width_bucket("o_totalprice", F.lit(0), F.lit(600000),
                                     F.lit(10)).alias("bucket"))
             .agg(F.count("*").alias("n"),
                  F.round(F.min("o_totalprice"), 2).alias("lo"),
                  F.round(F.max("o_totalprice"), 2).alias("hi")))


# ---------------------------------------------------------------------------
# Correlation + covariance via exact integer moments.
# ---------------------------------------------------------------------------
_MOMENTS_SQL = """
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(ROUND(l_extendedprice, 0) AS BIGINT)) AS sx,
         SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sy,
         SUM(CAST(ROUND(l_extendedprice, 0) AS BIGINT)
             * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sxy,
         SUM(CAST(ROUND(l_extendedprice, 0) AS BIGINT)
             * CAST(ROUND(l_extendedprice, 0) AS BIGINT)) AS sxx,
         SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
             * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
"""

@query("q66_corr_covar", f"""
WITH m AS ({_MOMENTS_SQL})
SELECT l_returnflag, n,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         AS corr_price_qty,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * (n - 1)), 4) AS covar_samp
FROM m
""")
def q66_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    xi = F.round("l_extendedprice", 0).cast("bigint")
    yi = F.round("l_quantity", 0).cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(xi).alias("sx"), F.sum(yi).alias("sy"),
        F.sum(xi * yi).alias("sxy"),
        F.sum(xi * xi).alias("sxx"), F.sum(yi * yi).alias("syy"))
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    den = F.sqrt((nd * F.col("sxx") - sxd * F.col("sx"))
                 * (nd * F.col("syy") - syd * F.col("sy")))
    return m.select(
        "l_returnflag", "n",
        F.round(num / den, 6).alias("corr_price_qty"),
        F.round(num / (nd * (F.col("n") - 1)), 4).alias("covar_samp"))


# ---------------------------------------------------------------------------
# Ordered string aggregation (deterministic listagg).
# ---------------------------------------------------------------------------
@query("q67_string_agg", """
SELECT n_regionkey AS regionkey,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation GROUP BY n_regionkey
""")
def q67_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (n.groupBy(F.col("n_regionkey").alias("regionkey"))
             .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                   .alias("nations"),
                  F.count("*").alias("n_nations")))


# ---------------------------------------------------------------------------
# Linear regression (slope/intercept) from the same exact moments.
# ---------------------------------------------------------------------------
@query("q68_linear_regression", f"""
WITH m AS ({_MOMENTS_SQL})
SELECT l_returnflag,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 8)
         AS slope_qty_on_price,
       ROUND((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
             / CAST(n AS DOUBLE), 6) AS intercept
FROM m
""")
def q68_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    xi = F.round("l_extendedprice", 0).cast("bigint")
    yi = F.round("l_quantity", 0).cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(xi).alias("sx"), F.sum(yi).alias("sy"),
        F.sum(xi * yi).alias("sxy"), F.sum(xi * xi).alias("sxx"))
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (nd * F.col("sxx") - sxd * F.col("sx"))
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / nd
    return m.select("l_returnflag",
                    F.round(slope, 8).alias("slope_qty_on_price"),
                    F.round(intercept, 6).alias("intercept"))


# ---------------------------------------------------------------------------
# Bitwise aggregates — commutative exact integer ops, trivially
# order-insensitive.
# ---------------------------------------------------------------------------
@query("q69_bitwise_agg", """
SELECT l_returnflag,
       BIT_AND(l_orderkey % 65536) AS key_and,
       BIT_OR(l_orderkey % 65536) AS key_or,
       BIT_XOR(l_orderkey % 65536) AS key_xor
FROM lineitem GROUP BY l_returnflag
""")
def q69_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey") % 65536
    return (li.groupBy("l_returnflag")
              .agg(F.bit_and(k).alias("key_and"),
                   F.bit_or(k).alias("key_or"),
                   F.bit_xor(k).alias("key_xor")))


# ---------------------------------------------------------------------------
# q117 — robust outlier detection (median/MAD): per event_type, the
# median value, the median absolute deviation, and how many events sit
# beyond the 3-sigma-equivalent robust fence (3 * 1.4826 * MAD) — the
# monitoring primitive that survives heavy tails where mean/stddev
# z-scores drown. Two grouped exact-median passes; both engines
# interpolate quantile_cont identically (proven by q33), and the fence
# comparison is made at the SAME 6-place grain the query publishes
# (both sides rounded before comparing), so a median/MAD ulp
# difference between engines cannot flip n_outliers.
#
# Scale: two shuffles on the same (bounded-cardinality) group key plus
# a broadcast of the per-group medians back onto the rows; exact
# medians per group buffer that group's values — for unbounded groups
# at 100 TB the q108 GK-sketch pattern swaps in per-group fixed memory.
# ---------------------------------------------------------------------------
@query("q117_mad_outliers", """
WITH med AS (
  SELECT event_type, MEDIAN(value) AS med
  FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_type, e.value, m.med,
         ABS(e.value - m.med) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type),
mad AS (
  SELECT event_type, MEDIAN(adev) AS mad FROM dev GROUP BY event_type)
SELECT d.event_type,
       COUNT(*) AS n_events,
       ROUND(d.med, 6) AS med,
       ROUND(a.mad, 6) AS mad,
       CAST(SUM(CASE WHEN ROUND(ABS(d.value - d.med), 6)
                     > ROUND(3 * 1.4826 * a.mad, 6)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad a ON d.event_type = a.event_type
GROUP BY d.event_type, d.med, a.mad
""")
def q117_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    med = (e.groupBy("event_type")
           .agg(F.expr("percentile(value, 0.5D)").alias("med")))
    dev = (e.join(F.broadcast(med), "event_type")
           .select("event_type", "value", "med",
                   F.abs(F.col("value") - F.col("med")).alias("adev")))
    mad = (dev.groupBy("event_type")
           .agg(F.expr("percentile(adev, 0.5D)").alias("mad")))
    fence = F.round(3 * 1.4826 * F.col("mad"), 6)
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type", "med", "mad")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.when(F.round(F.abs(F.col("value") - F.col("med")), 6)
                              > fence,
                              1).otherwise(0)).alias("n_outliers"))
            .select("event_type", "n_events",
                    F.round("med", 6).alias("med"),
                    F.round("mad", 6).alias("mad"),
                    "n_outliers"))


# ---------------------------------------------------------------------------
# q120 — sketch-based MAD outliers: q117's 100 TB twin. Both median
# passes use Spark's GK sketch (approx_percentile, accuracy 10_000 ->
# rank error <= 0.01% per group) instead of exact percentile(), so each
# group costs FIXED memory and the partial sketches are map-side
# combinable — no per-group buffer+sort at any group size. Same robust
# fence at the published 6-place grain. No DuckDB oracle: DuckDB's
# approx_quantile is a t-digest and cannot reproduce GK outputs
# bit-for-bit (rows-only driver check, q108 precedent);
# tests/test_cross_engine.py asserts agreement with exact q117 instead.
# ---------------------------------------------------------------------------
@query("q120_mad_outliers_approx")
def q120_mad_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    med = (e.groupBy("event_type")
           .agg(F.expr("approx_percentile(value, 0.5D, 10000)").alias("med")))
    dev = (e.join(F.broadcast(med), "event_type")
           .select("event_type", "value", "med",
                   F.abs(F.col("value") - F.col("med")).alias("adev")))
    mad = (dev.groupBy("event_type")
           .agg(F.expr("approx_percentile(adev, 0.5D, 10000)").alias("mad")))
    fence = F.round(3 * 1.4826 * F.col("mad"), 6)
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type", "med", "mad")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.when(F.round(F.abs(F.col("value") - F.col("med")), 6)
                              > fence,
                              1).otherwise(0)).alias("n_outliers"))
            .select("event_type", "n_events",
                    F.round("med", 6).alias("med"),
                    F.round("mad", 6).alias("mad"),
                    "n_outliers"))


# ---------------------------------------------------------------------------
# q172 — fixed-domain histogram quantile sketch: the MERGEABLE,
# hash-gated alternative to the engine-native quantile sketches (q108
# GK stays rows-only because its compaction state is engine-private).
# The domain is declared up front (HIST_LO/HIST_HI cents — the
# production pattern for a known value domain like prices), the value
# is bucketed by pure integer arithmetic into HIST_NB equi-width
# cells, and the sketch state is just the bucket-count vector:
# SUM-mergeable across partitions, batches, and corpora with no
# coordination, which is what q108's GK state cannot offer and why a
# 100 TB pipeline ships histogram counts to the driver instead of raw
# percentile state. Out-of-domain values clamp into the edge buckets
# (counted, never dropped).
#
# For each target percentile the sketch answer is the first bucket
# whose cumulative count reaches ceil(p*n/100), refined by integer
# midpoint interpolation within the bucket:
#   est = lo + (hi - lo) * (rank_into_bucket) / bucket_count
# — every term exact int64 via the tdiv spelling. The EXACT kth value
# (ORDER BY + the k-th element, the global-sort cost the sketch
# exists to avoid) rides along as the QA yardstick with err columns,
# the q142/q169/q170 est-vs-exact discipline.
#
# Scale: one scan -> groupBy(bucket) with HIST_NB=1024 keys
# (map-side combinable, bounded state); the quantile walk is a window
# over <= 1024 rows. The exact side is the one global TakeOrdered —
# yardstick-only, bench-SF affordable, documented like q135's exact
# cutoff. Streaming twin: streaming/histgate.py SUM-merges per-batch
# bucket vectors and serves identical quantile reads.
# ---------------------------------------------------------------------------
HIST_LO = 0               # domain lower edge, cents
HIST_HI = 16_777_216      # domain upper edge, cents (2^24; prices fit)
HIST_NB = 1024            # buckets
HIST_PCTS = (50, 90, 99)


def _cents() -> F.Column:
    return F.round(F.col("l_extendedprice") * 100).cast("bigint")


def hist_buckets_of(vals: DataFrame, col: str) -> DataFrame:
    """(bucket, n) histogram state for any integer column over the
    declared domain: clamp, integer equi-width bucket, one bounded
    groupBy. The SUM-mergeable partial the streaming gate persists
    per batch; also the deviation-histogram builder for q173."""
    c = F.col(col)
    clamped = F.greatest(F.lit(HIST_LO),
                         F.least(F.lit(HIST_HI - 1), c))
    width = (HIST_HI - HIST_LO) // HIST_NB
    bucket = ((clamped - HIST_LO) - (clamped - HIST_LO) % width) / width
    return (vals.select(bucket.cast("bigint").alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")))


def hist_buckets(li: DataFrame) -> DataFrame:
    """q172's sketch state: the price histogram of a lineitem frame."""
    return hist_buckets_of(li.select(_cents().alias("cents")), "cents")


# A hit bucket at most this many rows sorts directly in one window
# partition (sub-second); above it the sub-histogram refinement kicks
# in (skewed/clamped distributions).  Uniform data at HIST_NB=1024
# buckets stays under this until ~270G rows total.
KTH_REFINE_CUT = 262_144


def _looks_materialized(df: DataFrame) -> bool:
    """Best-effort check that ``df`` is an eagerly materialized frame
    (a bare localCheckpoint root).  Reads private JVM plan internals,
    so ANY introspection failure — a Spark version moving the API, a
    connect-style session without _jdf — returns False and the caller
    takes the safe branch: one redundant localCheckpoint of a
    ≤ |pcts|-row frame, never a silent full-histogram recompute
    (r12 ADVICE: don't let brittle introspection become a crash)."""
    try:
        return (df._jdf.queryExecution().analyzed().nodeName()
                == "LogicalRDD")
    except Exception:  # noqa: BLE001 — checkpoint defensively
        return False


def exact_kth_by_bucket(vals: DataFrame, col: str,
                        hits: DataFrame) -> DataFrame:
    """Distributed exact-kth via the histogram CDF (two-phase exact
    quantile): ``hits`` is a tiny (pct, bucket, cum_before,
    target_rank) frame from hist_quantiles — the CDF already proves
    the k-th overall value lives in that bucket (clamping is monotone,
    so bucket order == value order up to ties inside one bucket), so
    the exact value is the (target_rank - cum_before)-th smallest
    value WITHIN the hit bucket. Replaces the round-9
    driver-sequenced TakeOrdered loop whose k ≈ n/2 funneled half the
    dataset through one reducer; zero ``.collect``, no global sort.

    SKEW ROBUSTNESS (round-11 ADVICE): the final rank window
    partitions only by pct, so its reducer sees every candidate of
    the hit bucket — fine when buckets are ~uniform (~n/HIST_NB), but
    out-of-domain values clamp into the two EDGE buckets, so a skewed
    or out-of-range distribution whose target rank lands in a clamp
    bucket would revert to a near-global single-reducer sort.  Hit
    buckets above KTH_REFINE_CUT rows therefore REFINE once before
    the window: a second equi-width histogram over the hit bucket's
    OBSERVED per-pct [min, max] (computed distributed, carried as a
    broadcast — the clamp bucket's candidates keep their original
    unclamped values, so the observed extent is the real one),
    re-locating the rank into a sub-bucket of ~candidates/HIST_NB
    rows; a constant sub-extent (min == max, a point mass)
    short-circuits to that value with no window at all.  Hit buckets
    at or under the cut take the direct window — the refinement's
    extra shuffle phases cost ~1.8 s/query at sf0.1 when applied
    unconditionally (r11 mid-round bench: q172 1.15→2.98 s), which a
    uniform distribution never needs; the bound keeps the worst
    single-reducer sort at KTH_REFINE_CUT rows on the direct path and
    ~candidates/HIST_NB after refinement.  The routing is per pct
    (both paths are filters of the same broadcast-joined candidate
    frame), so a mixed workload refines exactly the skewed
    percentiles.  A pathological distribution needing more levels
    would recurse the same way, not appear silently.

    PARAMETER CONTRACT (r11 ADVICE): ``hits`` must be MATERIALIZED —
    this function takes a driver action on it (the skew-branch read
    below), so a lazy ``hits`` would recompute its full histogram CDF
    once per call.  Both in-repo callers pass an eagerly
    localCheckpoint-ed frame; a caller that doesn't is defensively
    checkpointed here (bounded to ≤ |pcts| rows, one tiny job) rather
    than silently paying the recompute."""
    from pyspark.sql import Window as W
    from .helpers import exact_tdiv
    if not _looks_materialized(hits):
        hits = hits.localCheckpoint(eager=True)
    c = F.col(col)
    clamped = F.greatest(F.lit(HIST_LO), F.least(F.lit(HIST_HI - 1), c))
    width = (HIST_HI - HIST_LO) // HIST_NB
    bucket = (((clamped - HIST_LO) - (clamped - HIST_LO) % width) / width
              ).cast("bigint")
    cand = (vals.select(c.alias("v"), bucket.alias("bucket"))
            .join(F.broadcast(hits.select("pct", "bucket", "cum_before",
                                          "target_rank", "bucket_n")),
                  "bucket")
            .withColumn("r", F.col("target_rank") - F.col("cum_before"))
            .select("pct", "v", "r", "bucket_n"))
    wq = W.partitionBy("pct").orderBy("v")
    # branch choice from the hits statistic itself — hits is a bounded
    # (≤ |pcts| rows) frame the callers eagerly checkpoint, so this
    # limit(1).count() is a sub-0.1 s read of materialized rows, not a
    # corpus action (AQE-style plan adaptation: a plan that always
    # CONTAINS the refined branch pays its ~8 extra stage waves even
    # when the branch filters to empty — r11 measured +1.8 s/query)
    skewed = (hits.where(F.col("bucket_n") > KTH_REFINE_CUT)
              .limit(1).count() > 0)
    direct_cand = (cand if not skewed
                   else cand.where(F.col("bucket_n") <= KTH_REFINE_CUT))
    direct = (direct_cand
              .withColumn("rk", F.row_number().over(wq))
              .where(F.col("rk") == F.col("r"))
              .select("pct", F.col("v").alias("exact_v")))
    if not skewed:
        return direct
    # refined path: oversized (skew/clamp) hit buckets
    big = cand.where(F.col("bucket_n") > KTH_REFINE_CUT) \
              .select("pct", "v", "r")
    ext = (big.groupBy("pct", "r")
           .agg(F.min("v").alias("lo"), F.max("v").alias("hi")))
    done = (ext.where(F.col("lo") == F.col("hi"))
            .select("pct", F.col("lo").alias("exact_v")))
    rest = ext.where(F.col("lo") < F.col("hi"))
    w2 = (F.col("hi") - F.col("lo") + HIST_NB) - \
        ((F.col("hi") - F.col("lo") + HIST_NB) % HIST_NB)
    rest = rest.select("pct", "lo",
                       exact_tdiv(w2, F.lit(HIST_NB)).alias("w2"))
    sub = (big.join(F.broadcast(rest), "pct")
           .withColumn("sb", exact_tdiv(F.col("v") - F.col("lo"),
                                        F.col("w2"))))
    cum2 = (sub.groupBy("pct", "r", "sb").agg(F.count("*").alias("n"))
            .withColumn("cum2", F.coalesce(
                F.sum("n").over(W.partitionBy("pct").orderBy("sb")
                                .rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0)))
            .where((F.col("cum2") < F.col("r"))
                   & (F.col("cum2") + F.col("n") >= F.col("r")))
            .select("pct", "sb", "cum2"))
    kth = (sub.join(F.broadcast(cum2), ["pct", "sb"])
           .withColumn("rk", F.row_number().over(wq))
           .where(F.col("rk") == F.col("r") - F.col("cum2"))
           .select("pct", F.col("v").alias("exact_v")))
    return direct.unionByName(kth).unionByName(done)


def hist_quantiles(buckets: DataFrame, pcts=HIST_PCTS) -> DataFrame:
    """(pct, n_total, target_rank, bucket, bucket_lo, bucket_hi,
    cum_before, bucket_n, est_cents) for HIST_PCTS from a merged
    (bucket, n) frame — window over <= HIST_NB rows, integer math
    only. Shared by batch q172 and the streaming gate read."""
    from pyspark.sql import Window as W
    from .helpers import exact_tdiv
    width = (HIST_HI - HIST_LO) // HIST_NB
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    cum = (buckets
           .withColumn("cum_before",
                       F.coalesce(F.sum("n").over(w), F.lit(0)))
           .withColumn("n_total",
                       F.sum("n").over(W.partitionBy())))
    pcts = buckets.sparkSession.createDataFrame(
        [(p,) for p in pcts], "pct int")
    tgt = (F.col("pct") * F.col("n_total")
           + (100 - F.col("pct") * F.col("n_total") % 100) % 100) / 100
    j = (cum.crossJoin(F.broadcast(pcts))
         .withColumn("target_rank", tgt.cast("bigint"))
         .where((F.col("cum_before") < F.col("target_rank"))
                & (F.col("cum_before") + F.col("n")
                   >= F.col("target_rank"))))
    lo = HIST_LO + F.col("bucket") * width
    est = lo + exact_tdiv((F.col("target_rank") - F.col("cum_before"))
                          * width, F.col("n"))
    return j.select(
        "pct", "n_total", "target_rank", "bucket",
        lo.cast("bigint").alias("bucket_lo"),
        (lo + width).cast("bigint").alias("bucket_hi"),
        "cum_before", F.col("n").alias("bucket_n"),
        est.cast("bigint").alias("est_cents"))


_SQL_HIST_W = (HIST_HI - HIST_LO) // HIST_NB

@query("q172_histogram_quantiles", f"""
WITH c AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
cl AS (
  SELECT GREATEST({HIST_LO}, LEAST({HIST_HI - 1}, cents)) AS cents,
         cents AS raw FROM c),
b AS (
  SELECT CAST(((cents - {HIST_LO}) - (cents - {HIST_LO}) % {_SQL_HIST_W})
              / {_SQL_HIST_W} AS BIGINT) AS bucket, COUNT(*) AS n
  FROM cl GROUP BY 1),
cum AS (
  SELECT bucket, n,
         COALESCE(SUM(n) OVER (ORDER BY bucket
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_before,
         SUM(n) OVER () AS n_total
  FROM b),
pcts AS (SELECT UNNEST([{", ".join(str(p) for p in HIST_PCTS)}]) AS pct),
tgt AS (
  SELECT pct, bucket, n, cum_before, CAST(n_total AS BIGINT) AS n_total,
         CAST((pct * n_total
               + (100 - pct * n_total % 100) % 100) / 100 AS BIGINT)
           AS target_rank
  FROM cum CROSS JOIN pcts),
hit AS (
  SELECT * FROM tgt
  WHERE cum_before < target_rank AND cum_before + n >= target_rank),
sk AS (
  SELECT pct, n_total, target_rank, bucket,
         CAST({HIST_LO} + bucket * {_SQL_HIST_W} AS BIGINT) AS bucket_lo,
         CAST({HIST_LO} + (bucket + 1) * {_SQL_HIST_W} AS BIGINT)
           AS bucket_hi,
         CAST(cum_before AS BIGINT) AS cum_before,
         CAST(n AS BIGINT) AS bucket_n,
         CAST({HIST_LO} + bucket * {_SQL_HIST_W}
              + ((target_rank - cum_before) * {_SQL_HIST_W}
                 - (target_rank - cum_before) * {_SQL_HIST_W} % n) / n
              AS BIGINT) AS est_cents
  FROM hit),
ranked AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk
  FROM (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem)),
ex AS (
  SELECT s.pct, r.cents AS exact_cents
  FROM sk s JOIN ranked r ON r.rk = s.target_rank)
SELECT s.pct, n_total, target_rank, bucket, bucket_lo, bucket_hi,
       cum_before, bucket_n, est_cents,
       CAST(exact_cents AS BIGINT) AS exact_cents,
       CAST(est_cents - exact_cents AS BIGINT) AS err_cents
FROM sk s JOIN ex ON s.pct = ex.pct
""")
def q172_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sk = hist_quantiles(hist_buckets(li)).localCheckpoint(eager=True)
    # exact kth values (QA yardstick), fully distributed: the CDF walk
    # above already names the hit bucket per pct, so exact_kth_by_bucket
    # ranks only the ~n/HIST_NB rows inside it — one plan, no driver
    # loop, no TakeOrdered funnel (round-10 rewrite of the r9 loop).
    # The checkpoint materializes the 3-row sketch once for both
    # consumers (output + hit-bucket broadcast).
    cents = li.select(_cents().alias("cents"))
    ex = exact_kth_by_bucket(cents, "cents", sk)
    return (sk.join(F.broadcast(ex), "pct")
            .select("pct", "n_total", "target_rank", "bucket",
                    "bucket_lo", "bucket_hi", "cum_before", "bucket_n",
                    "est_cents",
                    F.col("exact_v").cast("bigint").alias("exact_cents"),
                    (F.col("est_cents") - F.col("exact_v"))
                    .cast("bigint").alias("err_cents")))


# ---------------------------------------------------------------------------
# q173 — MAD outliers on the histogram sketch: the bounded-state,
# hash-gated sibling of q120 (whose GK-sketch internals are
# engine-private and therefore rows-only) and the sketch-regime
# counterpart of q117's exact grouped median/MAD. Median and MAD both
# come from the q172 fixed-domain bucket vector — robust-fence
# monitoring (|x - med| > K * MAD) with state that never exceeds
# HIST_NB counts no matter the corpus, the shape a 100 TB telemetry
# pipeline actually ships. With this, every rows-only entry has an
# oracled from-scratch sibling: q38 -> q169/q172, q54 -> q54b,
# q108 -> q172, q120 -> q173.
#
# Pipeline (integer-only, both engines identical): price histogram ->
# p50 walk = med_est; deviation |cents - med_est| histogram (same
# declared domain; deviations <= domain width by construction) -> p50
# walk = mad_est; fence count dev > MAD_K * mad_est is one exact
# filter-agg pass. Exact med/MAD ride along as QA yardsticks via the
# q172 TakeOrderedAndProject kth trick (driver traffic: two scalars).
#
# Scale: three scans + two bounded groupBys + two <=HIST_NB windows;
# the med/mad scalars travel as one-row broadcast frames, never
# driver-side in the sketch path.
# ---------------------------------------------------------------------------
MAD_K = 5


@query("q173_hist_mad_outliers", f"""
WITH c AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
b AS (
  SELECT CAST(((GREATEST({HIST_LO}, LEAST({HIST_HI - 1}, cents))
                - {HIST_LO})
               - (GREATEST({HIST_LO}, LEAST({HIST_HI - 1}, cents))
                  - {HIST_LO}) % {_SQL_HIST_W})
              / {_SQL_HIST_W} AS BIGINT) AS bucket, COUNT(*) AS n
  FROM c GROUP BY 1),
cum AS (
  SELECT bucket, n,
         COALESCE(SUM(n) OVER (ORDER BY bucket
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cb,
         SUM(n) OVER () AS nt
  FROM b),
med AS (
  SELECT CAST({HIST_LO} + bucket * {_SQL_HIST_W}
              + ((tr - cb) * {_SQL_HIST_W}
                 - (tr - cb) * {_SQL_HIST_W} % n) / n AS BIGINT) AS med_est,
         CAST(nt AS BIGINT) AS n_total, tr AS med_rank
  FROM (SELECT *, CAST((50 * nt + (100 - 50 * nt % 100) % 100) / 100
                       AS BIGINT) AS tr FROM cum)
  WHERE cb < tr AND cb + n >= tr),
dev AS (SELECT ABS(cents - med_est) AS d FROM c CROSS JOIN med),
db AS (
  SELECT CAST(((GREATEST({HIST_LO}, LEAST({HIST_HI - 1}, d)) - {HIST_LO})
               - (GREATEST({HIST_LO}, LEAST({HIST_HI - 1}, d))
                  - {HIST_LO}) % {_SQL_HIST_W})
              / {_SQL_HIST_W} AS BIGINT) AS bucket, COUNT(*) AS n
  FROM dev GROUP BY 1),
dcum AS (
  SELECT bucket, n,
         COALESCE(SUM(n) OVER (ORDER BY bucket
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cb,
         SUM(n) OVER () AS nt
  FROM db),
mad AS (
  SELECT CAST({HIST_LO} + bucket * {_SQL_HIST_W}
              + ((tr - cb) * {_SQL_HIST_W}
                 - (tr - cb) * {_SQL_HIST_W} % n) / n AS BIGINT) AS mad_est
  FROM (SELECT *, CAST((50 * nt + (100 - 50 * nt % 100) % 100) / 100
                       AS BIGINT) AS tr FROM dcum)
  WHERE cb < tr AND cb + n >= tr),
outl AS (
  SELECT COUNT(*) AS n_outliers
  FROM dev CROSS JOIN mad WHERE d > {MAD_K} * mad_est),
rc AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk FROM c),
exm AS (SELECT cents AS exact_med FROM rc CROSS JOIN med
        WHERE rk = med_rank),
rd AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rk FROM dev),
exd AS (SELECT d AS exact_mad FROM rd CROSS JOIN med
        WHERE rk = med_rank)
SELECT n_total, med_est, CAST(exact_med AS BIGINT) AS exact_med,
       CAST(med_est - exact_med AS BIGINT) AS err_med,
       mad_est, CAST(exact_mad AS BIGINT) AS exact_mad,
       CAST(mad_est - exact_mad AS BIGINT) AS err_mad,
       {MAD_K} AS mad_k, CAST(n_outliers AS BIGINT) AS n_outliers,
       CAST((n_outliers * 1000000 - n_outliers * 1000000 % n_total)
            / n_total AS BIGINT) AS outlier_ppm
FROM med CROSS JOIN mad CROSS JOIN outl
CROSS JOIN exm CROSS JOIN exd
""")
def q173_hist_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .helpers import exact_tdiv
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(_cents().alias("cents"))
    med_sk = (hist_quantiles(hist_buckets(li), pcts=(50,))
              .localCheckpoint(eager=True))  # sketch + hit-bucket feed
    med = med_sk.select(F.col("est_cents").alias("med_est"),
                        F.col("n_total"),
                        F.col("target_rank").alias("med_rank"))
    dev = (cents.join(F.broadcast(med))
           .select(F.abs(F.col("cents") - F.col("med_est")).alias("d")))
    mad_sk = (hist_quantiles(hist_buckets_of(dev, "d"), pcts=(50,))
              .localCheckpoint(eager=True))
    mad = mad_sk.select(F.col("est_cents").alias("mad_est"))
    outl = (dev.join(F.broadcast(mad))
            .where(F.col("d") > MAD_K * F.col("mad_est"))
            .agg(F.count("*").alias("n_outliers")))
    # exact med / MAD QA yardsticks, fully distributed (round-10
    # rewrite): each CDF walk names its hit bucket, exact_kth_by_bucket
    # ranks only that bucket's rows — no driver scalars, no TakeOrdered
    exact_med = (exact_kth_by_bucket(cents, "cents", med_sk)
                 .select(F.col("exact_v").alias("exact_med")))
    exact_mad = (exact_kth_by_bucket(dev, "d", mad_sk)
                 .select(F.col("exact_v").alias("exact_mad")))
    return (med.crossJoin(F.broadcast(mad))
            .crossJoin(F.broadcast(outl))
            .crossJoin(F.broadcast(exact_med))
            .crossJoin(F.broadcast(exact_mad))
            .select("n_total", "med_est",
                    F.col("exact_med").cast("bigint").alias("exact_med"),
                    (F.col("med_est") - F.col("exact_med")).cast("bigint")
                    .alias("err_med"),
                    "mad_est",
                    F.col("exact_mad").cast("bigint").alias("exact_mad"),
                    (F.col("mad_est") - F.col("exact_mad")).cast("bigint")
                    .alias("err_mad"),
                    F.lit(MAD_K).alias("mad_k"), "n_outliers",
                    exact_tdiv(F.col("n_outliers") * 1_000_000,
                               F.col("n_total")).alias("outlier_ppm")))
