"""Data-quality constraint suite (Deequ-style) over the relational fixtures.

The op every large-scale ingestion pipeline runs before publishing a
snapshot: a declarative set of constraints (completeness, bounds, key
uniqueness, referential integrity) evaluated in as few passes as possible,
producing one row per check. All scalar constraints fold into a SINGLE
aggregate scan of the fact table (conditional-sum columns — map-side
partial agg, one tiny final row); the referential check is the only join,
and it joins against the dimension's key column alone. At 100 TB the whole
report costs one table scan + one key anti-join, and the result is always
|checks| rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import dround, dround_sql, query


@query(
    "x40_data_quality_report",
    oracle=f"""
    WITH m AS (
      SELECT count(*) AS n,
             SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS null_qty,
             SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS disc_oob,
             count(DISTINCT (l_orderkey, l_linenumber)) AS pk_distinct,
             SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS price_nonpos
      FROM lineitem
    ), o AS (
      SELECT count(*) AS orphans
      FROM lineitem l ANTI JOIN orders d ON l.l_orderkey = d.o_orderkey
    )
    SELECT 'completeness_l_quantity' AS check_name,
           {dround_sql("(n - null_qty) / CAST(n AS DOUBLE)", 6)} AS metric,
           null_qty = 0 AS passed FROM m, o
    UNION ALL SELECT 'bounds_l_discount_0_0.1', CAST(disc_oob AS DOUBLE),
           disc_oob = 0 FROM m, o
    UNION ALL SELECT 'pk_unique_orderkey_linenumber', CAST(pk_distinct AS DOUBLE),
           pk_distinct = n FROM m, o
    UNION ALL SELECT 'positive_l_extendedprice', CAST(price_nonpos AS DOUBLE),
           price_nonpos = 0 FROM m, o
    UNION ALL SELECT 'ref_integrity_orderkey', CAST(orphans AS DOUBLE),
           orphans = 0 FROM m, o
    ORDER BY check_name
    """,
)
def x40_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over lineitem: completeness, value bounds, PK
    uniqueness, sign sanity, and orphan-key referential integrity vs
    orders. Note the fixture FAILS the PK-uniqueness check (duplicate
    (l_orderkey, l_linenumber) pairs) — the report is discriminating, not
    a tautology. One aggregate pass + one key-only anti-join."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("long")
        ).alias("disc_oob"),
        # struct-distinct: counts tuples even when a key field is NULL, matching
        # DuckDB's count(DISTINCT (a,b)) row semantics — bare countDistinct
        # silently drops NULL-keyed rows, the wrong default for a QUALITY check
        F.countDistinct(F.struct("l_orderkey", "l_linenumber")).alias("pk_distinct"),
        F.sum((F.col("l_extendedprice") <= 0).cast("long")).alias("price_nonpos"),
    )
    orphans = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("orphans"))
    )
    r = m.crossJoin(F.broadcast(orphans))  # 1 row x 1 row
    checks = F.array(
        F.struct(
            F.lit("completeness_l_quantity").alias("check_name"),
            dround((F.col("n") - F.col("null_qty")) / F.col("n"), 6).alias("metric"),
            (F.col("null_qty") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("bounds_l_discount_0_0.1").alias("check_name"),
            F.col("disc_oob").cast("double").alias("metric"),
            (F.col("disc_oob") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("pk_unique_orderkey_linenumber").alias("check_name"),
            F.col("pk_distinct").cast("double").alias("metric"),
            (F.col("pk_distinct") == F.col("n")).alias("passed"),
        ),
        F.struct(
            F.lit("positive_l_extendedprice").alias("check_name"),
            F.col("price_nonpos").cast("double").alias("metric"),
            (F.col("price_nonpos") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("ref_integrity_orderkey").alias("check_name"),
            F.col("orphans").cast("double").alias("metric"),
            (F.col("orphans") == 0).alias("passed"),
        ),
    )
    return (
        r.select(F.explode(checks).alias("c"))
        .select("c.check_name", "c.metric", "c.passed")
        .orderBy("check_name")
    )


@query(
    "x72_skew_report",
    oracle=f"""
    WITH k AS (SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS n_rows
               FROM lineitem GROUP BY l_suppkey),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(n_rows) AS BIGINT) AS total_rows,
                 CAST(max(n_rows) AS BIGINT) AS max_rows
          FROM k)
    SELECT key, n_rows, n_keys, total_rows,
           {dround_sql("n_rows * CAST(n_keys AS DOUBLE) / total_rows", 6)}
             AS skew_ratio
    FROM k, t
    ORDER BY n_rows DESC, key LIMIT 10
    """,
)
def x72_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic: the heaviest join/agg keys of a fact table
    with their load relative to a perfectly uniform distribution
    (skew_ratio = rows_for_key / avg_rows_per_key). This is the report
    you run BEFORE picking a strategy for a 100 TB join — ratio >> 1 on
    the top keys says salt (functions/skew.salted_join) or isolate, ~1
    says AQE alone is fine. One hash agg on the key, a 1-row global
    summary broadcast back over it, and a top-k (TakeOrdered — never a
    global sort)."""
    li = load(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    t = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
        F.max("n_rows").alias("max_rows"),
    ).select("n_keys", "total_rows")
    return (
        k.crossJoin(F.broadcast(t))  # 1-row global summary
        .select(
            "key",
            "n_rows",
            "n_keys",
            "total_rows",
            dround(
                F.col("n_rows") * F.col("n_keys").cast("double") / F.col("total_rows"),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(10)
    )


@query(
    "x74_distribution_drift_psi",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CAST(floor(value / 50.0) AS BIGINT) AS bucket,
             CAST(SUM(CASE WHEN ts <  TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events GROUP BY event_type, bucket),
    t AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS ta,
                 CAST(sum(cb) AS BIGINT) AS tb
          FROM b GROUP BY event_type),
    terms AS (
      SELECT b.event_type,
             CAST((CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)
                  * ln((CAST(ca AS DOUBLE) * tb) / (CAST(cb AS DOUBLE) * ta))
                  AS DECIMAL(38,6)) AS term
      FROM b JOIN t ON b.event_type = t.event_type
      WHERE ca > 0 AND cb > 0)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_buckets,
           {dround_sql("CAST(sum(term) AS DOUBLE)", 6)} AS psi
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
)
def x74_distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report: per event_type, the PSI
    between the value distribution of the first half of the month and the
    second (PSI = sum (pA - pB) ln(pA/pB) over shared buckets; > 0.2 is
    the standard 'distribution shifted, retrain/alert' threshold). The
    production-ML data-quality gate between two snapshot windows. ONE
    scan: both window counts come from conditional sums per (type,
    bucket); per-type totals are a second tiny agg joined back; buckets
    present in only one window are excluded (documented bias — the
    standard alternative is Laplace smoothing, which needs a fixed bucket
    domain). Each PSI term quantizes to DECIMAL(38,6) (x53's ln idiom)
    so summation order can't move the result between engines."""
    ev = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    b = ev.groupBy(
        "event_type", F.floor(F.col("value") / 50.0).cast("long").alias("bucket")
    ).agg(
        F.sum((F.col("ts") < cut).cast("long")).alias("ca"),
        F.sum((F.col("ts") >= cut).cast("long")).alias("cb"),
    )
    t = b.groupBy("event_type").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    ca, cb = F.col("ca").cast("double"), F.col("cb").cast("double")
    ta, tb = F.col("ta"), F.col("tb")
    term = (
        (ca / ta - cb / tb) * F.log((ca * tb) / (cb * ta))
    ).cast("decimal(38,6)")
    terms = (
        b.join(F.broadcast(t), "event_type")
        .filter((F.col("ca") > 0) & (F.col("cb") > 0))
        .select("event_type", term.alias("term"))
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            dround(F.sum("term").cast("double"), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


@query(
    "x86_snapshot_diff",
    oracle="""
    WITH old AS (SELECT o_orderkey AS k,
                        md5(CAST(o_totalprice AS VARCHAR) || '|' || o_orderstatus) AS h
                 FROM orders WHERE o_orderkey % 11 <> 0),
    new AS (SELECT o_orderkey AS k,
                   md5(CAST(CASE WHEN o_orderkey % 7 = 0
                                 THEN o_totalprice + 1.0 ELSE o_totalprice END
                            AS VARCHAR) || '|' || o_orderstatus) AS h
            FROM orders WHERE o_orderkey % 13 <> 0),
    d AS (SELECT COALESCE(old.k, new.k) AS k,
                 CASE WHEN old.k IS NULL THEN 'added'
                      WHEN new.k IS NULL THEN 'removed'
                      WHEN old.h <> new.h THEN 'changed'
                      ELSE 'unchanged' END AS change_type
          FROM old FULL OUTER JOIN new ON old.k = new.k)
    SELECT change_type, CAST(count(*) AS BIGINT) AS n,
           CAST(min(k) AS BIGINT) AS example_key
    FROM d GROUP BY change_type ORDER BY change_type
    """,
)
def x86_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table snapshot diff (the data-diff / reconciliation op every
    migration and CDC backfill needs): full-outer join two snapshots on
    the key, compare a row content hash, report added / removed /
    changed / unchanged counts with an example key each. The two
    'snapshots' are derived deterministically from orders in BOTH
    engines (keys dropped by modulus, a subset of prices perturbed), so
    the diff exercises every change class. At 100 TB this is ONE
    key-partitioned full-outer join on (key, 16-byte row hash) — the
    row hash is computed map-side so full rows never shuffle twice; for
    append-only tables swap the full join for the x37 anti-join."""
    o = load(spark, sf_dir, "orders")

    def snap(perturb: bool, drop_mod: int) -> DataFrame:
        price = (
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            )
            if perturb
            else F.col("o_totalprice")
        )
        return o.filter(F.col("o_orderkey") % drop_mod != 0).select(
            F.col("o_orderkey").alias("k"),
            F.md5(
                F.concat_ws("|", price.cast("string"), F.col("o_orderstatus"))
            ).alias("h"),
        )

    old = snap(False, 11).alias("old")
    new = snap(True, 13).alias("new")
    d = old.join(new, F.col("old.k") == F.col("new.k"), "full_outer").select(
        F.coalesce(F.col("old.k"), F.col("new.k")).alias("k"),
        F.when(F.col("old.k").isNull(), "added")
        .when(F.col("new.k").isNull(), "removed")
        .when(F.col("old.h") != F.col("new.h"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return (
        d.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("k").alias("example_key"))
        .orderBy("change_type")
    )


@query(
    "x89_join_size_precheck",
    oracle="""
    WITH a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS na
               FROM events WHERE event_type IN ('click', 'view') GROUP BY user_id),
    b AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nb
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    j AS (SELECT a.user_id, na, nb, na * nb AS contrib
          FROM a JOIN b ON a.user_id = b.user_id)
    SELECT CAST(user_id AS BIGINT) AS user_id, na, nb,
           CAST(contrib AS BIGINT) AS contrib,
           CAST(sum(contrib) OVER () AS BIGINT) AS join_total_rows
    FROM j ORDER BY contrib DESC, user_id LIMIT 10
    """,
)
def x89_join_size_precheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size precheck (the 'will this join explode?' ops tool, paired
    with the x72 skew report): the EXACT output cardinality of an inner
    equi-join is sum over keys of n_a(k) * n_b(k) — computable from two
    key histograms WITHOUT materializing the join. Emits the top-10
    contributing keys plus the total, which is the pre-flight number
    that decides between a plain join, salting (x27), or a df-cap. Two
    hash aggs + one tiny histogram join; cost is O(distinct keys), not
    O(join output) — precisely why it's safe to run before the real
    join at 100 TB."""
    ev = load(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    j = a.join(b, "user_id").select(
        "user_id", "na", "nb", (F.col("na") * F.col("nb")).alias("contrib")
    )
    return (
        j.withColumn("join_total_rows", F.sum("contrib").over(Window.partitionBy()))
        .orderBy(F.col("contrib").desc(), "user_id")
        .limit(10)
        .select("user_id", "na", "nb", "contrib", "join_total_rows")
    )


@query(
    "x120_lang_source_independence",
    oracle="""
    WITH o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
               FROM documents GROUP BY lang, source),
    rt AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS row_tot FROM o GROUP BY lang),
    ct AS (SELECT source, CAST(sum(obs) AS BIGINT) AS col_tot FROM o GROUP BY source),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM o),
    grid AS (SELECT rt.lang, ct.source, rt.row_tot, ct.col_tot, n.total,
                    COALESCE(o.obs, 0) AS obs
             FROM rt CROSS JOIN ct CROSS JOIN n
             LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source),
    cells AS (SELECT lang, source,
                     CAST((CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / total)
                          * (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / total)
                          / (CAST(row_tot AS DOUBLE) * col_tot / total)
                          AS DECIMAL(38,6)) AS term
              FROM grid),
    dims AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS k1,
                    CAST(count(DISTINCT source) AS BIGINT) AS k2
             FROM documents)
    SELECT CAST(sum(term) AS DECIMAL(18,6)) AS chi2,
           CAST((k1 - 1) * (k2 - 1) AS BIGINT) AS dof
    FROM cells CROSS JOIN dims GROUP BY k1, k2
    """,
)
def x120_lang_source_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between language and source over the
    full KxM contingency grid (x94 handled a FIXED 2x4 table with a
    generated expression; this scales to any dimensions by quantizing
    each cell's (o-e)^2/e to DECIMAL(38,6) and summing exactly — the sum
    is order-free, so no expression-ordering gymnastics needed). Large
    chi2 = languages are concentrated in particular sources, which is
    exactly what stratified sampling (x24) and mixture weights (x55)
    must then correct for. Emitted as DECIMAL so the representation
    hash is stable. Plan: one contingency hash agg + broadcast
    marginals over a KxM grid."""
    d = load(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("lang").agg(F.sum("obs").alias("row_tot"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("col_tot"))
    n = o.agg(F.sum("obs").alias("total"))
    grid = (
        rt.crossJoin(ct)
        .crossJoin(F.broadcast(n))
        .join(o, ["lang", "source"], "left")
        .fillna({"obs": 0})
    )
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("total")
    term = ((F.col("obs").cast("double") - e) * (F.col("obs").cast("double") - e) / e).cast(
        "decimal(38,6)"
    )
    dims = d.agg(
        F.countDistinct("lang").alias("k1"), F.countDistinct("source").alias("k2")
    )
    return (
        grid.select(term.alias("term"))
        .crossJoin(F.broadcast(dims))
        .groupBy("k1", "k2")
        .agg(F.sum("term").cast("decimal(18,6)").alias("chi2"))
        .select("chi2", ((F.col("k1") - 1) * (F.col("k2") - 1)).cast("long").alias("dof"))
    )


@query(
    "x143_benford_audit",
    oracle="""
    WITH v AS (SELECT CAST(floor(value * 1000000) AS BIGINT) AS m
               FROM events WHERE value > 0),
    d AS (SELECT CAST(substring(CAST(m AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM v WHERE m > 0),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
    t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM c)
    SELECT digit, n_obs,
           CAST(n_obs * 1000000 // total AS BIGINT) AS obs_ppm,
           CAST(floor(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT) AS benford_ppm,
           CAST(n_obs * 1000000 // total
                - CAST(floor(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
                AS BIGINT) AS dev_ppm
    FROM c CROSS JOIN t ORDER BY digit
    """,
)
def x143_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit (Benford) audit of the metric stream — the
    classic fabricated/synthetic-data detector: natural multiplicative
    processes put ~30.1% of leading digits at 1, while generated or
    clipped values show flat or spiked digit histograms. One conditional
    scan + a 9-row report of observed vs Benford-expected frequency.

    Engine-exactness: the leading digit is NEVER taken from a
    double's string form (engines format doubles differently) — values
    are scaled to exact integers (floor(v*10^6), identical IEEE multiply
    both sides) and the digit comes from the INTEGER's decimal string;
    expectations are floor-quantized log10 of small-integer ratios.
    Map-side digit extraction, 9-group agg: scan-bound at any scale."""
    d = load(spark, sf_dir, "events")
    m = F.floor(F.col("value") * 1_000_000).cast("long")
    dig = (
        d.filter(F.col("value") > 0)
        .select(m.alias("m"))
        .filter(F.col("m") > 0)
        .select(F.substring(F.col("m").cast("string"), 1, 1).cast("long").alias("digit"))
    )
    c = dig.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    t = c.agg(F.sum("n_obs").alias("total"))
    benford = F.floor(F.log10(1.0 + 1.0 / F.col("digit")) * 1_000_000).cast("long")
    obs = F.floor(F.col("n_obs") * 1_000_000 / F.col("total")).cast("long")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_obs",
            obs.alias("obs_ppm"),
            benford.alias("benford_ppm"),
            (obs - benford).alias("dev_ppm"),
        )
        .orderBy("digit")
    )


@query(
    "x144_bot_likeness_panel",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
               FROM events),
    g AS (SELECT user_id,
                 ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                          ORDER BY ts_us, event_id) AS gap
          FROM e),
    gs AS (SELECT user_id,
                  CAST(count(gap) AS BIGINT) AS ng,
                  CAST(sum(CAST(gap AS HUGEINT)) AS HUGEINT) AS s1,
                  CAST(sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS HUGEINT) AS s2
           FROM g WHERE gap IS NOT NULL GROUP BY user_id),
    tc AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
           FROM e GROUP BY 1, 2),
    tn AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
                  CAST(sum(c * CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sl
           FROM tc GROUP BY user_id)
    SELECT gs.user_id,
           gs.ng + 1 AS n_events,
           CAST(floor(sqrt(CAST(gs.ng * gs.s2 - gs.s1 * gs.s1 AS DOUBLE))
                      / CAST(gs.s1 AS DOUBLE) * 1000000) AS BIGINT) AS gap_cv_ppm,
           CAST(floor((ln(CAST(tn.n AS DOUBLE))
                       - CAST(tn.sl AS DOUBLE) / tn.n) * 1000000) AS BIGINT)
             AS type_entropy_micronats
    FROM gs JOIN tn ON tn.user_id = gs.user_id
    WHERE gs.ng >= 5 AND gs.s1 > 0
    ORDER BY gs.user_id
    """,
)
def x144_bot_likeness_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user bot-likeness signals — the spam/automation filter a
    training-data pipeline runs over behavioral streams before trusting
    engagement-derived labels: (a) inter-event gap REGULARITY as the
    coefficient of variation in ppm (metronome-like bots have near-zero
    CV; humans are bursty, CV >~ 1) and (b) event-type ENTROPY in
    micronats (single-action scripts pin near 0; organic sessions mix).
    Consumers threshold the two columns; this op reports signals, not
    verdicts (the x129 adjudication pattern).

    Exactness: gap moments accumulate in HUGEINT/DECIMAL(38,0) (gap^2
    reaches 10^26 — int64 would overflow silently), entropy uses the
    quantized-ln dot product (x138's idiom: per-type ln quantized to
    DECIMAL(18,6), multiplied by exact integer counts, summed exactly),
    and only the final sqrt/divide touch doubles in fixed order. Plan:
    one lag window + two hash aggs, all partitioned by user_id —
    embarrassingly parallel at 100 TB."""
    d = load(spark, sf_dir, "events")
    e = d.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = e.select(
        "user_id", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast("decimal(38,0)")
    gs = g.groupBy("user_id").agg(
        F.count("gap").alias("ng"),
        F.sum(gd).alias("s1"),
        F.sum(gd * gd).alias("s2"),
    )
    tc = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tn = tc.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c") * F.log(F.col("c").cast("double")).cast("decimal(18,6)")
        ).alias("sl"),
    )
    cv = F.floor(
        F.sqrt((F.col("ng") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
        / F.col("s1").cast("double")
        * 1_000_000
    ).cast("long")
    ent = F.floor(
        (
            F.log(F.col("n").cast("double"))
            - F.col("sl").cast("double") / F.col("n")
        )
        * 1_000_000
    ).cast("long")
    return (
        gs.join(tn, "user_id")
        .filter((F.col("ng") >= 5) & (F.col("s1") > 0))
        .select(
            "user_id",
            (F.col("ng") + 1).cast("long").alias("n_events"),
            cv.alias("gap_cv_ppm"),
            ent.alias("type_entropy_micronats"),
        )
        .orderBy("user_id")
    )


@query(
    "x153_audience_overlap",
    oracle=f"""
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
    t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS users FROM d
          GROUP BY event_type),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(count(*) AS BIGINT) AS both_users
          FROM d a JOIN d b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY type_a, type_b)
    SELECT p.type_a, p.type_b,
           ta.users AS users_a, tb.users AS users_b, p.both_users,
           {dround_sql(
               "CAST(p.both_users AS DOUBLE) / (ta.users + tb.users - p.both_users)",
               6)} AS jaccard
    FROM p JOIN t ta ON ta.event_type = p.type_a
           JOIN t tb ON tb.event_type = p.type_b
    ORDER BY type_a, type_b
    """,
)
def x153_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of event types, how many
    distinct users do BOTH, plus per-type totals and user-set Jaccard —
    the segment-overlap report behind funnel design and feature-flag
    targeting. Plan shape for 100 TB: ONE distinct (user, type) hash agg,
    then per-user type sets via collect_set (bounded: |event_types| is
    single digits), and the pair counts are generated INSIDE each user row
    with a JVM higher-order transform — no user-keyed self-join ever
    materializes the |users| x |types|^2 blowup; the only shuffles are the
    distinct and the final tiny pair agg. The oracle uses the equivalent
    self-join formulation DuckDB optimizes fine at fixture scale."""
    e = load(spark, sf_dir, "events")
    d = e.select("user_id", "event_type").distinct()
    t = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("users"))
    per_user = d.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    )
    pairs = (
        per_user.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(ts, (a, i) ->
                      transform(slice(ts, i + 2, size(ts)), b ->
                        struct(a AS type_a, b AS type_b))))
                    """
                )
            ).alias("p")
        )
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("both_users"))
    )
    ta = t.select(F.col("event_type").alias("type_a"), F.col("users").alias("users_a"))
    tb = t.select(F.col("event_type").alias("type_b"), F.col("users").alias("users_b"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            "both_users",
            dround(
                F.col("both_users").cast("double")
                / (F.col("users_a") + F.col("users_b") - F.col("both_users")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "x160_kmv_distinct_calibration",
    oracle="""
    WITH ud AS (SELECT DISTINCT event_type,
                       CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d')
                         AS entity
                FROM events),
    sc AS (SELECT event_type AS scope, entity FROM ud
           UNION
           SELECT '*union*' AS scope, entity FROM ud),
    h AS (SELECT scope, entity,
                 CAST('0x' || substring(md5(entity), 1, 15) AS BIGINT) AS hv
          FROM sc),
    r AS (SELECT scope, hv,
                 row_number() OVER (PARTITION BY scope ORDER BY hv, entity) AS rn,
                 count(*) OVER (PARTITION BY scope) AS n
          FROM h),
    k AS (SELECT scope, CAST(max(n) AS BIGINT) AS exact_count,
                 CAST(min(CASE WHEN rn = 64 THEN hv END) AS BIGINT) AS h64
          FROM r GROUP BY scope)
    SELECT scope, exact_count, h64,
           CAST(floor(63.0 * (1152921504606846976.0 / h64)) AS BIGINT)
             AS kmv_estimate
    FROM k ORDER BY scope
    """,
)
def x160_kmv_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count calibration over active user-days
    (entity = user:date) per event type plus the all-types union: keep the
    k=64 smallest 60-bit md5 hashes per scope, estimate
    |D| ~ (k-1) * 2^60 / h_(k) (Bar-Yossef et al. 2002 / theta-sketch
    family), and report it against the exact count. The property that
    matters at 100 TB is MERGEABILITY: per-partition top-64-min lists
    merge by min-merge (associative, 64 BIGINTs per partition on the
    wire), and — unlike HLL — two scopes' sketches UNION by the same
    min-merge, which is how the '*union*' row is really computed at
    scale; here both sides are built from the same exact distinct pass so
    the ESTIMATOR (not the plumbing) is what's being calibrated.
    Deterministic: md5 hashing, no RNG, exact integer k-th order
    statistic via row_number."""
    from ..functions.dedupfns import token_hash60

    e = load(spark, sf_dir, "events")
    ud = e.select(
        "event_type",
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("entity"),
    ).distinct()
    sc = ud.select(F.col("event_type").alias("scope"), "entity").union(
        ud.select(F.lit("*union*").alias("scope"), "entity").distinct()
    )
    h = sc.select("scope", "entity", token_hash60(F.col("entity")).alias("hv"))
    w = Window.partitionBy("scope").orderBy("hv", "entity")
    wc = Window.partitionBy("scope")
    r = h.select(
        "scope",
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    k = r.groupBy("scope").agg(
        F.max("n").cast("long").alias("exact_count"),
        F.min(F.when(F.col("rn") == 64, F.col("hv"))).cast("long").alias("h64"),
    )
    return k.select(
        "scope",
        "exact_count",
        "h64",
        F.floor(63.0 * (F.lit(1152921504606846976.0) / F.col("h64")))
        .cast("long")
        .alias("kmv_estimate"),
    ).orderBy("scope")


@query(
    "x171_hll_distinct_calibration",
    oracle="""
    WITH ud AS (SELECT DISTINCT event_type,
                       CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d')
                         AS entity
                FROM events),
    h AS (SELECT event_type,
                 CAST('0x' || substring(md5(entity), 1, 15) AS BIGINT) AS hv
          FROM ud),
    reg AS (SELECT event_type, hv % 1024 AS bucket, hv // 1024 AS w FROM h),
    rho AS (SELECT event_type, bucket,
                   CASE WHEN w = 0 THEN 51
                        ELSE 51 - length(bin(w)) END AS rho
            FROM reg),
    mx AS (SELECT event_type, bucket, CAST(max(rho) AS BIGINT) AS m
           FROM rho GROUP BY 1, 2),
    et AS (SELECT DISTINCT event_type FROM ud),
    full_reg AS (SELECT et.event_type, t.b AS bucket,
                        coalesce(mx.m, 0) AS m
                 FROM et CROSS JOIN (SELECT unnest(range(0, 1024)) AS b) t
                 LEFT JOIN mx ON mx.event_type = et.event_type
                             AND mx.bucket = t.b),
    z AS (SELECT event_type,
                 CAST(sum(CAST(2251799813685248 AS HUGEINT) * 2 // (2 ** m))
                   AS HUGEINT) AS z_den,
                 CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
          FROM full_reg GROUP BY event_type),
    ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_count
           FROM ud GROUP BY event_type),
    est AS (SELECT z.event_type, ex.exact_count, z.v,
                   CAST(CAST('1701329333966688515960864768' AS HUGEINT)
                        // z.z_den // 1000000 AS BIGINT) AS raw_est
            FROM z JOIN ex USING (event_type)),
    fin AS (SELECT event_type, exact_count, v,
                   CASE WHEN v > 0 AND raw_est <= 2560
                        THEN CAST(floor(1024 * CAST(ln(1024.0 / v)
                                                    AS DECIMAL(18,6))) AS BIGINT)
                        ELSE raw_est END AS hll_estimate
            FROM est)
    SELECT event_type, exact_count, v AS empty_buckets, hll_estimate,
           CAST(abs(hll_estimate - exact_count) * 1000000 // exact_count
                AS BIGINT) AS err_ppm
    FROM fin ORDER BY event_type
    """,
)
def x171_hll_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count calibration on the SAME user-day
    statistic as x160's KMV sketch — the algorithm behind Spark's own
    approx_count_distinct, rebuilt deterministically so the estimator
    itself is hash-checkable: p=10 (1024 registers), 60-bit md5 hash
    split into bucket (low 10 bits) and a 50-bit word w whose
    leading-zero rank rho = 51 - bitlen(w) feeds a per-bucket MAX. The
    harmonic mean runs in EXACT integers — each register contributes
    2^(51-m), so Z_den = sum fits (and commutes) in 62 bits, and the
    raw estimate alpha_1024 * m^2 * 2^51 / Z_den is one HUGEINT/DECIMAL
    floor-division chain; the small-range branch (V empty registers,
    raw <= 2.5m) switches to linear counting m*ln(m/V) through the
    quantized-ln idiom x118/x140 already rely on. Registers are a
    FIXED 1024 BIGINTs per scope merged by MAX — the flat-at-any-scale
    sketch contract (cf. docs/SCALING.md x159/x160/x163 probes), and
    the reason approx_count_distinct survives 100 TB while exact
    distinct shuffles the world. err_ppm closes the loop: measured
    error vs the ~3.25% theoretical RSE at m=1024."""
    from ..functions.dedupfns import token_hash60

    e = load(spark, sf_dir, "events")
    ud = e.select(
        "event_type",
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("entity"),
    ).distinct()
    h = ud.select("event_type", token_hash60(F.col("entity")).alias("hv"))
    reg = h.select(
        "event_type",
        (F.col("hv") % 1024).alias("bucket"),
        F.expr("hv div 1024").alias("w"),
    )
    rho = reg.select(
        "event_type",
        "bucket",
        F.when(F.col("w") == 0, F.lit(51))
        .otherwise(F.lit(51) - F.length(F.bin("w")))
        .alias("rho"),
    )
    mx = rho.groupBy("event_type", "bucket").agg(
        F.max("rho").cast("long").alias("m")
    )
    et = ud.select("event_type").distinct()
    buckets = et.select(
        "event_type", F.explode(F.sequence(F.lit(0), F.lit(1023))).alias("bucket")
    )
    full_reg = buckets.join(mx, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce(F.col("m"), F.lit(0)).alias("m")
    )
    z = full_reg.groupBy("event_type").agg(
        F.sum(F.expr("CAST(2251799813685248 AS BIGINT) * 2 div CAST(pow(2, m) AS BIGINT)"))
        .alias("z_den"),
        F.sum((F.col("m") == 0).cast("long")).alias("v"),
    )
    ex = ud.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_count"))
    est = z.join(ex, "event_type").select(
        "event_type",
        "exact_count",
        "v",
        F.expr(
            "CAST(CAST('1701329333966688515960864768' AS DECIMAL(38,0)) div z_den"
            " AS DECIMAL(38,0)) div 1000000"
        )
        .cast("long")
        .alias("raw_est"),
    )
    fin = est.select(
        "event_type",
        "exact_count",
        "v",
        F.when(
            (F.col("v") > 0) & (F.col("raw_est") <= 2560),
            F.floor(
                1024
                * F.log(1024.0 / F.col("v")).cast("decimal(18,6)")
            ).cast("long"),
        )
        .otherwise(F.col("raw_est"))
        .alias("hll_estimate"),
    )
    return fin.select(
        "event_type",
        "exact_count",
        F.col("v").alias("empty_buckets"),
        "hll_estimate",
        F.expr("abs(hll_estimate - exact_count) * 1000000 div exact_count")
        .cast("long")
        .alias("err_ppm"),
    ).orderBy("event_type")


@query(
    "x177_weighted_sample",
    oracle="""
    WITH h AS (SELECT doc_id, n_chars,
                      CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                           AS BIGINT) AS hv
               FROM documents
               WHERE n_chars > 0),
    k AS (SELECT doc_id, n_chars,
                 CAST(-CAST(ln(hv / 1152921504606846976.0) AS DECIMAL(18,6))
                      * 1000000 AS BIGINT) // n_chars AS key_scaled
          FROM h),
    r AS (SELECT doc_id, n_chars, key_scaled,
                 row_number() OVER (ORDER BY key_scaled, doc_id) AS rn
          FROM k)
    SELECT doc_id, n_chars, CAST(key_scaled AS BIGINT) AS key_scaled,
           CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 20 ORDER BY rank
    """,
)
def x177_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis 2006,
    the A-ES scheme production pipelines use for quality- or
    length-weighted corpus subsampling): each item draws u in (0,1) and
    the k largest u^(1/w) win — equivalently the k SMALLEST ln(u)/w,
    which is what both engines rank. Reproducibility replaces RNG: u is
    the doc's 60-bit md5 clock over 2^60 (the x57/x130b idiom), so the
    sample is identical across engines, runs, and (critically) across
    INCREMENTS — re-running on a grown corpus preserves previously
    selected survivors' keys, giving a mergeable weighted reservoir:
    per-partition local top-k, then merge-min — the same flat
    communication contract as the KMV sketch. The selection key is the
    POSITIVE -ln(u)/w ranked ascending (equivalent to largest
    u^(1/w)), quantized decimal ln then exact integer floor-division by
    the weight — kept positive deliberately: Spark's `div` truncates
    toward zero while DuckDB's `//` floors, and the two only agree on
    non-negative operands. Weight = n_chars. Plan: one narrow scan,
    TakeOrdered(20) — no shuffle of the corpus."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    k = d.select(
        "doc_id",
        "n_chars",
        F.expr(
            "CAST(-CAST(ln({h} / 1152921504606846976.0) AS DECIMAL(18,6))"
            " * 1000000 AS BIGINT) div n_chars".format(
                h="CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            )
        ).alias("key_scaled"),
    )
    # top-20 as sort-limit (TakeOrderedAndProject — per-partition local
    # top-k, driver merge: the mergeable-reservoir contract from the
    # docstring, literally); the rank window then covers 20 rows only
    top = k.orderBy("key_scaled", "doc_id").limit(20)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy("key_scaled", "doc_id"))
        .cast("long"),
    ).orderBy("rank")


@query(
    "x178_windowed_hll_users",
    oracle="""
    WITH ud AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    h AS (SELECT day, user_id,
                 CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
                      AS BIGINT) AS hv
          FROM ud),
    reg AS (SELECT day, hv % 1024 AS bucket,
                   CAST(max(CASE WHEN hv // 1024 = 0 THEN 51
                            ELSE 51 - length(bin(hv // 1024)) END) AS BIGINT)
                     AS m
            FROM h GROUP BY 1, 2),
    tgt AS (SELECT reg.bucket, reg.m,
                   strftime(CAST(reg.day AS DATE) + INTERVAL (t.i) DAY,
                            '%Y-%m-%d') AS wday
            FROM reg CROSS JOIN (SELECT unnest(range(0, 7)) AS i) t),
    merged AS (SELECT wday AS day, bucket, CAST(max(m) AS BIGINT) AS m
               FROM tgt WHERE wday IN (SELECT day FROM days)
               GROUP BY 1, 2),
    z AS (SELECT day,
                 CAST(sum(CAST(2251799813685248 AS HUGEINT) * 2 // (2 ** m))
                      + (1024 - count(*)) * CAST(4503599627370496 AS HUGEINT)
                   AS HUGEINT) AS z_den,
                 CAST(1024 - count(*) AS BIGINT) AS v
          FROM merged GROUP BY day),
    exact AS (SELECT d2.day, CAST(count(DISTINCT ud.user_id) AS BIGINT)
                       AS exact_users
              FROM days d2 JOIN ud
                ON CAST(ud.day AS DATE) <= CAST(d2.day AS DATE)
               AND CAST(ud.day AS DATE) >= CAST(d2.day AS DATE) - INTERVAL 6 DAY
              GROUP BY d2.day),
    est AS (SELECT z.day, exact.exact_users, z.v,
                   CAST(CAST('1701329333966688515960864768' AS HUGEINT)
                        // z.z_den // 1000000 AS BIGINT) AS raw_est
            FROM z JOIN exact USING (day)),
    fin AS (SELECT day, exact_users, v,
                   CASE WHEN v > 0 AND raw_est <= 2560
                        THEN CAST(floor(1024 * CAST(ln(1024.0 / v)
                                                    AS DECIMAL(18,6))) AS BIGINT)
                        ELSE raw_est END AS hll_estimate
            FROM est)
    SELECT day, exact_users, hll_estimate,
           CAST(abs(hll_estimate - exact_users) * 1000000 // exact_users
                AS BIGINT) AS err_ppm
    FROM fin ORDER BY day
    """,
)
def x178_windowed_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day via HLL register MERGE —
    the pattern that actually runs at 100 TB: registers are built ONCE
    per (day, bucket) from that day's users, and every window answer is
    a per-bucket MAX over the window's daily sketches; the raw user
    stream is never rescanned or recounted per window (exact sliding
    distinct would re-shuffle every user-day 7 times — here only the
    <= 1024-row daily sketches replicate). Same deterministic p=10
    estimator as x171 (integer harmonic mean, LC branch), so the whole
    windowed pipeline is hash-checked against a per-window exact
    distinct. Replication uses the explode-to-target-days trick every
    sliding op here rides; partial per-day registers also merge
    across PARTITIONS by the same max, which is the sketch's
    decomposable-agg contract."""
    from ..functions.dedupfns import token_hash60

    e = load(spark, sf_dir, "events")
    ud = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).distinct()
    days = ud.select("day").distinct()
    h = ud.select("day", token_hash60(F.col("user_id").cast("string")).alias("hv"))
    reg = (
        h.select(
            "day",
            (F.col("hv") % 1024).alias("bucket"),
            F.expr("hv div 1024").alias("w"),
        )
        .select(
            "day",
            "bucket",
            F.when(F.col("w") == 0, F.lit(51))
            .otherwise(F.lit(51) - F.length(F.bin("w")))
            .alias("rho"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").cast("long").alias("m"))
    )
    tgt = reg.select(
        "bucket",
        "m",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        F.col("day"),
    ).select(
        F.date_format(F.date_add(F.to_date("day"), F.col("i")), "yyyy-MM-dd").alias(
            "day"
        ),
        "bucket",
        "m",
    )
    merged = (
        tgt.join(F.broadcast(days), "day")
        .groupBy("day", "bucket")
        .agg(F.max("m").alias("m"))
    )
    z = merged.groupBy("day").agg(
        (
            F.sum(
                F.expr(
                    "CAST(2251799813685248 AS BIGINT) * 2 div CAST(pow(2, m) AS BIGINT)"
                )
            )
            + (1024 - F.count(F.lit(1))) * F.lit(4503599627370496)
        ).alias("z_den"),
        (1024 - F.count(F.lit(1))).cast("long").alias("v"),
    )
    d2 = days.select(F.col("day").alias("wday"))
    exact = (
        ud.join(
            F.broadcast(d2),
            (F.to_date("day") <= F.to_date("wday"))
            & (F.to_date("day") >= F.date_sub(F.to_date("wday"), 6)),
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .select(F.col("wday").alias("day"), "exact_users")
    )
    est = z.join(exact, "day").select(
        "day",
        "exact_users",
        "v",
        F.expr(
            "CAST(CAST('1701329333966688515960864768' AS DECIMAL(38,0)) div z_den"
            " AS DECIMAL(38,0)) div 1000000"
        )
        .cast("long")
        .alias("raw_est"),
    )
    fin = est.select(
        "day",
        "exact_users",
        F.when(
            (F.col("v") > 0) & (F.col("raw_est") <= 2560),
            F.floor(1024 * F.log(1024.0 / F.col("v")).cast("decimal(18,6)")).cast(
                "long"
            ),
        )
        .otherwise(F.col("raw_est"))
        .alias("hll_estimate"),
    )
    return fin.select(
        "day",
        "exact_users",
        "hll_estimate",
        F.expr("abs(hll_estimate - exact_users) * 1000000 div exact_users")
        .cast("long")
        .alias("err_ppm"),
    ).orderBy("day")


@query(
    "x181_k_anonymity_audit",
    oracle="""
    WITH eq AS (SELECT c_nationkey, c_mktsegment,
                       CAST(count(*) AS BIGINT) AS class_size,
                       CAST(count(DISTINCT CAST(floor(c_acctbal / 1000)
                            AS BIGINT)) AS BIGINT) AS l_div
                FROM customer GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n_rows FROM eq),
    ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
    SELECT k,
           CAST(count(*) FILTER (WHERE class_size < k) AS BIGINT)
             AS n_small_classes,
           CAST(COALESCE(sum(class_size) FILTER (WHERE class_size < k), 0)
                AS BIGINT) AS rows_at_risk,
           CAST(COALESCE(sum(class_size) FILTER (WHERE class_size < k), 0)
                * 1000000 // max(n_rows) AS BIGINT) AS at_risk_ppm,
           CAST(min(l_div) AS BIGINT) AS min_l_diversity
    FROM ks CROSS JOIN eq CROSS JOIN tot
    GROUP BY k ORDER BY k
    """,
)
def x181_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release audit over quasi-identifiers: k-anonymity (how many
    (nation, segment) equivalence classes are smaller than k, and what
    fraction of ROWS they expose) for k in {2,5,10,20}, plus the table's
    l-diversity floor on the sensitive attribute (account-balance
    kilobucket) — the pre-flight check a training-data pipeline runs
    before shipping per-user aggregates, complementing x14i's regex-level
    PII scrubbing with the re-identification-by-joining risk the regexes
    cannot see. All integers exact, share in ppm via integer div. Plan:
    ONE hash agg over the QI pair builds the class table (count +
    count distinct per class); the k-sweep is a 4-row broadcast cross
    join over the tiny class table — at 100 TB the only corpus-sized job
    is the groupBy, which partial-aggregates map-side."""
    c = load(spark, sf_dir, "customer")
    eq = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000).cast("long")
        ).alias("l_div"),
    )
    tot = eq.agg(F.sum("class_size").alias("n_rows"))
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (2, 5, 10, 20)])).alias("k")
    )
    small = F.col("class_size") < F.col("k")
    return (
        eq.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.count(F.when(small, 1)).alias("n_small_classes"),
            F.coalesce(F.sum(F.when(small, F.col("class_size"))), F.lit(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.expr(
                "coalesce(sum(CASE WHEN class_size < k THEN class_size END), 0)"
                " * 1000000 div max(n_rows)"
            )
            .cast("long")
            .alias("at_risk_ppm"),
            F.min("l_div").cast("long").alias("min_l_diversity"),
        )
        .orderBy("k")
    )


@query(
    "x183_source_lang_mi",
    oracle="""
    WITH o AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
               FROM documents GROUP BY 1, 2),
    rt AS (SELECT source, CAST(sum(obs) AS BIGINT) AS s_tot FROM o GROUP BY 1),
    ct AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS l_tot FROM o GROUP BY 1),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM o),
    cells AS (SELECT CAST(obs * ln(CAST(obs AS DOUBLE) * total
                          / (CAST(s_tot AS DOUBLE) * l_tot))
                     AS DECIMAL(28,6)) AS c
              FROM o JOIN rt USING (source) JOIN ct USING (lang)
                     CROSS JOIN n),
    hs AS (SELECT CAST(sum(CAST(-s_tot * ln(CAST(s_tot AS DOUBLE) / total)
                     AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS hsrc
           FROM rt CROSS JOIN n),
    hl AS (SELECT CAST(sum(CAST(-l_tot * ln(CAST(l_tot AS DOUBLE) / total)
                     AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS hlang
           FROM ct CROSS JOIN n)
    SELECT {mi} AS mi_nats,
           {hsv} AS h_source_nats,
           {hlv} AS h_lang_nats,
           {nmi} AS nmi
    FROM (SELECT CAST(sum(c) AS DECIMAL(28,6)) AS ms FROM cells)
         CROSS JOIN hs CROSS JOIN hl CROSS JOIN n
    """.format(
        mi=dround_sql("CAST(ms AS DOUBLE) / total", 6),
        hsv=dround_sql("CAST(hsrc AS DOUBLE) / total", 6),
        hlv=dround_sql("CAST(hlang AS DOUBLE) / total", 6),
        nmi=dround_sql(
            "CAST(ms AS DOUBLE) / sqrt(CAST(hsrc AS DOUBLE)"
            " * CAST(hlang AS DOUBLE))",
            6,
        ),
    ),
)
def x183_source_lang_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(source; lang) in nats, with both marginal
    entropies and the sqrt-normalized NMI — the information-theoretic
    complement to x120's chi-square: chi2 says WHETHER source and
    language are dependent, MI says HOW MANY BITS one leaks about the
    other, which is what a mixture designer (x55/x151) actually budgets
    with (NMI ~ 1 means per-source sampling IS per-language sampling).
    Every cell is count * ln(count * N / (row_tot * col_tot)) — one IEEE
    ln per cell on exact integers, quantized DECIMAL(28,6) then summed
    exactly, divided by N once at the end (the x140 discipline, so both
    engines agree per cell). Plan: one K x M contingency hash agg plus
    two marginal aggs of it; everything after is broadcast-scalar
    algebra over <= K*M rows."""
    d = load(spark, sf_dir, "documents")
    o = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("source").agg(F.sum("obs").alias("s_tot"))
    ct = o.groupBy("lang").agg(F.sum("obs").alias("l_tot"))
    n = o.agg(F.sum("obs").alias("total"))
    cells = (
        o.join(F.broadcast(rt), "source")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(n))
        .select(
            (
                F.col("obs")
                * F.log(
                    F.col("obs").cast("double")
                    * F.col("total")
                    / (F.col("s_tot").cast("double") * F.col("l_tot"))
                )
            )
            .cast("decimal(28,6)")
            .alias("c")
        )
    )
    ms = cells.agg(F.sum("c").cast("decimal(28,6)").alias("ms"))
    hs = (
        rt.crossJoin(F.broadcast(n))
        .select(
            (
                -F.col("s_tot")
                * F.log(F.col("s_tot").cast("double") / F.col("total"))
            )
            .cast("decimal(28,6)")
            .alias("h")
        )
        .agg(F.sum("h").cast("decimal(28,6)").alias("hsrc"))
    )
    hl = (
        ct.crossJoin(F.broadcast(n))
        .select(
            (
                -F.col("l_tot")
                * F.log(F.col("l_tot").cast("double") / F.col("total"))
            )
            .cast("decimal(28,6)")
            .alias("h")
        )
        .agg(F.sum("h").cast("decimal(28,6)").alias("hlang"))
    )
    return (
        ms.crossJoin(F.broadcast(hs))
        .crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(n))
        .select(
            dround(F.col("ms").cast("double") / F.col("total"), 6).alias(
                "mi_nats"
            ),
            dround(F.col("hsrc").cast("double") / F.col("total"), 6).alias(
                "h_source_nats"
            ),
            dround(F.col("hlang").cast("double") / F.col("total"), 6).alias(
                "h_lang_nats"
            ),
            dround(
                F.col("ms").cast("double")
                / F.sqrt(
                    F.col("hsrc").cast("double") * F.col("hlang").cast("double")
                ),
                6,
            ).alias("nmi"),
        )
    )


@query(
    "x184_calibration_curve",
    oracle="""
    WITH d AS (SELECT lang,
                      string_split(text, ' ') AS toks
               FROM documents),
    sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  len(list_filter(toks, t -> t IN
                      ('a','the','of','and','to','in'))) AS hits,
                  len(toks) AS n_toks
           FROM d),
    p AS (SELECT y,
                 least(hits * 5 * 1000000 // n_toks, 1000000) AS p_ppm
          FROM sc),
    b AS (SELECT least(p_ppm * 10 // 1000000, 9) AS bin, y, p_ppm FROM p)
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
           CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS obs_rate_ppm,
           CAST(abs(sum(p_ppm) // count(*)
                    - sum(y) * 1000000 // count(*)) AS BIGINT) AS gap_ppm
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def x184_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for a classifier score — here the stopword-
    density 'English-ness' score (the x14c quality component, clamped to
    [0,1]) judged against the labeled lang column: per score decile, the
    mean predicted probability vs the observed positive rate and their
    gap, all in exact ppm integers (score as hits*5e6 div tokens — the
    integer twin of min(1, stopword_ratio*5), so binning is bit-exact
    across engines). This is the eval loop any learned quality/language
    filter needs before its threshold is trusted at 100 TB — an
    uncalibrated score makes x107-style curation silently over- or
    under-prune. Plan: one scan computing (y, p) per doc map-side, one
    10-bin hash agg; nothing leaves the executors but 10 rows."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in ("a", "the", "of", "and", "to", "in")])
    sc = d.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias(
            "hits"
        ),
        F.size(toks).alias("n_toks"),
    )
    p = sc.select(
        "y",
        F.least(
            # promote BEFORE the multiply: hits is a 32-bit int (F.size),
            # so ~430+ stopword hits would overflow hits*5e6 under ANSI
            F.expr("cast(hits as bigint) * 5000000 div n_toks"),
            F.lit(1_000_000),
        ).alias("p_ppm"),
    )
    b = p.select(
        F.least(F.expr("p_ppm * 10 div 1000000"), F.lit(9)).alias("bin"),
        "y",
        "p_ppm",
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("sum(p_ppm) div count(1)").cast("long").alias(
                "mean_pred_ppm"
            ),
            F.expr("sum(y) * 1000000 div count(1)").cast("long").alias(
                "obs_rate_ppm"
            ),
            F.expr(
                "abs(sum(p_ppm) div count(1)"
                " - sum(y) * 1000000 div count(1))"
            )
            .cast("long")
            .alias("gap_ppm"),
        )
        .orderBy("bin")
    )


@query(
    "x185_cohens_kappa",
    oracle="""
    WITH lab AS (SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
                        CASE WHEN len(string_split(text, ' ')) >= 40
                             THEN 1 ELSE 0 END AS b
                 FROM documents),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a * b) AS BIGINT) AS n11,
                 CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00,
                 CAST(sum(a) AS BIGINT) AS na1,
                 CAST(sum(b) AS BIGINT) AS nb1
          FROM lab)
    SELECT n, n11, n00,
           CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_ppm,
           CAST((na1 * nb1 + (n - na1) * (n - nb1)) * 1000000 // (n * n)
                AS BIGINT) AS pe_ppm,
           CAST((n * (n11 + n00) - (na1 * nb1 + (n - na1) * (n - nb1)))
                * 1000000
                // (n * n - (na1 * nb1 + (n - na1) * (n - nb1)))
                AS BIGINT) AS kappa_ppm
    FROM c
    """,
)
def x185_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two annotators — here two label heuristics
    (char-length >= 200 vs token-count >= 40) standing in for any pair of
    raters/models/heuristic versions: observed agreement po, chance
    agreement pe from the marginals, and kappa = (po - pe)/(1 - pe), all
    EXACT integer ppm (the whole statistic reduces to one ratio of
    integer polynomials in the 2x2 cell counts, so no floating point
    exists to diverge). The agreement audit an eval pipeline runs before
    trusting labels enough to train a filter on them. Plan: one
    conditional-sum scan (map-side partial agg) to the 2x2 table; the
    kappa algebra is a 1-row projection."""
    d = load(spark, sf_dir, "documents")
    lab = d.select(
        (F.col("n_chars") >= 200).cast("long").alias("a"),
        (F.size(F.split("text", " ")) >= 40).cast("long").alias("b"),
    )
    c = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
        F.sum("a").alias("na1"),
        F.sum("b").alias("nb1"),
    )
    return c.select(
        F.col("n").cast("long"),
        F.col("n11").cast("long"),
        F.col("n00").cast("long"),
        F.expr("(n11 + n00) * 1000000 div n").cast("long").alias("po_ppm"),
        # decimal(38,0) headroom: n*n and the kappa polynomial overflow
        # BIGINT past n ~ 3e9 rows (the x167 lesson); DuckDB's // promotes
        # to HUGEINT on its own
        F.expr(
            "(cast(na1 as decimal(38,0)) * nb1 + (n - na1) * (n - nb1))"
            " * 1000000 div (cast(n as decimal(38,0)) * n)"
        )
        .cast("long")
        .alias("pe_ppm"),
        F.expr(
            "(cast(n as decimal(38,0)) * (n11 + n00)"
            " - (cast(na1 as decimal(38,0)) * nb1 + (n - na1) * (n - nb1)))"
            " * 1000000"
            " div (cast(n as decimal(38,0)) * n"
            "      - (cast(na1 as decimal(38,0)) * nb1"
            "         + (n - na1) * (n - nb1)))"
        )
        .cast("long")
        .alias("kappa_ppm"),
    )


@query(
    "x187_quality_auc",
    oracle="""
    WITH d AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  least(CAST(len(list_filter(toks, t -> t IN
                            ('a','the','of','and','to','in'))) AS BIGINT)
                        * 5000000 // len(toks), 1000000) AS p
           FROM d),
    r AS (SELECT y,
                 2 * (rank() OVER (ORDER BY p) - 1)
                   + count(*) OVER (PARTITION BY p) + 1 AS mr2
          FROM sc),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS npos,
                 CAST(count(*) - sum(y) AS BIGINT) AS nneg,
                 CAST(sum(CASE WHEN y = 1 THEN mr2 ELSE 0 END) AS HUGEINT)
                   AS rpos2
          FROM r)
    SELECT n, npos, nneg,
           CAST((rpos2 - CAST(npos AS HUGEINT) * (npos + 1)) * 1000000
                // (2 * CAST(npos AS HUGEINT) * nneg) AS BIGINT) AS auc_ppm
    FROM a
    """,
)
def x187_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the stopword-density 'English-ness' score against the
    lang label — the threshold-free companion to x184's calibration
    curve (calibration says the score's VALUES are honest; AUC says its
    ORDERING separates the classes at all). Computed as the exact
    Mann-Whitney U with midrank tie handling — and the ranks never
    materialize per row: ranks over a score value are contiguous, so the
    positives' midrank sum collapses onto the count-of-counts table
    (doubled midrank of value group = 2*cum_before + count + 1; carrying
    2x keeps every term integral), the x182/x176 decomposition. The only
    ordered window runs over |distinct score values| <= 1e6 rows by
    construction (the score is an integer ppm); products ride
    decimal(38,0). The oracle computes per-row window midranks, proving
    the closed form IS the midrank sum."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in ("a", "the", "of", "and", "to", "in")])
    sc = d.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.least(
            F.expr(
                "cast(size(filter(split(text, ' '),"
                " t -> array_contains(array('a','the','of','and','to','in'), t)))"
                " as bigint) * 5000000 div size(split(text, ' '))"
            ),
            F.lit(1_000_000).cast("bigint"),
        ).alias("p"),
    )
    cc = sc.groupBy("p").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("pos")
    )
    wcum = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    cum = cc.select(
        "p",
        "c",
        "pos",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("cb"),
    )
    a = cum.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("npos"),
        F.sum(F.col("c") - F.col("pos")).cast("long").alias("nneg"),
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (2 * F.col("cb") + F.col("c") + 1).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("rpos2"),
    )
    return a.select(
        "n",
        "npos",
        "nneg",
        F.expr(
            "(rpos2 - cast(npos as decimal(38,0)) * (npos + 1)) * 1000000"
            " div (2 * cast(npos as decimal(38,0)) * nneg)"
        )
        .cast("long")
        .alias("auc_ppm"),
    )


@query(
    "x188_spearman_signals",
    oracle="""
    WITH s AS (SELECT n_chars,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
               FROM documents),
    r AS (SELECT 2 * (rank() OVER (ORDER BY n_chars) - 1)
                   + count(*) OVER (PARTITION BY n_chars) + 1 AS rx,
                 2 * (rank() OVER (ORDER BY n_toks) - 1)
                   + count(*) OVER (PARTITION BY n_toks) + 1 AS ry
          FROM s),
    a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(rx) AS HUGEINT) AS sx,
                 CAST(sum(ry) AS HUGEINT) AS sy,
                 CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy,
                 CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy
          FROM r)
    SELECT CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
    FROM a
    """,
)
def x188_spearman_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two document signals (n_chars
    vs token count) with exact midrank tie handling — the monotone-
    association audit a curation pipeline runs before treating two
    quality signals as independent evidence (x91 fuses ranks assuming
    they add information; rho ~ 1 says one of them is redundant).
    Scale shape: NO per-row rank window — each signal's midrank is a
    function of its VALUE, so the rank maps are value-domain aggregates
    (|distinct n_chars| and |distinct token counts| rows) broadcast back
    onto the corpus; doubled midranks keep all sums integral in
    decimal(38,0) (Spearman is invariant to the 2x affine scale), and
    only the final rho divides as a double, rounded once to 1e-6 (the
    x183 discipline)."""
    d = load(spark, sf_dir, "documents")
    s = d.select(
        "n_chars", F.size(F.split("text", " ")).cast("long").alias("n_toks")
    )

    def mr2_map(col: str):
        cc = s.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        wcum = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return cc.select(
            col,
            (
                2 * F.coalesce(F.sum("c").over(wcum), F.lit(0))
                + F.col("c")
                + 1
            ).alias(f"mr2_{col}"),
        )

    j = s.join(F.broadcast(mr2_map("n_chars")), "n_chars").join(
        F.broadcast(mr2_map("n_toks")), "n_toks"
    )
    rx = F.col("mr2_n_chars").cast("decimal(38,0)")
    ry = F.col("mr2_n_toks").cast("decimal(38,0)")
    a = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(rx).cast("decimal(38,0)").alias("sx"),
        F.sum(ry).cast("decimal(38,0)").alias("sy"),
        F.sum(rx * ry).cast("decimal(38,0)").alias("sxy"),
        F.sum(rx * rx).cast("decimal(38,0)").alias("sxx"),
        F.sum(ry * ry).cast("decimal(38,0)").alias("syy"),
    )
    num = F.expr("cast(n as decimal(38,0)) * sxy - sx * sy").cast("double")
    den = F.sqrt(
        F.expr("cast(n as decimal(38,0)) * sxx - sx * sx").cast("double")
        * F.expr("cast(n as decimal(38,0)) * syy - sy * sy").cast("double")
    )
    return a.select("n", F.round(num / den, 6).alias("rho"))


@query(
    "x190_mcnemar_lid",
    oracle="""
    WITH d AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    p AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 CASE WHEN CAST(len(list_filter(toks, t -> t IN
                          ('a','the','of','and','to','in'))) AS BIGINT)
                      * 5000000 // len(toks) >= 500000
                      THEN 1 ELSE 0 END AS a,
                 CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END AS b
          FROM d),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN a = y THEN 1 ELSE 0 END) AS BIGINT)
                   AS a_ok,
                 CAST(sum(CASE WHEN b = y THEN 1 ELSE 0 END) AS BIGINT)
                   AS b_ok,
                 CAST(sum(CASE WHEN a = y AND b <> y THEN 1 ELSE 0 END)
                      AS BIGINT) AS b01,
                 CAST(sum(CASE WHEN a <> y AND b = y THEN 1 ELSE 0 END)
                      AS BIGINT) AS b10
          FROM p)
    SELECT n,
           CAST(a_ok * 1000000 // n AS BIGINT) AS a_acc_ppm,
           CAST(b_ok * 1000000 // n AS BIGINT) AS b_acc_ppm,
           b01, b10,
           CASE WHEN b01 + b10 = 0 THEN 0
                ELSE CAST(greatest(abs(b01 - b10) - 1, 0)
                          * greatest(abs(b01 - b10) - 1, 0) * 1000000
                          // (b01 + b10) AS BIGINT)
           END AS mcnemar_chi2_ppm
    FROM c
    """,
)
def x190_mcnemar_lid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (continuity-corrected) between two language-ID
    heuristics judged against the lang label: stopword-density >= 0.1
    (classifier A, the x184/x187 score thresholded) vs contains-'the'
    (classifier B). Kappa (x185) asks whether two raters AGREE; McNemar
    asks whether two classifiers have DIFFERENT accuracy — it looks only
    at the discordant cells (A right & B wrong vs the reverse), which is
    the statistically-correct paired comparison for 'did the new filter
    version actually improve?' on the same eval set. All integer: the
    2x2 discordance counts come from one conditional-sum scan, the
    statistic (|b01-b10|-1)^2 / (b01+b10) is emitted as floored ppm with
    an explicit 0 guard for no-discordance. Plan: one map-side partial
    agg to 5 counters; the algebra is a 1-row projection. The counters
    are commutative sums, so the SAME aggregation (functions/evalfns.py)
    runs as the streaming twin — an O(1)-state complete-mode monitor
    pinned to this row in tests/test_streaming_eval.py."""
    from ..functions.evalfns import confusion_mcnemar, lid_labels

    d = load(spark, sf_dir, "documents")
    return confusion_mcnemar(lid_labels(d))


@query(
    "x194_gain_chart",
    oracle="""
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
               FROM documents),
    sc AS (SELECT doc_id,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  least(CAST(len(list_filter(toks, t -> t IN
                            ('a','the','of','and','to','in'))) AS BIGINT)
                        * 5000000 // len(toks), 1000000) AS p
           FROM d),
    t AS (SELECT y, ntile(10) OVER (ORDER BY p DESC, y, doc_id) AS decile
          FROM sc),
    g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS npos
          FROM t GROUP BY decile),
    c AS (SELECT decile, n, npos,
                 CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
                 CAST(sum(npos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
                 CAST(sum(n) OVER () AS BIGINT) AS tot_n,
                 CAST(sum(npos) OVER () AS BIGINT) AS tot_pos
          FROM g)
    SELECT decile, n, npos, cum_pos,
           CAST(cum_pos * 1000000 // tot_pos AS BIGINT) AS gain_ppm,
           CAST(CAST(cum_pos AS HUGEINT) * tot_n * 1000000
                // (CAST(cum_n AS HUGEINT) * tot_pos) AS BIGINT) AS lift_ppm
    FROM c ORDER BY decile
    """,
)
def x194_gain_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift chart of the stopword-density score
    against the lang label: rank the corpus by score descending, cut
    into exact deciles, and report per decile the positives captured so
    far (gain) and the capture rate vs random (lift) — the curve that
    tells a curation operator 'score-filter the top 30% and you keep
    92% of the English docs'. AUC (x187) summarizes this curve to one
    number; operators threshold on the curve itself. r11: ties within a
    score value count NEGATIVES first (order p DESC, y, doc_id) — the
    conservative convention (a boundary that splits an equal-score group
    never credits the filter with positives the score can't actually
    find), and it makes the whole curve a pure function of the
    (score, label) count table, which is what lets the streaming twin
    (streaming/drift.py gain_chart_from_counts) reproduce it from
    bounded value-domain state; the previous doc_id-only tie-break made
    boundary rows depend on arbitrary ids. Scale shape: the
    corpus-sized decile assignment rides ``distributed_ntile`` (exact
    window-NTILE semantics, no SinglePartition sort — the oracle's
    plain window ntile proves it); the cumulative stage is a 10-row
    window. Lift products ride decimal(38,0) (cum_pos * tot_n overflows
    BIGINT past ~3e9 x 3e9)."""
    from ..functions.skew import distributed_ntile

    d = load(spark, sf_dir, "documents")
    sc = d.select(
        "doc_id",
        (F.col("lang") == "en").cast("long").alias("y"),
        F.least(
            F.expr(
                "cast(size(filter(split(text, ' '),"
                " t -> array_contains(array('a','the','of','and','to','in'), t)))"
                " as bigint) * 5000000 div size(split(text, ' '))"
            ),
            F.lit(1_000_000).cast("bigint"),
        ).alias("p"),
    )
    t = distributed_ntile(
        sc,
        10,
        [F.col("p").desc(), F.col("y"), F.col("doc_id")],
        tile_name="decile",
    )
    g = t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("npos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "decile",
        "n",
        "npos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("npos").over(wc).alias("cum_pos"),
        F.sum("n").over(wt).alias("tot_n"),
        F.sum("npos").over(wt).alias("tot_pos"),
    )
    return c.select(
        F.col("decile").cast("int"),
        F.col("n").cast("long"),
        F.col("npos").cast("long"),
        F.col("cum_pos").cast("long"),
        F.expr("cum_pos * 1000000 div tot_pos").cast("long").alias(
            "gain_ppm"
        ),
        F.expr(
            "cast(cum_pos as decimal(38,0)) * tot_n * 1000000"
            " div (cast(cum_n as decimal(38,0)) * tot_pos)"
        )
        .cast("long")
        .alias("lift_ppm"),
    ).orderBy("decile")


@query(
    "x195_brier_score",
    oracle="""
    WITH d AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  least(CAST(len(list_filter(toks, t -> t IN
                            ('a','the','of','and','to','in'))) AS BIGINT)
                        * 5000000 // len(toks), 1000000) AS p
           FROM d)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST((p - y * 1000000) * (p - y * 1000000) AS HUGEINT))
                // count(*) AS BIGINT) AS brier_ppt,
           CAST(sum(CASE WHEN y = 1
                         THEN CAST((1000000 - p) * (1000000 - p) AS HUGEINT)
                         ELSE 0 END)
                // greatest(sum(y), 1) AS BIGINT) AS brier_pos_ppt,
           CAST(sum(CASE WHEN y = 0 THEN CAST(p * p AS HUGEINT)
                         ELSE 0 END)
                // greatest(count(*) - sum(y), 1) AS BIGINT) AS brier_neg_ppt
    FROM sc
    """,
)
def x195_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the stopword-density probability against the lang
    label, overall and per class — the strictly-proper scoring rule that
    completes the r9 eval panel: AUC (x187) grades the ORDERING,
    calibration (x184) grades the VALUES bin-by-bin, Brier grades both
    at once in one number, and its per-class split exposes the failure
    mode (a score can be sharp on positives and useless on negatives).
    All integer: with p in ppm, (p - y*1e6)^2 is exact, per-doc <= 1e12,
    summed in decimal(38,0) and floor-divided by the class count —
    emitted as parts-per-trillion. Plan: one map-side conditional-sum
    scan; 1-row projection; no windows, no joins."""
    d = load(spark, sf_dir, "documents")
    sc = d.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.least(
            F.expr(
                "cast(size(filter(split(text, ' '),"
                " t -> array_contains(array('a','the','of','and','to','in'), t)))"
                " as bigint) * 5000000 div size(split(text, ' '))"
            ),
            F.lit(1_000_000).cast("bigint"),
        ).alias("p"),
    )
    sq = "cast((p - y * 1000000) as decimal(38,0))"
    return sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            f"cast(sum({sq} * {sq}) div count(1) as bigint)"
        ).alias("brier_ppt"),
        F.expr(
            "cast(sum(case when y = 1 then"
            " cast((1000000 - p) as decimal(38,0))"
            " * cast((1000000 - p) as decimal(38,0)) else 0 end)"
            " div greatest(sum(y), 1) as bigint)"
        ).alias("brier_pos_ppt"),
        F.expr(
            "cast(sum(case when y = 0 then"
            " cast(p as decimal(38,0)) * cast(p as decimal(38,0))"
            " else 0 end)"
            " div greatest(count(1) - sum(y), 1) as bigint)"
        ).alias("brier_neg_ppt"),
    )


@query(
    "x200_quantile_sketch",
    oracle="""
    WITH h AS (SELECT source, n_chars,
                      CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                           AS BIGINT) AS hv
               FROM documents),
    hist AS (SELECT source, n_chars,
                    CAST(count(*) AS BIGINT) AS c,
                    CAST(sum(CASE WHEN hv < 144115188075855872 THEN 1 ELSE 0 END)
                         AS BIGINT) AS sc
             FROM h GROUP BY 1, 2),
    cum AS (SELECT source, n_chars, c, sc,
                   CAST(sum(c) OVER w AS BIGINT) AS cum_c,
                   CAST(sum(sc) OVER w AS BIGINT) AS cum_s
            FROM hist
            WINDOW w AS (PARTITION BY source ORDER BY n_chars
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(sc) AS BIGINT) AS sample_n
            FROM hist GROUP BY source),
    sel AS (SELECT cum.source,
                   min(CASE WHEN cum_c >= (n + 1) // 2 THEN n_chars END) AS exact_p50,
                   min(CASE WHEN cum_c >= (9 * n + 9) // 10 THEN n_chars END) AS exact_p90,
                   min(CASE WHEN cum_s >= (sample_n + 1) // 2 THEN n_chars END) AS est_p50,
                   min(CASE WHEN cum_s >= (9 * sample_n + 9) // 10 THEN n_chars END) AS est_p90
            FROM cum JOIN tot ON cum.source = tot.source
            GROUP BY cum.source)
    SELECT tot.source, n, sample_n,
           CAST(exact_p50 AS BIGINT) AS exact_p50,
           CAST(est_p50 AS BIGINT) AS est_p50,
           CAST(abs(est_p50 - exact_p50) * 1000000 // exact_p50 AS BIGINT)
             AS err50_ppm,
           CAST(exact_p90 AS BIGINT) AS exact_p90,
           CAST(est_p90 AS BIGINT) AS est_p90,
           CAST(abs(est_p90 - exact_p90) * 1000000 // exact_p90 AS BIGINT)
             AS err90_ppm
    FROM sel JOIN tot ON sel.source = tot.source
    ORDER BY tot.source
    """,
)
def x200_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch calibration — the missing member of the sketch
    family (CMS x159 / KMV x160 / Bloom x163 / HLL x171 / theta x189
    calibrate frequency, cardinality and membership; this calibrates
    ORDER STATISTICS): per-source p50/p90 of doc length estimated from a
    deterministic 1/8-rate sample vs the exact quantile, error in ppm.

    The sketch is threshold sampling on the doc's 60-bit md5 clock
    (hv < 2^60/8, the x177 idiom): one corpus pass, rate-bounded state,
    and MERGEABLE by construction — the union of two partitions' samples
    IS the sample of their union (same fixed threshold, disjoint ids), so
    shards combine like any mergeable summary, which is what t-digest/KLL
    buy in production and what a rate-tuned sample buys here exactly and
    engine-reproducibly. Both the estimate and the truth read ONE shared
    value histogram: groupBy (source, n_chars) carrying total + sampled
    counts, cumulated over a window bounded by |distinct lengths per
    source| (never corpus-sized — the x188 value-domain discipline), then
    quantile = min value whose cumulative count reaches ceil(p*n), the
    same closed form in both engines. At 100 TB the histogram is the only
    shuffle and its width is the value domain, not the row count."""
    d = load(spark, sf_dir, "documents")
    hv = (
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    hist = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(
            F.expr(f"CASE WHEN {hv} < 144115188075855872 THEN 1 ELSE 0 END")
        ).alias("sc"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "source",
        "n_chars",
        F.sum("c").over(w).alias("cum_c"),
        F.sum("sc").over(w).alias("cum_s"),
    )
    tot = hist.groupBy("source").agg(
        F.sum("c").alias("n"), F.sum("sc").alias("sample_n")
    )
    # ceil(p * n) ranks as exact integer div — identical in both engines
    ranks = tot.select(
        "source",
        "n",
        "sample_n",
        F.expr("(n + 1) div 2").alias("r50c"),
        F.expr("(9 * n + 9) div 10").alias("r90c"),
        F.expr("(sample_n + 1) div 2").alias("r50s"),
        F.expr("(9 * sample_n + 9) div 10").alias("r90s"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("n_chars")))  # noqa: E731
    sel = (
        cum.join(F.broadcast(ranks), "source")
        .groupBy("source")
        .agg(
            pick(F.col("cum_c") >= F.col("r50c")).alias("exact_p50"),
            pick(F.col("cum_c") >= F.col("r90c")).alias("exact_p90"),
            pick(F.col("cum_s") >= F.col("r50s")).alias("est_p50"),
            pick(F.col("cum_s") >= F.col("r90s")).alias("est_p90"),
        )
    )
    return (
        sel.join(F.broadcast(tot), "source")
        .select(
            "source",
            F.col("n").cast("long").alias("n"),
            F.col("sample_n").cast("long").alias("sample_n"),
            F.col("exact_p50").cast("long").alias("exact_p50"),
            F.col("est_p50").cast("long").alias("est_p50"),
            F.expr("abs(est_p50 - exact_p50) * 1000000 div exact_p50")
            .cast("long")
            .alias("err50_ppm"),
            F.col("exact_p90").cast("long").alias("exact_p90"),
            F.col("est_p90").cast("long").alias("est_p90"),
            F.expr("abs(est_p90 - exact_p90) * 1000000 div exact_p90")
            .cast("long")
            .alias("err90_ppm"),
        )
        .orderBy("source")
    )


@query(
    "x249_ipf_raking",
    oracle="""
    WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
                   FROM documents GROUP BY source, lang),
    dims AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                    CAST(count(DISTINCT source) AS BIGINT) AS ks,
                    CAST(count(DISTINCT lang) AS BIGINT) AS kl
             FROM cells),
    w0 AS (SELECT source, lang, n, CAST(1000000 AS HUGEINT) AS w,
                  nn // ks AS tr, nn // kl AS tc
           FROM cells, dims),
    r1 AS (SELECT w0.*,
                  CAST(w * ((CAST(tr AS HUGEINT) * 1000000000000)
                       // (sum(CAST(n AS HUGEINT) * w)
                           OVER (PARTITION BY source)))
                       // 1000000 AS HUGEINT) AS w1
           FROM w0),
    c1 AS (SELECT r1.*,
                  CAST(w1 * ((CAST(tc AS HUGEINT) * 1000000000000)
                       // (sum(CAST(n AS HUGEINT) * w1)
                           OVER (PARTITION BY lang)))
                       // 1000000 AS HUGEINT) AS w2
           FROM r1),
    r2 AS (SELECT c1.*,
                  CAST(w2 * ((CAST(tr AS HUGEINT) * 1000000000000)
                       // (sum(CAST(n AS HUGEINT) * w2)
                           OVER (PARTITION BY source)))
                       // 1000000 AS HUGEINT) AS w3
           FROM c1),
    c2 AS (SELECT r2.*,
                  CAST(w3 * ((CAST(tc AS HUGEINT) * 1000000000000)
                       // (sum(CAST(n AS HUGEINT) * w3)
                           OVER (PARTITION BY lang)))
                       // 1000000 AS HUGEINT) AS w4
           FROM r2),
    rerr AS (SELECT source,
                    CAST(abs(sum(CAST(n AS HUGEINT) * w4) // 1000000
                             - any_value(tr)) * 1000000
                         // any_value(tr) AS BIGINT) AS row_err_ppm
             FROM c2 GROUP BY source)
    SELECT c2.source, c2.lang, c2.n,
           CAST(c2.w4 AS BIGINT) AS w_ppm,
           CAST(CAST(c2.n AS HUGEINT) * c2.w4 // 1000000 AS BIGINT)
               AS weighted_n,
           rerr.row_err_ppm
    FROM c2 JOIN rerr ON rerr.source = c2.source
    ORDER BY c2.source, c2.lang
    """,
)
def x249_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of per-(source, lang)
    sample weights so the weighted corpus hits BALANCED marginals —
    equal mass per source AND equal mass per lang simultaneously (the
    two-constraint version of x36's per-source quota: a quota cap fixes
    one marginal and silently skews the other; IPF alternately rescales
    rows and columns until both hold). Two full row+column rounds are
    unrolled — the classic fast-converging case since the fixture table
    is dense — in pure integer-ppm arithmetic: every scaling factor is
    the exact `div` ratio target/current on decimal(38,0), so Spark and
    DuckDB walk bit-identical weight trajectories (the x168 PageRank
    idiom applied to a marginal-matching loop; the oracle rides HUGEINT
    because DuckDB's // ROUNDS on decimal operands — a new entry in the
    cross-engine trap list — while Spark's decimal `div` truncates). Output: final cell
    weights, the weighted counts, and the residual row-marginal error
    after the last COLUMN step (the honest convergence diagnostic —
    column marginals are exact by construction at that point). Plan: one
    corpus pass builds the |sources| x |langs| cell table; all four
    scaling steps are windows over that bounded table."""
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return ipf_rake(cells)


def ipf_rake(cells: DataFrame) -> DataFrame:
    """The x249 raking derivation as a pure function of the (source,
    lang, n) cell table — shared by the batch query and the streaming
    twin (streaming/drift.py source_lang_counts + this = a live mixture
    monitor whose complete-mode state is the bounded cell table). The
    cell table is localCheckpointed first: the derivation consumes it in
    four window steps plus the residual join, and without the cut the
    static plan re-derives the corpus aggregation per consumer (4 scans
    — materializing |sources| x |langs| rows once keeps it at 1)."""
    cells = cells.localCheckpoint(eager=True)
    dims = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.countDistinct("source").cast("long").alias("ks"),
        F.countDistinct("lang").cast("long").alias("kl"),
    )
    w0 = cells.crossJoin(F.broadcast(dims)).select(
        "source",
        "lang",
        "n",
        F.lit(1000000).cast("decimal(38,0)").alias("w"),
        F.expr("nn div ks").alias("tr"),
        F.expr("nn div kl").alias("tc"),
    )

    # each scaling step: window-sum the weighted counts over the bounded
    # cell table, then the exact integer-ppm rescale
    def step(df, wcol, out, part, tgt):
        wsum = Window.partitionBy(part)
        with_cur = df.withColumn(
            "__cur",
            F.sum(F.col("n").cast("decimal(38,0)") * F.col(wcol)).over(wsum),
        )
        return with_cur.withColumn(
            out,
            F.expr(
                f"cast({wcol} * ((cast({tgt} as decimal(38,0))"
                f" * 1000000000000) div __cur) div 1000000"
                " as decimal(38,0))"
            ),
        ).drop("__cur")

    r1 = step(w0, "w", "w1", "source", "tr")
    c1 = step(r1, "w1", "w2", "lang", "tc")
    r2 = step(c1, "w2", "w3", "source", "tr")
    c2 = step(r2, "w3", "w4", "lang", "tc")
    rerr = (
        c2.groupBy("source")
        .agg(
            F.expr(
                "cast(abs(sum(cast(n as decimal(38,0)) * w4) div 1000000"
                " - any_value(tr)) * 1000000 div any_value(tr) as bigint)"
            ).alias("row_err_ppm")
        )
    )
    return (
        c2.join(F.broadcast(rerr), "source")
        .select(
            "source",
            "lang",
            "n",
            F.col("w4").cast("long").alias("w_ppm"),
            F.expr(
                "cast(cast(n as decimal(38,0)) * w4 div 1000000 as bigint)"
            ).alias("weighted_n"),
            "row_err_ppm",
        )
        .orderBy("source", "lang")
    )


@query(
    "x253_quantile_normalize_length",
    oracle="""
    WITH sl AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
                FROM documents GROUP BY source, n_chars),
    sc AS (SELECT source, n_chars, c,
                  CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars)
                       AS HUGEINT) AS cum_src,
                  CAST(sum(c) OVER (PARTITION BY source) AS HUGEINT) AS n_src
           FROM sl),
    cl AS (SELECT n_chars AS m_chars, CAST(count(*) AS BIGINT) AS cc
           FROM documents GROUP BY n_chars),
    cc AS (SELECT m_chars,
                  CAST(sum(cc) OVER (ORDER BY m_chars) AS HUGEINT)
                      AS cum_corp,
                  CAST(sum(cc) OVER () AS HUGEINT) AS n_corp
           FROM cl)
    SELECT sc.source, sc.n_chars, CAST(sc.c AS BIGINT) AS c,
           CAST(min(cc.m_chars) AS BIGINT) AS mapped_chars
    FROM sc JOIN cc
      ON cc.cum_corp * sc.n_src >= sc.cum_src * cc.n_corp
    GROUP BY sc.source, sc.n_chars, sc.c
    ORDER BY sc.source, sc.n_chars
    """,
)
def x253_quantile_normalize_length(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile normalization of each source's length distribution onto
    the CORPUS length distribution — the batch-effect-removal transform
    (map a doc at its source's p-th length percentile to the corpus
    p-th percentile) that makes length-based quality thresholds
    comparable across sources whose raw scales differ (x197 profiles
    the decile SHIFT; this emits the actual value-domain mapping a
    filter would apply). The percentile lookup is the exact integer
    cross-multiply (corpus_cdf(L) * n_src >= src_cdf(x) * n_corp, no
    division) with min-L selection, so both engines produce the
    identical map. Plan: two value-domain aggregations (per-source and
    corpus length histograms), one broadcast range-join between them —
    the corpus never re-scans; all windows run over length histograms,
    never rows. Products ride HUGEINT/decimal(38,0) (cdf x count passes
    2^63 at corpus scale)."""
    d = load(spark, sf_dir, "documents")
    # bounded |sources| x |lengths| histogram, consumed by both the
    # per-source CDF and the corpus rollup: cut once (one corpus scan)
    sl = (
        d.groupBy("source", "n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    wsrc = Window.partitionBy("source").orderBy("n_chars")
    wsrcall = Window.partitionBy("source")
    sc = sl.select(
        "source",
        "n_chars",
        "c",
        F.sum("c").over(wsrc).cast("decimal(38,0)").alias("cum_src"),
        F.sum("c").over(wsrcall).cast("decimal(38,0)").alias("n_src"),
    )
    # corpus histogram = rollup of the per-source histogram: one corpus
    # scan feeds both sides of the percentile lookup
    cl = sl.groupBy(F.col("n_chars").alias("m_chars")).agg(
        F.sum("c").cast("long").alias("cc")
    )
    wcorp = Window.orderBy("m_chars")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ccum = cl.select(
        "m_chars",
        F.sum("cc").over(wcorp).cast("decimal(38,0)").alias("cum_corp"),
        F.sum("cc").over(wall).cast("decimal(38,0)").alias("n_corp"),
    )
    return (
        sc.join(
            F.broadcast(ccum),
            F.col("cum_corp") * F.col("n_src")
            >= F.col("cum_src") * F.col("n_corp"),
        )
        .groupBy("source", "n_chars", "c")
        .agg(F.min("m_chars").cast("long").alias("mapped_chars"))
        .orderBy("source", "n_chars")
    )


@query(
    "x252_shard_rebalance_audit",
    oracle="""
    WITH pre AS (SELECT doc_id,
                        arg_max(s, CAST('0x' || substring(md5(
                            CAST(doc_id AS VARCHAR) || '#'
                            || CAST(s AS VARCHAR)), 1, 15) AS BIGINT))
                            AS shard_before
                 FROM documents, (SELECT unnest(range(0, 32)) AS s)
                 GROUP BY doc_id),
    post AS (SELECT doc_id,
                    arg_max(s, CAST('0x' || substring(md5(
                        CAST(doc_id AS VARCHAR) || '#'
                        || CAST(s AS VARCHAR)), 1, 15) AS BIGINT))
                        AS shard_after
             FROM documents, (SELECT unnest(range(0, 33)) AS s)
             GROUP BY doc_id),
    j AS (SELECT pre.shard_before, post.shard_after
          FROM pre JOIN post ON post.doc_id = pre.doc_id),
    shards AS (SELECT unnest(range(0, 33)) AS shard)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(coalesce(sum(CASE WHEN shard_before = shard
                                  THEN 1 END), 0) AS BIGINT) AS n_before,
           CAST(coalesce(sum(CASE WHEN shard_after = shard
                                  THEN 1 END), 0) AS BIGINT) AS n_after,
           CAST(coalesce(sum(CASE WHEN shard_before = shard
                                  AND shard_after = 32
                                  THEN 1 END), 0) AS BIGINT) AS moved_out
    FROM shards LEFT JOIN j ON TRUE
    GROUP BY shard ORDER BY shard
    """,
)
def x252_shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment audit for the
    doc corpus: per-shard load under 32 shards, under 33, and exactly
    which docs move — the consistent-hashing property a 100 TB
    embedding/index layer depends on (HRW moves ONLY docs whose new
    argmax IS the added shard, ~1/33 of the corpus; modulo sharding
    would reshuffle ~97%). Deterministic md5 weights make both engines
    compute the identical assignment; the audit emits the 33-row load
    table with the moved-out column, whose total over the before-shards
    is the migration bill. Plan: one corpus pass exploded x33 (a
    map-side constant fan-out, the x221-style fixed probe cost), one
    argmax hash-agg per regime keyed on doc_id, a self-join on doc_id,
    and a 33-row rollup. At scale the explode fan-out is the operator's
    honest linear cost — weight evaluation per (doc, shard) — exactly
    what HRW costs in any router."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    w = F.expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), '#',"
        " cast(s as string))), 1, 15), 16, 10) as bigint)"
    )

    def assign(n_shards, out):
        return (
            d.select(
                "doc_id",
                F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias(
                    "s"
                ),
            )
            .select("doc_id", "s", w.alias("wt"))
            .groupBy("doc_id")
            .agg(F.max_by("s", "wt").alias(out))
        )

    j = assign(32, "shard_before").join(assign(33, "shard_after"), "doc_id")
    shards = spark.range(0, 33).select(F.col("id").cast("long").alias("shard"))
    agg = j.groupBy("shard_before", "shard_after").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        shards.join(F.broadcast(agg), F.lit(True), "left")
        .groupBy("shard")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("shard_before") == F.col("shard"), F.col("c"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_before"),
            F.coalesce(
                F.sum(F.when(F.col("shard_after") == F.col("shard"), F.col("c"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_after"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("shard_before") == F.col("shard"))
                        & (F.col("shard_after") == 32),
                        F.col("c"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("moved_out"),
        )
        .orderBy("shard")
    )


@query(
    "x257_raking_ess",
    oracle="""
    WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
                   FROM documents GROUP BY source, lang),
    dims AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                    CAST(count(DISTINCT source) AS BIGINT) AS ks,
                    CAST(count(DISTINCT lang) AS BIGINT) AS kl
             FROM cells),
    w0 AS (SELECT source, lang, n, CAST(1000000 AS HUGEINT) AS w,
                  nn // ks AS tr, nn // kl AS tc
           FROM cells, dims),
    r1 AS (SELECT w0.*,
                  CAST(w * ((CAST(tr AS HUGEINT) * 1000000000000)
                       // (sum(CAST(n AS HUGEINT) * w)
                           OVER (PARTITION BY source)))
                       // 1000000 AS HUGEINT) AS w1
           FROM w0),
    c1 AS (SELECT r1.*,
                  CAST(w1 * ((CAST(tc AS HUGEINT) * 1000000000000)
                       // (sum(CAST(n AS HUGEINT) * w1)
                           OVER (PARTITION BY lang)))
                       // 1000000 AS HUGEINT) AS w2
           FROM r1),
    r2 AS (SELECT c1.*,
                  CAST(w2 * ((CAST(tr AS HUGEINT) * 1000000000000)
                       // (sum(CAST(n AS HUGEINT) * w2)
                           OVER (PARTITION BY source)))
                       // 1000000 AS HUGEINT) AS w3
           FROM c1),
    c2 AS (SELECT r2.*,
                  CAST(w3 * ((CAST(tc AS HUGEINT) * 1000000000000)
                       // (sum(CAST(n AS HUGEINT) * w3)
                           OVER (PARTITION BY lang)))
                       // 1000000 AS HUGEINT) AS w4
           FROM r2)
    SELECT CAST(sum(n) AS BIGINT) AS n_docs,
           CAST((CAST(sum(n * w4) AS HUGEINT)
                 * CAST(sum(n * w4) AS HUGEINT))
                // sum(CAST(n AS HUGEINT) * w4 * w4) AS BIGINT) AS ess,
           CAST((CAST(sum(n * w4) AS HUGEINT)
                 * CAST(sum(n * w4) AS HUGEINT)) * 1000000
                // (sum(CAST(n AS HUGEINT) * w4 * w4)
                    * CAST(sum(n) AS HUGEINT)) AS BIGINT) AS ess_ppm,
           CAST(max(w4) AS BIGINT) AS max_w_ppm,
           CAST(min(w4) AS BIGINT) AS min_w_ppm
    FROM c2
    """,
)
def x257_raking_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the x249 raking weights — the one-row
    diagnostic that says what balanced marginals COST: ESS =
    (sum n*w)^2 / sum n*w^2 collapses toward n_docs when the raked
    weights are mild and toward |cells| when a rare (source, lang) cell
    forces extreme upweighting (x146 asks this for DSIR's doc-level
    weights; this is the cell-level version a mixture designer reads
    next to x249's weight table — ESS_ppm < ~500000 means the balanced
    target is fighting the corpus and the crawl plan, not the weights,
    should change). Exact: the weight trajectory is x249's integer-ppm
    walk verbatim; the ESS ratio is one integer cross-multiply on
    HUGEINT/decimal(38,0). Plan: x249's cell-table cost plus a 1-row
    reduction."""
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = ipf_rake(cells).select(
        "n", F.col("w_ppm").cast("decimal(38,0)").alias("w4")
    )
    return w.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.expr(
            "cast((cast(sum(n * w4) as decimal(38,0))"
            " * cast(sum(n * w4) as decimal(38,0)))"
            " div sum(cast(n as decimal(38,0)) * w4 * w4) as bigint)"
        ).alias("ess"),
        F.expr(
            "cast((cast(sum(n * w4) as decimal(38,0))"
            " * cast(sum(n * w4) as decimal(38,0))) * 1000000"
            " div (sum(cast(n as decimal(38,0)) * w4 * w4)"
            " * cast(sum(n) as decimal(38,0))) as bigint)"
        ).alias("ess_ppm"),
        F.max("w4").cast("long").alias("max_w_ppm"),
        F.min("w4").cast("long").alias("min_w_ppm"),
    )


@query(
    "x259_dp_count_release",
    oracle="""
    WITH RECURSIVE pw(k, p) AS (
        SELECT 0, CAST(1000000000000000000 AS HUGEINT)
        UNION ALL
        SELECT k + 1, p * 368 // 1000 FROM pw WHERE k < 127 AND p > 0),
    pn AS (SELECT k, lead(p) OVER (ORDER BY k) AS pnext FROM pw),
    g AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
          GROUP BY source),
    t AS (SELECT source, n,
                 (CAST(4503599627370496 - u1 AS HUGEINT)
                  * 1000000000000000000) // 4503599627370496 AS th1,
                 (CAST(4503599627370496 - u2 AS HUGEINT)
                  * 1000000000000000000) // 4503599627370496 AS th2
          FROM (SELECT source, n,
                       CAST('0x' || substring(md5(source || '#g1'), 1, 13)
                            AS BIGINT) AS u1,
                       CAST('0x' || substring(md5(source || '#g2'), 1, 13)
                            AS BIGINT) AS u2
                FROM g)),
    g1 AS (SELECT source, CAST(min(k) AS BIGINT) AS geo1
           FROM t JOIN pn ON pn.pnext IS NOT NULL AND pn.pnext <= t.th1
           GROUP BY source),
    g2 AS (SELECT source, CAST(min(k) AS BIGINT) AS geo2
           FROM t JOIN pn ON pn.pnext IS NOT NULL AND pn.pnext <= t.th2
           GROUP BY source)
    SELECT t.source, t.n,
           CAST(g1.geo1 - g2.geo2 AS BIGINT) AS noise,
           CAST(t.n + g1.geo1 - g2.geo2 AS BIGINT) AS noisy_n,
           CAST(greatest(t.n + g1.geo1 - g2.geo2, 0) AS BIGINT)
               AS noisy_n_clamped
    FROM t JOIN g1 ON g1.source = t.source
           JOIN g2 ON g2.source = t.source
    ORDER BY t.source
    """,
)
def x259_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc counts released through the discrete-Laplace
    (two-sided geometric) mechanism at eps = ln(1000/368) ~ 1.0 — the
    count-release side of the privacy family (x181 audits
    re-identification risk; this is the standard remedy for publishing
    the counts at all). Construction: noise = G1 - G2 with G ~
    Geometric(1 - alpha) inverted from a fixed md5 test clock, and the
    alpha-power CDF table is an exact integer walk p_k+1 = p_k * 368
    div 1000 built by a recursive CTE (Spark 4 WITH RECURSIVE, the x161
    surface) — every comparison is HUGEINT/decimal cross-multiply, so
    both engines draw the identical noise. The fixed clock makes the
    MECHANISM testable (inverse-CDF plumbing, tail cap, clamping as
    post-processing); a production release swaps the clock for real
    entropy and keeps every other line. Plan: the power table is 128
    rows broadcast against the |sources| count table; the corpus cost
    is the one count agg."""
    d = load(spark, sf_dir, "documents")
    d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).createOrReplaceTempView("x259_counts")
    return spark.sql(
        """
        WITH RECURSIVE pw(k, p) AS (
            SELECT 0, CAST(1000000000000000000 AS DECIMAL(38,0))
            UNION ALL
            SELECT k + 1, CAST(p * 368 div 1000 AS DECIMAL(38,0))
            FROM pw WHERE k < 127 AND p > 0),
        pn AS (SELECT k, lead(p) OVER (ORDER BY k) AS pnext FROM pw),
        t AS (SELECT source, n,
                     (CAST(4503599627370496 - u1 AS DECIMAL(38,0))
                      * 1000000000000000000) div 4503599627370496 AS th1,
                     (CAST(4503599627370496 - u2 AS DECIMAL(38,0))
                      * 1000000000000000000) div 4503599627370496 AS th2
              FROM (SELECT source, n,
                           cast(conv(substring(md5(concat(source, '#g1')),
                                1, 13), 16, 10) as bigint) AS u1,
                           cast(conv(substring(md5(concat(source, '#g2')),
                                1, 13), 16, 10) as bigint) AS u2
                    FROM x259_counts)),
        g1 AS (SELECT source, CAST(min(k) AS BIGINT) AS geo1
               FROM t JOIN pn ON pn.pnext IS NOT NULL AND pn.pnext <= t.th1
               GROUP BY source),
        g2 AS (SELECT source, CAST(min(k) AS BIGINT) AS geo2
               FROM t JOIN pn ON pn.pnext IS NOT NULL AND pn.pnext <= t.th2
               GROUP BY source)
        SELECT t.source, t.n,
               CAST(g1.geo1 - g2.geo2 AS BIGINT) AS noise,
               CAST(t.n + g1.geo1 - g2.geo2 AS BIGINT) AS noisy_n,
               CAST(greatest(t.n + g1.geo1 - g2.geo2, 0) AS BIGINT)
                   AS noisy_n_clamped
        FROM t JOIN g1 ON g1.source = t.source
               JOIN g2 ON g2.source = t.source
        ORDER BY t.source
        """
    )


@query(
    "x263_operating_point",
    oracle="""
    WITH d AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  least(CAST(len(list_filter(toks, t -> t IN
                            ('a','the','of','and','to','in'))) AS BIGINT)
                        * 5000000 // len(toks), 1000000) AS p
           FROM d),
    cc AS (SELECT p, CAST(count(*) AS BIGINT) AS c,
                  CAST(sum(y) AS BIGINT) AS pos
           FROM sc GROUP BY p),
    tot AS (SELECT CAST(sum(pos) AS BIGINT) AS npos,
                   CAST(sum(c - pos) AS BIGINT) AS nneg
            FROM cc),
    cum AS (SELECT p,
                   CAST(sum(pos) OVER (ORDER BY p DESC) AS BIGINT) AS tp,
                   CAST(sum(c - pos) OVER (ORDER BY p DESC) AS BIGINT) AS fp
            FROM cc),
    m AS (SELECT cum.p, cum.tp, cum.fp,
                 tot.npos - cum.tp AS fn, tot.nneg - cum.fp AS tn,
                 CAST(cum.tp AS HUGEINT) * tot.nneg
                     - CAST(cum.fp AS HUGEINT) * tot.npos AS j_num,
                 CAST(2 * CAST(cum.tp AS HUGEINT) * 1000000
                      // (2 * cum.tp + cum.fp + (tot.npos - cum.tp))
                      AS BIGINT) AS f1_ppm
          FROM cum, tot),
    best_j AS (SELECT 'youden' AS criterion, p, tp, fp, fn, tn,
                      CAST(j_num * 1000000
                           // (CAST((SELECT npos FROM tot) AS HUGEINT)
                               * (SELECT nneg FROM tot)) AS BIGINT)
                          AS metric_ppm
               FROM m ORDER BY j_num DESC, p LIMIT 1),
    best_f AS (SELECT 'f1' AS criterion, p, tp, fp, fn, tn, f1_ppm
                   AS metric_ppm
               FROM m ORDER BY f1_ppm DESC, p LIMIT 1)
    SELECT criterion, CAST(p AS BIGINT) AS threshold_p,
           tp, fp, CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           metric_ppm
    FROM (SELECT * FROM best_j UNION ALL SELECT * FROM best_f)
    ORDER BY criterion
    """,
)
def x263_operating_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'choose the cutoff' operator the eval family was missing:
    from the exact (score, label) count table (x187's sufficient
    statistic), the Youden-J-optimal and F1-optimal classification
    thresholds with their full confusion counts — AUC (x187) says the
    ordering works, calibration (x184) says the values are honest, the
    gain chart (x194) shows the curve; a deployed filter still needs
    ONE threshold, and these are the two standard picks. Exactness:
    TP/FP ride cumulative integer sums over the score value domain
    (predicted-positive = score >= t, so every candidate threshold is
    one row of a p-DESC cumsum); Youden's argmax key is the integer
    cross-multiply TP*nneg - FP*npos (no division), F1's is exact
    floored ppm; ties break toward the LOWER threshold (higher recall)
    by ordering on p within equal keys. Plan: one corpus pass to the
    count table, value-domain cumsums, two TakeOrdered(1) picks."""
    d = load(spark, sf_dir, "documents")
    sc = d.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.least(
            F.expr(
                "cast(size(filter(split(text, ' '),"
                " t -> array_contains(array('a','the','of','and','to','in'), t)))"
                " as bigint) * 5000000 div size(split(text, ' '))"
            ),
            F.lit(1_000_000).cast("bigint"),
        ).alias("p"),
    )
    cc = sc.groupBy("p").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("pos")
    )
    tot = cc.agg(
        F.sum("pos").cast("long").alias("npos"),
        F.sum(F.col("c") - F.col("pos")).cast("long").alias("nneg"),
    )
    wdesc = Window.orderBy(F.col("p").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cc.select(
        "p",
        F.sum("pos").over(wdesc).cast("long").alias("tp"),
        F.sum(F.col("c") - F.col("pos")).over(wdesc).cast("long").alias("fp"),
    )
    m = cum.crossJoin(F.broadcast(tot)).select(
        "p",
        "tp",
        "fp",
        (F.col("npos") - F.col("tp")).alias("fn"),
        (F.col("nneg") - F.col("fp")).alias("tn"),
        F.expr(
            "cast(tp as decimal(38,0)) * nneg - cast(fp as decimal(38,0)) * npos"
        ).alias("j_num"),
        F.expr(
            "cast(2 * cast(tp as decimal(38,0)) * 1000000"
            " div (2 * tp + fp + (npos - tp)) as bigint)"
        ).alias("f1_ppm"),
        "npos",
        "nneg",
    )
    # two argmax picks consume m; cut once so the corpus pass isn't
    # re-derived per criterion (value-domain table, <= 1e6+1 rows)
    m = m.localCheckpoint(eager=True)
    best_j = (
        m.orderBy(F.col("j_num").desc(), "p")
        .limit(1)
        .select(
            F.lit("youden").alias("criterion"),
            F.col("p").alias("threshold_p"),
            "tp",
            "fp",
            F.col("fn").cast("long").alias("fn"),
            F.col("tn").cast("long").alias("tn"),
            F.expr(
                "cast(j_num * 1000000 div (cast(npos as decimal(38,0)) * nneg)"
                " as bigint)"
            ).alias("metric_ppm"),
        )
    )
    best_f = (
        m.orderBy(F.col("f1_ppm").desc(), "p")
        .limit(1)
        .select(
            F.lit("f1").alias("criterion"),
            F.col("p").alias("threshold_p"),
            "tp",
            "fp",
            F.col("fn").cast("long").alias("fn"),
            F.col("tn").cast("long").alias("tn"),
            F.col("f1_ppm").alias("metric_ppm"),
        )
    )
    return best_j.unionAll(best_f).orderBy("criterion")


def _dp_geo_cdf_rows(alpha_ppk: int) -> list[tuple[int, int, int]]:
    """Exact integer tail table for Geometric(1 - alpha): rows
    (alpha_ppk, k, pnext) where pnext = P(G >= k+1) * 1e18 under the
    SAME walk x259's recursive CTE performs (p_{k+1} = p_k * alpha_ppk
    div 1000, exact big-int — Python ints ARE the arbitrary-precision
    arithmetic, so both engines receive identical literals). Built in
    Python rather than WITH RECURSIVE because a shallow-noise alpha
    (905/1000, eps ~ 0.1) needs ~415 steps before the tail underflows
    to exact 0 — past Spark's default cteRecursionLevelLimit — and the
    table is a <=500-row broadcast either way. The final row's pnext is
    exact 0, so every threshold (>= 222 by the 52-bit clock floor)
    terminates the min-k inversion."""
    rows, k, p = [], 0, 10**18
    while p > 0:
        p = p * alpha_ppk // 1000
        rows.append((alpha_ppk, k, p))
        k += 1
    return rows


#: eps sweep for x268: alpha_ppk = round(e^-eps * 1000) picks eps ~
#: {0.1, 0.5, 1.0, 2.0}; eps_ppm is folded in Python (ln differs
#: between engines' libm — never computed engine-side).
_X268_ALPHAS = [905, 607, 368, 135]


def _x268_eps_ppm(alpha_ppk: int) -> int:
    import math

    return round(math.log(1000 / alpha_ppk) * 1_000_000)


@query(
    "x268_dp_eps_sweep",
    oracle=f"""
    WITH pw(a, k, pnext) AS (
        SELECT * FROM (VALUES {", ".join(
            f"({a}, {k}, CAST({p} AS HUGEINT))"
            for al in _X268_ALPHAS
            for (a, k, p) in _dp_geo_cdf_rows(al))}) AS v(a, k, pnext)),
    eps AS (SELECT * FROM (VALUES {", ".join(
        f"({a}, {_x268_eps_ppm(a)})" for a in _X268_ALPHAS)})
        AS e(a, eps_ppm)),
    g AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
          GROUP BY source),
    t AS (SELECT source, n,
                 (CAST(4503599627370496 - u1 AS HUGEINT)
                  * 1000000000000000000) // 4503599627370496 AS th1,
                 (CAST(4503599627370496 - u2 AS HUGEINT)
                  * 1000000000000000000) // 4503599627370496 AS th2
          FROM (SELECT source, n,
                       CAST('0x' || substring(md5(source || '#g1'), 1, 13)
                            AS BIGINT) AS u1,
                       CAST('0x' || substring(md5(source || '#g2'), 1, 13)
                            AS BIGINT) AS u2
                FROM g)),
    g1 AS (SELECT pw.a, source, CAST(min(k) AS BIGINT) AS geo1
           FROM t JOIN pw ON pw.pnext <= t.th1 GROUP BY 1, 2),
    g2 AS (SELECT pw.a, source, CAST(min(k) AS BIGINT) AS geo2
           FROM t JOIN pw ON pw.pnext <= t.th2 GROUP BY 1, 2)
    SELECT CAST(g1.a AS BIGINT) AS alpha_ppk,
           CAST(eps.eps_ppm AS BIGINT) AS eps_ppm,
           t.source, t.n,
           CAST(g1.geo1 - g2.geo2 AS BIGINT) AS noise,
           CAST(greatest(t.n + g1.geo1 - g2.geo2, 0) AS BIGINT)
               AS noisy_n_clamped
    FROM t JOIN g1 ON g1.source = t.source
           JOIN g2 ON g2.a = g1.a AND g2.source = t.source
           JOIN eps ON eps.a = g1.a
    ORDER BY alpha_ppk, t.source
    """,
)
def x268_dp_eps_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x259's discrete-Laplace count release with eps PARAMETERIZED —
    the privacy-utility curve a release board actually reviews: the
    same per-source counts released at eps ~ 0.1 / 0.5 / 1.0 / 2.0
    (alpha_ppk = round(e^-eps * 1000) in {905, 607, 368, 135}), noise
    drawn by inverting the SAME fixed md5 clocks against each alpha's
    exact integer CDF table, so the four releases are COUPLED draws —
    noise magnitude grows monotonically as eps shrinks, visible
    per-source down the sweep (the r11 roadmap's parameterized-eps
    item). The CDF tables are built once in Python big-ints (identical
    walk to x259's recursive CTE; see _dp_geo_cdf_rows for why not
    WITH RECURSIVE at alpha 905) and injected into both engines as
    VALUES literals — a <=600-row broadcast joined against the
    |sources| count table; the corpus cost is the one count agg.
    eps_ppm is folded in Python, never engine-side ln."""
    d = load(spark, sf_dir, "documents")
    rows = [
        (a, k, p) for al in _X268_ALPHAS for (a, k, p) in _dp_geo_cdf_rows(al)
    ]
    pw = spark.createDataFrame(
        [(a, k, str(p)) for a, k, p in rows], ["a", "k", "pn"]
    ).select("a", "k", F.col("pn").cast("decimal(38,0)").alias("pnext"))
    pw.createOrReplaceTempView("x268_pw")
    spark.createDataFrame(
        [(a, _x268_eps_ppm(a)) for a in _X268_ALPHAS], ["a", "eps_ppm"]
    ).createOrReplaceTempView("x268_eps")
    d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).createOrReplaceTempView("x268_counts")
    return spark.sql(
        """
        WITH t AS (SELECT source, n,
                     (CAST(4503599627370496 - u1 AS DECIMAL(38,0))
                      * 1000000000000000000) div 4503599627370496 AS th1,
                     (CAST(4503599627370496 - u2 AS DECIMAL(38,0))
                      * 1000000000000000000) div 4503599627370496 AS th2
              FROM (SELECT source, n,
                           cast(conv(substring(md5(concat(source, '#g1')),
                                1, 13), 16, 10) as bigint) AS u1,
                           cast(conv(substring(md5(concat(source, '#g2')),
                                1, 13), 16, 10) as bigint) AS u2
                    FROM x268_counts)),
        g1 AS (SELECT pw.a, source, CAST(min(k) AS BIGINT) AS geo1
               FROM t JOIN x268_pw pw ON pw.pnext <= t.th1 GROUP BY 1, 2),
        g2 AS (SELECT pw.a, source, CAST(min(k) AS BIGINT) AS geo2
               FROM t JOIN x268_pw pw ON pw.pnext <= t.th2 GROUP BY 1, 2)
        SELECT CAST(g1.a AS BIGINT) AS alpha_ppk,
               CAST(eps.eps_ppm AS BIGINT) AS eps_ppm,
               t.source, t.n,
               CAST(g1.geo1 - g2.geo2 AS BIGINT) AS noise,
               CAST(greatest(t.n + g1.geo1 - g2.geo2, 0) AS BIGINT)
                   AS noisy_n_clamped
        FROM t JOIN g1 ON g1.source = t.source
               JOIN g2 ON g2.a = g1.a AND g2.source = t.source
               JOIN x268_eps eps ON eps.a = g1.a
        ORDER BY alpha_ppk, t.source
        """
    )


#: x270's funnel gates live in functions.textfns (FUNNEL_STAGES) so the
#: batch query, the DuckDB oracle, and the streaming twin
#: (streaming/drift.py funnel twin via funnel_state/funnel_table) all
#: read the one list; predicates are exact integer cross-multiplies —
#: identical text in both engines except DuckDB's // for Spark's div.
from ..functions.textfns import FUNNEL_STAGES as _X270_STAGES  # noqa: E402


@query(
    "x270_filter_funnel",
    oracle=f"""
    WITH s AS (SELECT n_chars,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS ntoks,
                      CAST(len(list_filter(string_split(text, ' '),
                          t -> t IN ('a','the','of','and','to','in')))
                          AS BIGINT) AS hits,
                      CAST(length(text)
                           - length(translate(text, '.,;:!?', ''))
                           AS BIGINT) AS punct
               FROM documents),
    f AS (SELECT n_chars, {", ".join(
        "CASE WHEN " + " AND ".join(
            p.replace(" div ", " // ") for _, p in _X270_STAGES[: i + 1]
        ) + " THEN 1 ELSE 0 END AS c" + str(i)
        for i, _ in enumerate(_X270_STAGES))}
          FROM s),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS total, {", ".join(
        f"CAST(sum(c{i}) AS BIGINT) AS n{i},"
        f" CAST(sum(c{i} * n_chars) AS BIGINT) AS m{i}"
        for i, _ in enumerate(_X270_STAGES))}
            FROM f)
    {" UNION ALL ".join(
        f'''SELECT CAST({i + 1} AS BIGINT) AS stage,
            '{name}' AS filter_name,
            {f"n{i - 1}" if i else "total"} AS n_in,
            {f"n{i - 1}" if i else "total"} - n{i} AS n_dropped,
            n{i} AS n_out,
            m{i} AS char_mass_out,
            CAST(n{i} * 1000000 // total AS BIGINT) AS survival_ppm
            FROM agg''' for i, (name, _) in enumerate(_X270_STAGES))}
    ORDER BY stage
    """,
)
def x270_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter FUNNEL a curation pipeline publishes before a
    training run (the RefinedWeb/FineWeb-style survival table): five
    standard filters applied in sequence — min length, min token count,
    min stopword density, max punctuation density, max mean token
    length — with, per stage, the docs entering, dropped, surviving,
    the surviving char mass, and cumulative corpus survival. x144
    scores bot-likeness signals and x151 plans mixtures from quality;
    this is the table that says what each GATE costs, which is how
    thresholds actually get negotiated (a stage dropping 40% of char
    mass gets re-tuned before anyone trains on the survivors). Engine
    parity: every signal is exact integer arithmetic on split/translate
    primitives both engines share; every threshold is an integer
    cross-multiply (the x265 stopword idiom). Plan: ONE corpus scan
    computes the per-doc signals, the five cumulative pass flags are
    conditional expressions in the same projection, and the funnel is
    one 1-row agg fanned to 5 rows — adding a stage costs a column,
    never a rescan. The signal/flag/state/fan builders are shared
    verbatim with the streaming twin (functions/textfns.py
    funnel_signals/funnel_flags/funnel_state/funnel_table; the twin's
    complete-mode state is the one agg row, pinned row-exact in
    tests/test_streaming_r11_twins.py)."""
    from ..functions.textfns import (
        funnel_flags,
        funnel_signals,
        funnel_state,
        funnel_table,
    )

    d = load(spark, sf_dir, "documents")
    return funnel_table(funnel_state(funnel_flags(funnel_signals(d))))


_X278_Q_SQL = " AND ".join(
    p.replace(" div ", " // ") for _, p in _X270_STAGES
)
_X278_Q_SPARK = " and ".join(p for _, p in _X270_STAGES)


@query(
    "x278_freeze_manifest",
    oracle=f"""
    WITH cand AS (SELECT * FROM documents WHERE doc_id >= 10),
    s AS (SELECT doc_id, source, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntoks,
                 CAST(len(list_filter(string_split(text, ' '),
                     t -> t IN ('a','the','of','and','to','in')))
                     AS BIGINT) AS hits,
                 CAST(length(text)
                      - length(translate(text, '.,;:!?', ''))
                      AS BIGINT) AS punct
          FROM cand),
    q AS (SELECT doc_id, source, n_chars,
                 CASE WHEN {_X278_Q_SQL} THEN 1 ELSE 0 END AS q_pass
          FROM s),
    k AS (SELECT md5(text) AS th, min(doc_id) AS keep_id
          FROM cand GROUP BY 1),
    kd AS (SELECT c.doc_id,
                  CASE WHEN c.doc_id = k.keep_id THEN 1 ELSE 0 END
                      AS is_keeper
           FROM cand c JOIN k ON md5(c.text) = k.th),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents),
    ev AS (SELECT DISTINCT gram
           FROM (SELECT unnest(list_transform(
                     range(1, greatest(len(toks) - 3, 1)),
                     i -> array_to_string(toks[i:i+4], ' '))) AS gram
                 FROM tok WHERE doc_id < 10)),
    corp AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(toks) - 3, 1)),
                 i -> array_to_string(toks[i:i+4], ' ')))) AS gram
             FROM tok WHERE doc_id >= 10),
    hits5 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
              FROM corp JOIN ev USING (gram) GROUP BY 1),
    verdicts AS (SELECT q.source, q.n_chars,
                        CASE WHEN q.q_pass = 0 THEN 'drop_quality'
                             WHEN kd.is_keeper = 0 THEN 'drop_exact_dup'
                             WHEN COALESCE(h.n_hits, 0) > 0
                                  THEN 'drop_contaminated'
                             ELSE 'keep' END AS verdict
                 FROM q JOIN kd ON kd.doc_id = q.doc_id
                 LEFT JOIN hits5 h ON h.doc_id = q.doc_id)
    SELECT source, verdict,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS char_mass
    FROM verdicts GROUP BY 1, 2 ORDER BY source, verdict
    """,
)
def x278_freeze_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-set FREEZE MANIFEST: every candidate doc (doc_id >=
    10; < 10 is the eval seed set, x269's convention) gets exactly one
    verdict under the fixed precedence quality -> exact-dup ->
    contamination -> keep, and the manifest reports per (source,
    verdict) doc counts and char mass. This is the composed ACTION the
    round's gates exist for: x270 says what each quality stage costs,
    x12b who the dup keepers are, x269 what touches eval — THIS is the
    one table a dataset card publishes at freeze (each drop attributed
    to its FIRST failing gate, so the columns sum to the corpus and
    reruns are idempotent).

    Gate parity: the quality predicate is FUNNEL_STAGES verbatim (same
    constant shared by x270 and the streaming twin — adding a stage
    changes all three together); exact-dup is x12b's min-doc_id keeper
    per md5(text) WITHIN the candidate corpus; contamination is x269's
    distinct-5-gram broadcast hit test. Plan: one signals projection,
    one keeper hash agg + join back on the text hash, one broadcast
    gram join — the union of the three parents' plans with a final
    (source, verdict) agg; no new shuffle shapes, everything linear.
    At 100 TB the manifest adds nothing to the parents' cost envelope:
    the expensive parts (gram explode, text hash) are theirs."""
    d = load(spark, sf_dir, "documents")
    return (
        freeze_verdicts(d)
        .select("source", "n_chars", "verdict")
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("char_mass"),
        )
        .orderBy("source", "verdict")
    )


def freeze_verdicts(d: DataFrame) -> DataFrame:
    """Per-document freeze verdict — x278's body, factored so the
    manifest QUERY and the curated_write ACTION (plans/curate.py) share
    the gates verbatim and can never drift: every candidate doc
    (doc_id >= 10) gets exactly one verdict under the fixed precedence
    quality -> exact-dup -> contamination -> keep. Input needs
    (doc_id, source, text, n_chars); output is one row per candidate:
    (doc_id, source, n_chars, verdict)."""
    from ..functions.textfns import funnel_signals

    cand = d.filter(F.col("doc_id") >= 10)
    q = funnel_signals(
        cand.select("doc_id", "source", "text", "n_chars"),
        extra=("doc_id", "source"),
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(
            "case when " + _X278_Q_SPARK + " then 1 else 0 end"
        ).alias("q_pass"),
    )
    keeper = (
        cand.groupBy(F.md5("text").alias("th"))
        .agg(F.min("doc_id").alias("keep_id"))
    )
    kd = cand.select("doc_id", F.md5("text").alias("th")).join(
        keeper, "th"
    ).select(
        "doc_id",
        (F.col("doc_id") == F.col("keep_id")).cast("long").alias("is_keeper"),
    )
    gram5 = F.expr(
        "case when size(toks) >= 5 then"
        " array_distinct(transform(sequence(1, size(toks) - 4),"
        " i -> array_join(slice(toks, i, 5), ' ')))"
        " else array() end"
    )
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    ev = (
        toks.filter(F.col("doc_id") < 10)
        .select(F.explode(gram5).alias("gram"))
        .distinct()
    )
    hits5 = (
        toks.filter(F.col("doc_id") >= 10)
        .select("doc_id", F.explode(gram5).alias("gram"))
        .join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    verdict = (
        F.when(F.col("q_pass") == 0, "drop_quality")
        .when(F.col("is_keeper") == 0, "drop_exact_dup")
        .when(F.coalesce("n_hits", F.lit(0)) > 0, "drop_contaminated")
        .otherwise("keep")
    )
    return (
        q.join(kd, "doc_id")
        .join(hits5, "doc_id", "left")
        .select("doc_id", "source", "n_chars", verdict.alias("verdict"))
    )


@query(
    "x282_curated_accounting",
    oracle=f"""
    WITH cand AS (SELECT * FROM documents WHERE doc_id >= 10),
    s AS (SELECT doc_id, source, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntoks,
                 CAST(len(list_filter(string_split(text, ' '),
                     t -> t IN ('a','the','of','and','to','in')))
                     AS BIGINT) AS hits,
                 CAST(length(text)
                      - length(translate(text, '.,;:!?', ''))
                      AS BIGINT) AS punct
          FROM cand),
    q AS (SELECT doc_id, source,
                 CASE WHEN {_X278_Q_SQL} THEN 1 ELSE 0 END AS q_pass
          FROM s),
    k AS (SELECT md5(text) AS th, min(doc_id) AS keep_id
          FROM cand GROUP BY 1),
    kd AS (SELECT c.doc_id,
                  CASE WHEN c.doc_id = k.keep_id THEN 1 ELSE 0 END
                      AS is_keeper
           FROM cand c JOIN k ON md5(c.text) = k.th),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents),
    ev AS (SELECT DISTINCT gram
           FROM (SELECT unnest(list_transform(
                     range(1, greatest(len(toks) - 3, 1)),
                     i -> array_to_string(toks[i:i+4], ' '))) AS gram
                 FROM tok WHERE doc_id < 10)),
    corp AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(toks) - 3, 1)),
                 i -> array_to_string(toks[i:i+4], ' ')))) AS gram
             FROM tok WHERE doc_id >= 10),
    hits5 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
              FROM corp JOIN ev USING (gram) GROUP BY 1),
    verdicts AS (SELECT q.doc_id, q.source,
                        CASE WHEN q.q_pass = 0 THEN 'drop_quality'
                             WHEN kd.is_keeper = 0 THEN 'drop_exact_dup'
                             WHEN COALESCE(h.n_hits, 0) > 0
                                  THEN 'drop_contaminated'
                             ELSE 'keep' END AS verdict
                 FROM q JOIN kd ON kd.doc_id = q.doc_id
                 LEFT JOIN hits5 h ON h.doc_id = q.doc_id),
    blocks AS (SELECT doc_id,
                      CAST(len(toks[b * 20 + 1 : b * 20 + 20]) AS BIGINT)
                          AS n_tok,
                      md5(array_to_string(
                          toks[b * 20 + 1 : b * 20 + 20], ' ')) AS h
               FROM tok,
                    unnest(range(0, (len(toks) + 19) // 20)) t(b)),
    agg AS (SELECT h,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS token_mass
            FROM blocks GROUP BY h),
    bl AS (SELECT h FROM (SELECT h, row_number() OVER
               (ORDER BY n_docs DESC, token_mass DESC, h) AS rk
            FROM agg WHERE n_docs >= 3) WHERE rk <= 20),
    kb AS (SELECT v.source, b.doc_id, b.n_tok,
                  CASE WHEN bl.h IS NOT NULL THEN 1 ELSE 0 END AS strip
           FROM blocks b
           JOIN verdicts v ON v.doc_id = b.doc_id AND v.verdict = 'keep'
           LEFT JOIN bl ON bl.h = b.h),
    per_doc AS (SELECT source, doc_id,
                       CAST(count(*) AS BIGINT) AS nb,
                       CAST(sum(strip) AS BIGINT) AS ns,
                       CAST(sum(n_tok) AS BIGINT) AS nt,
                       CAST(sum(strip * n_tok) AS BIGINT) AS ts
                FROM kb GROUP BY 1, 2),
    strip_agg AS (SELECT source,
                      CAST(sum(CASE WHEN nb > ns THEN 1 ELSE 0 END)
                          AS BIGINT) AS docs_emitted,
                      CAST(sum(nb) AS BIGINT) AS blocks_total,
                      CAST(sum(ns) AS BIGINT) AS blocks_stripped,
                      CAST(sum(nt) AS BIGINT) AS tokens_total,
                      CAST(sum(ts) AS BIGINT) AS tokens_stripped
                  FROM per_doc GROUP BY 1),
    v_agg AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_cand,
                     CAST(sum(CASE WHEN verdict = 'keep' THEN 1 ELSE 0 END)
                         AS BIGINT) AS docs_kept
              FROM verdicts GROUP BY 1)
    SELECT v.source, v.docs_cand, v.docs_kept,
           COALESCE(sa.docs_emitted, 0) AS docs_emitted,
           COALESCE(sa.blocks_total, 0) AS blocks_total,
           COALESCE(sa.blocks_stripped, 0) AS blocks_stripped,
           COALESCE(sa.tokens_total, 0) AS tokens_total,
           COALESCE(sa.tokens_stripped, 0) AS tokens_stripped,
           COALESCE(sa.tokens_total - sa.tokens_stripped, 0) AS tokens_out
    FROM v_agg v LEFT JOIN strip_agg sa USING (source)
    ORDER BY v.source
    """,
)
def x282_curated_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACCOUNTING for curated_write (plans/curate.py) — per source,
    exactly what the emit stage does and what it costs: candidate and
    kept doc counts (pinned to x278's verdicts — same freeze_verdicts
    body), total/stripped segment blocks and token mass over the KEPT
    docs under x279's published blocklist (same builder, df_floor=3 /
    top_k=20 / 20-token blocks), docs actually emitted (>= 1 surviving
    block), and the tokens that ship. This is the hash-checked twin of
    the side-effecting write: tests/test_curated_write.py asserts the
    written parquet's row count and token sums equal this table's
    docs_emitted / tokens_out row-for-row.

    Plan: freeze_verdicts' one-pass gates (x278's plan), the blocklist's
    hash agg + distributed top-k (x279's plan), then ONE segment scan of
    the corpus joined to the keep set on doc_id and broadcast-left-joined
    to the <= 20 blocklist hashes; two hash aggs (per-doc, per-source)
    finish it. Everything linear; the only new join key is doc_id
    (uniform). At 100 TB this is the audit you run BEFORE the write to
    price it, and after to certify it — same query both times."""
    from ..functions.dedupfns import segment_blocks
    from .dedup import boilerplate_blocklist_from_docs

    d = load(spark, sf_dir, "documents")
    v = freeze_verdicts(d)
    bl = boilerplate_blocklist_from_docs(d).select(
        F.col("block_hash").alias("h"), F.lit(1).alias("in_bl")
    )
    blocks = segment_blocks(d.select("doc_id", "source", "text"))
    kept = v.filter(F.col("verdict") == "keep").select("doc_id", "source")
    kb = (
        blocks.drop("source")
        .join(kept, "doc_id")
        .join(F.broadcast(bl), "h", "left")
        .select(
            "source",
            "doc_id",
            "n_tok",
            F.coalesce("in_bl", F.lit(0)).cast("long").alias("strip"),
        )
    )
    per_doc = kb.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("strip").cast("long").alias("ns"),
        F.sum("n_tok").cast("long").alias("nt"),
        F.sum(F.col("strip") * F.col("n_tok")).cast("long").alias("ts"),
    )
    strip_agg = per_doc.groupBy("source").agg(
        F.sum((F.col("nb") > F.col("ns")).cast("long"))
        .cast("long")
        .alias("docs_emitted"),
        F.sum("nb").cast("long").alias("blocks_total"),
        F.sum("ns").cast("long").alias("blocks_stripped"),
        F.sum("nt").cast("long").alias("tokens_total"),
        F.sum("ts").cast("long").alias("tokens_stripped"),
    )
    v_agg = v.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_cand"),
        F.sum((F.col("verdict") == "keep").cast("long"))
        .cast("long")
        .alias("docs_kept"),
    )
    return (
        v_agg.join(strip_agg, "source", "left")
        .select(
            "source",
            "docs_cand",
            "docs_kept",
            F.coalesce("docs_emitted", F.lit(0)).cast("long").alias(
                "docs_emitted"
            ),
            F.coalesce("blocks_total", F.lit(0)).cast("long").alias(
                "blocks_total"
            ),
            F.coalesce("blocks_stripped", F.lit(0)).cast("long").alias(
                "blocks_stripped"
            ),
            F.coalesce("tokens_total", F.lit(0)).cast("long").alias(
                "tokens_total"
            ),
            F.coalesce("tokens_stripped", F.lit(0)).cast("long").alias(
                "tokens_stripped"
            ),
            F.coalesce(
                F.col("tokens_total") - F.col("tokens_stripped"), F.lit(0)
            )
            .cast("long")
            .alias("tokens_out"),
        )
        .orderBy("source")
    )


@query(
    "x285_curation_quality_delta",
    oracle=f"""
    WITH cand AS (SELECT * FROM documents WHERE doc_id >= 10),
    s AS (SELECT doc_id, source, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntoks,
                 CAST(len(list_filter(string_split(text, ' '),
                     t -> t IN ('a','the','of','and','to','in')))
                     AS BIGINT) AS hits,
                 CAST(length(text)
                      - length(translate(text, '.,;:!?', ''))
                      AS BIGINT) AS punct
          FROM cand),
    q AS (SELECT doc_id, source,
                 CASE WHEN {_X278_Q_SQL} THEN 1 ELSE 0 END AS q_pass
          FROM s),
    k AS (SELECT md5(text) AS th, min(doc_id) AS keep_id
          FROM cand GROUP BY 1),
    kd AS (SELECT c.doc_id,
                  CASE WHEN c.doc_id = k.keep_id THEN 1 ELSE 0 END
                      AS is_keeper
           FROM cand c JOIN k ON md5(c.text) = k.th),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents),
    ev AS (SELECT DISTINCT gram
           FROM (SELECT unnest(list_transform(
                     range(1, greatest(len(toks) - 3, 1)),
                     i -> array_to_string(toks[i:i+4], ' '))) AS gram
                 FROM tok WHERE doc_id < 10)),
    corp AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(toks) - 3, 1)),
                 i -> array_to_string(toks[i:i+4], ' ')))) AS gram
             FROM tok WHERE doc_id >= 10),
    hits5 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
              FROM corp JOIN ev USING (gram) GROUP BY 1),
    keep AS (SELECT q.doc_id, q.source
             FROM q JOIN kd ON kd.doc_id = q.doc_id
             LEFT JOIN hits5 h ON h.doc_id = q.doc_id
             WHERE q.q_pass = 1 AND kd.is_keeper = 1
               AND COALESCE(h.n_hits, 0) = 0),
    blocks AS (SELECT doc_id,
                      CAST(len(toks[b * 20 + 1 : b * 20 + 20]) AS BIGINT)
                          AS n_tok,
                      md5(array_to_string(
                          toks[b * 20 + 1 : b * 20 + 20], ' ')) AS h,
                      CAST(length(array_to_string(
                          toks[b * 20 + 1 : b * 20 + 20], ' '))
                          AS BIGINT) AS chars,
                      CAST(len(list_filter(toks[b * 20 + 1 : b * 20 + 20],
                          t -> t IN ('a','the','of','and','to','in')))
                          AS BIGINT) AS hits,
                      CAST(length(array_to_string(
                               toks[b * 20 + 1 : b * 20 + 20], ' '))
                           - length(translate(array_to_string(
                               toks[b * 20 + 1 : b * 20 + 20], ' '),
                               '.,;:!?', '')) AS BIGINT) AS punct
               FROM tok,
                    unnest(range(0, (len(toks) + 19) // 20)) t(b)),
    agg AS (SELECT h,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS token_mass
            FROM blocks GROUP BY h),
    bl AS (SELECT h FROM (SELECT h, row_number() OVER
               (ORDER BY n_docs DESC, token_mass DESC, h) AS rk
            FROM agg WHERE n_docs >= 3) WHERE rk <= 20),
    kb AS (SELECT kp.source, b.doc_id, b.n_tok, b.chars, b.hits, b.punct,
                  CASE WHEN bl.h IS NOT NULL THEN 1 ELSE 0 END AS strip
           FROM blocks b
           JOIN keep kp ON kp.doc_id = b.doc_id
           LEFT JOIN bl ON bl.h = b.h),
    post_doc AS (SELECT source, doc_id,
                        CAST(sum(1 - strip) AS BIGINT) AS nb,
                        CAST(sum((1 - strip) * n_tok) AS BIGINT) AS toks,
                        CAST(sum((1 - strip) * chars) AS BIGINT) AS chars,
                        CAST(sum((1 - strip) * hits) AS BIGINT) AS hits,
                        CAST(sum((1 - strip) * punct) AS BIGINT) AS punct
                 FROM kb GROUP BY 1, 2),
    post AS (SELECT source,
                    CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT)
                        AS docs_post,
                    CAST(sum(toks) AS BIGINT) AS tokens_post,
                    CAST(sum(chars + greatest(nb - 1, 0)) AS BIGINT)
                        AS chars_post,
                    CAST(sum(hits) AS BIGINT) AS hits_post,
                    CAST(sum(punct) AS BIGINT) AS punct_post
             FROM post_doc GROUP BY 1),
    pre AS (SELECT s.source,
                   CAST(count(*) AS BIGINT) AS docs_pre,
                   CAST(sum(s.ntoks) AS BIGINT) AS tokens_pre,
                   CAST(sum(s.n_chars) AS BIGINT) AS chars_pre,
                   CAST(sum(s.hits) AS BIGINT) AS hits_pre,
                   CAST(sum(s.punct) AS BIGINT) AS punct_pre
            FROM s JOIN keep kp ON kp.doc_id = s.doc_id
            GROUP BY 1)
    SELECT pre.source,
           docs_pre, COALESCE(docs_post, 0) AS docs_post,
           tokens_pre, COALESCE(tokens_post, 0) AS tokens_post,
           CAST(hits_pre * 1000000 // greatest(tokens_pre, 1) AS BIGINT)
               AS stop_ppm_pre,
           CAST(COALESCE(hits_post, 0) * 1000000
                // greatest(COALESCE(tokens_post, 0), 1) AS BIGINT)
               AS stop_ppm_post,
           CAST(punct_pre * 1000000 // greatest(chars_pre, 1) AS BIGINT)
               AS punct_ppm_pre,
           CAST(COALESCE(punct_post, 0) * 1000000
                // greatest(COALESCE(chars_post, 0), 1) AS BIGINT)
               AS punct_ppm_post,
           CAST(chars_pre // greatest(docs_pre, 1) AS BIGINT)
               AS mean_chars_pre,
           CAST(COALESCE(chars_post, 0)
                // greatest(COALESCE(docs_post, 0), 1) AS BIGINT)
               AS mean_chars_post
    FROM pre LEFT JOIN post USING (source)
    ORDER BY pre.source
    """,
)
def x285_curation_quality_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the blocklist strip DID to the kept corpus — per source, the
    quality profile of the keep-verdict docs BEFORE vs AFTER the segment
    strip (same population both sides, so the delta isolates the strip):
    doc/token counts, stopword density, punctuation density, and mean
    doc length, all exact integer ppm. x282 prices the strip in volume;
    this is the companion a dataset card needs — evidence the removed
    mass was BOILERPLATE (densities move toward the corpus norm) rather
    than content. chars_post counts the reassembled string exactly:
    sum of surviving block strings plus the nb-1 rejoining separators
    (the split-join identity, shared with curated_write's output).

    Plan: freeze_verdicts' gates select the keep set (x278's plan); ONE
    segment scan carries per-block (tokens, chars, stopword hits,
    punct) next to the hash; the blocklist is x279's distributed top-k;
    then per-doc and per-source conditional sums. Linear, no new
    shuffle shapes — the signals ride the explode x272 already pays
    for."""
    from ..functions.dedupfns import segment_blocks
    from .dedup import boilerplate_blocklist_from_docs

    d = load(spark, sf_dir, "documents")
    v = freeze_verdicts(d)
    keep = v.filter(F.col("verdict") == "keep").select("doc_id", "source")
    bl = boilerplate_blocklist_from_docs(d).select(
        F.col("block_hash").alias("h"), F.lit(1).alias("in_bl")
    )
    blocks = segment_blocks(
        d.select("doc_id", "source", "text"), with_text=True
    ).select(
        "doc_id",
        "h",
        "n_tok",
        F.length("txt").cast("long").alias("chars"),
        F.expr(
            "cast(size(filter(split(txt, ' '),"
            " t -> array_contains(array('a','the','of','and','to','in'),"
            " t))) as bigint)"
        ).alias("hits"),
        (F.length("txt") - F.length(F.translate("txt", ".,;:!?", "")))
        .cast("long")
        .alias("punct"),
    )
    surv = F.lit(1) - F.coalesce("in_bl", F.lit(0))
    post_doc = (
        blocks.join(keep, "doc_id")
        .join(F.broadcast(bl), "h", "left")
        .groupBy("source", "doc_id")
        .agg(
            F.sum(surv).cast("long").alias("nb"),
            F.sum(surv * F.col("n_tok")).cast("long").alias("toks"),
            F.sum(surv * F.col("chars")).cast("long").alias("chars"),
            F.sum(surv * F.col("hits")).cast("long").alias("hits"),
            F.sum(surv * F.col("punct")).cast("long").alias("punct"),
        )
    )
    post = post_doc.groupBy("source").agg(
        F.sum((F.col("nb") > 0).cast("long")).cast("long").alias("docs_post"),
        F.sum("toks").cast("long").alias("tokens_post"),
        F.sum(F.col("chars") + F.greatest(F.col("nb") - 1, F.lit(0)))
        .cast("long")
        .alias("chars_post"),
        F.sum("hits").cast("long").alias("hits_post"),
        F.sum("punct").cast("long").alias("punct_post"),
    )
    from ..functions.textfns import funnel_signals

    pre = (
        funnel_signals(
            d.filter(F.col("doc_id") >= 10), extra=("doc_id", "source")
        )
        .join(keep.select("doc_id"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_pre"),
            F.sum("ntoks").cast("long").alias("tokens_pre"),
            F.sum("n_chars").cast("long").alias("chars_pre"),
            F.sum("hits").cast("long").alias("hits_pre"),
            F.sum("punct").cast("long").alias("punct_pre"),
        )
    )
    z = F.lit(0)
    return (
        pre.join(post, "source", "left")
        .select(
            "source",
            "docs_pre",
            F.coalesce("docs_post", z).cast("long").alias("docs_post"),
            "tokens_pre",
            F.coalesce("tokens_post", z).cast("long").alias("tokens_post"),
            F.expr(
                "cast(hits_pre * 1000000 div greatest(tokens_pre, 1)"
                " as bigint)"
            ).alias("stop_ppm_pre"),
            F.expr(
                "cast(coalesce(hits_post, 0) * 1000000"
                " div greatest(coalesce(tokens_post, 0), 1) as bigint)"
            ).alias("stop_ppm_post"),
            F.expr(
                "cast(punct_pre * 1000000 div greatest(chars_pre, 1)"
                " as bigint)"
            ).alias("punct_ppm_pre"),
            F.expr(
                "cast(coalesce(punct_post, 0) * 1000000"
                " div greatest(coalesce(chars_post, 0), 1) as bigint)"
            ).alias("punct_ppm_post"),
            F.expr(
                "cast(chars_pre div greatest(docs_pre, 1) as bigint)"
            ).alias("mean_chars_pre"),
            F.expr(
                "cast(coalesce(chars_post, 0)"
                " div greatest(coalesce(docs_post, 0), 1) as bigint)"
            ).alias("mean_chars_post"),
        )
        .orderBy("source")
    )
