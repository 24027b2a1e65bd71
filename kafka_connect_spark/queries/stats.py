"""Statistical-inference layer, round 10: the nonparametric / categorical
test battery a data-curation pipeline runs when comparing sources, slices
and signals — rank tests (Kruskal-Wallis), association strength
(Cramér's V, Kendall tau-b), variance homogeneity (Brown-Forsythe),
hazard (Nelson-Aalen), proportion tests with multiple-testing control
(two-proportion z + Benjamini-Hochberg), trend-in-proportions
(Cochran-Armitage) and monotone calibration (isotonic/PAV).

Every test here follows the engine's exactness discipline: rank sums,
contingency products and deviation sums are carried as EXACT integers or
decimals (ranks doubled to kill the .5 midrank, absolute deviations
doubled to kill the .5 median), the one or two genuinely-real expressions
per query are IEEE-deterministic divisions of exact integers, and every
emitted double is rounded once via ``dround``. Scale discipline: each
test collapses the corpus to a VALUE-DOMAIN or GROUP-DOMAIN table (distinct
lengths, contingency cells, sources, bins) in one hash-agg pass, and all
pair/rank/cumulative work runs on that bounded table — the corpus is never
globally sorted and never self-joined.

Reference parity: the reference ships no statistics beyond COUNT/SUM-style
SQL (/root/reference/fastapi/main.py:1-66 is a monitoring UI); this layer
is part of the training-data-pipeline surface the brief asks for beyond
reference coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import dround, dround_sql, dsum, dsum_sql, query


@query(
    "x212_kruskal_wallis_length",
    oracle=f"""
    WITH lens AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS c
                  FROM documents GROUP BY 1),
    mid AS (SELECT n_chars, c,
                   2 * (CAST(sum(c) OVER (ORDER BY n_chars
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) - c) + c + 1 AS midrank2
            FROM lens),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c - c)
                        AS DECIMAL(38,0)) AS tie3
            FROM lens),
    sl AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cj
           FROM documents GROUP BY 1, 2),
    grp AS (SELECT source, CAST(sum(cj) AS BIGINT) AS n_j,
                   CAST(sum(CAST(cj AS DECIMAL(38,0)) * midrank2)
                        AS DECIMAL(38,0)) AS r2_j
            FROM sl JOIN mid USING (n_chars) GROUP BY source),
    s4 AS (SELECT {dsum_sql(
               "CAST(r2_j AS DOUBLE) * CAST(r2_j AS DOUBLE) / n_j", 6)} AS s4
           FROM grp),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k_groups FROM grp),
    h AS (SELECT 3.0 * s4 / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1)
                 AS h_raw,
                 1.0 - CAST(tie3 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * n * n - n) AS tie_c
          FROM s4, tot)
    SELECT g.source, g.n_j,
           {dround_sql("CAST(g.r2_j AS DOUBLE) / (2.0 * g.n_j)", 6)}
               AS mean_rank,
           k.k_groups, tot.n,
           {dround_sql("h.h_raw", 6)} AS h,
           {dround_sql("h.h_raw / h.tie_c", 6)} AS h_tie_adj
    FROM grp g, k, tot, h ORDER BY g.source
    """,
)
def x212_kruskal_wallis_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: do the sources draw document lengths from
    the same distribution? The omnibus rank test behind "is source X
    systematically longer" — x174's KS compares ONE source against the
    rest pairwise; KW tests all k at once, and its per-source mean rank
    IS the effect direction. Exactness: midranks ride the value domain
    doubled (midrank2 = 2*cum_before + c + 1, integer), per-source rank
    sums are decimal-exact, the tie term sum(t^3 - t) is decimal-exact,
    and the only doubles are two IEEE divisions of exact integers,
    rounded once. Plan: TWO hash-aggs of the corpus — the global length
    histogram and the (source, length) table — then every rank/cum/join
    runs on those value-domain tables (|distinct lengths| rows); the
    rank cumsum's global window is bounded by construction (audited in
    tests/test_global_window_audit.py)."""
    d = load(spark, sf_dir, "documents")
    lens = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    mid = lens.select(
        "n_chars",
        "c",
        (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1).alias(
            "midrank2"
        ),
    )
    tot = lens.agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).alias("tie3"),
    )
    sl = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cj"))
    grp = (
        sl.join(F.broadcast(mid), "n_chars")
        .groupBy("source")
        .agg(
            F.sum("cj").alias("n_j"),
            F.sum(F.col("cj").cast("decimal(38,0)") * F.col("midrank2")).alias(
                "r2_j"
            ),
        )
    )
    s4 = grp.agg(
        dsum(
            F.col("r2_j").cast("double") * F.col("r2_j").cast("double")
            / F.col("n_j"),
            6,
        ).alias("s4")
    )
    k = grp.agg(F.count(F.lit(1)).alias("k_groups"))
    h = s4.crossJoin(F.broadcast(tot)).select(
        (
            3.0 * F.col("s4") / (F.col("n").cast("double") * (F.col("n") + 1))
            - 3.0 * (F.col("n") + 1)
        ).alias("h_raw"),
        (
            1.0
            - F.col("tie3").cast("double")
            / (
                F.col("n").cast("double") * F.col("n") * F.col("n")
                - F.col("n")
            )
        ).alias("tie_c"),
    )
    return (
        grp.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(tot.select("n")))
        .crossJoin(F.broadcast(h))
        .select(
            "source",
            F.col("n_j").cast("long").alias("n_j"),
            dround(
                F.col("r2_j").cast("double") / (2.0 * F.col("n_j")), 6
            ).alias("mean_rank"),
            F.col("k_groups").cast("long").alias("k_groups"),
            F.col("n").cast("long").alias("n"),
            dround(F.col("h_raw"), 6).alias("h"),
            dround(F.col("h_raw") / F.col("tie_c"), 6).alias("h_tie_adj"),
        )
        .orderBy("source")
    )


@query(
    "x213_cramers_v_panel",
    oracle=f"""
    WITH cells1 AS (SELECT lang AS a, source AS b,
                           CAST(count(*) AS BIGINT) AS o
                    FROM documents GROUP BY 1, 2),
    cells2 AS (SELECT event_type AS a,
                      CAST(dayofweek(ts) AS VARCHAR) AS b,
                      CAST(count(*) AS BIGINT) AS o
               FROM events GROUP BY 1, 2),
    cells AS (SELECT 'lang_x_source' AS pair, * FROM cells1
              UNION ALL SELECT 'event_type_x_weekday', * FROM cells2),
    ra AS (SELECT pair, a, CAST(sum(o) AS BIGINT) AS r FROM cells
           GROUP BY 1, 2),
    cb AS (SELECT pair, b, CAST(sum(o) AS BIGINT) AS c FROM cells
           GROUP BY 1, 2),
    tot AS (SELECT pair, CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT a) AS BIGINT) AS r_levels,
                   CAST(count(DISTINCT b) AS BIGINT) AS c_levels
            FROM cells GROUP BY pair),
    s AS (SELECT cells.pair,
                 {dsum_sql(
                     "CAST(CAST(cells.o AS DECIMAL(38,0)) * cells.o"
                     " AS DOUBLE) / (CAST(ra.r AS DECIMAL(38,0)) * cb.c)",
                     9)} AS s
          FROM cells JOIN ra ON ra.pair = cells.pair AND ra.a = cells.a
                     JOIN cb ON cb.pair = cells.pair AND cb.b = cells.b
          GROUP BY cells.pair)
    SELECT t.pair, t.n, t.r_levels, t.c_levels,
           (t.r_levels - 1) * (t.c_levels - 1) AS dof,
           {dround_sql("t.n * (s.s - 1.0)", 6)} AS chi2,
           {dround_sql(
               "sqrt(greatest(t.n * (s.s - 1.0), 0.0)"
               " / (t.n * (least(t.r_levels, t.c_levels) - 1)))", 6)}
               AS cramers_v
    FROM tot t JOIN s ON s.pair = t.pair ORDER BY t.pair
    """,
)
def x213_cramers_v_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association panel: how strongly is a document's language
    tied to its source, and an event's type to its weekday? The
    effect-SIZE companion to x120's independence test (chi-square says
    "dependent", V says "how much", comparable across tables of
    different shape). Uses the identity chi2 = N(sum O^2/(R*C) - 1) so
    every per-cell term is an IEEE division of exact integers (O^2 and
    R*C carried in decimal), accumulated with dsum and rounded once.
    Plan: one hash-agg per table to contingency cells, marginals from
    the cells (never re-scanning the corpus), broadcast joins on the
    cell tables — |langs x sources| and |types x 7| rows."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "events")
    c1 = d.groupBy(
        F.lit("lang_x_source").alias("pair"),
        F.col("lang").alias("a"),
        F.col("source").alias("b"),
    ).agg(F.count(F.lit(1)).alias("o"))
    c2 = e.groupBy(
        F.lit("event_type_x_weekday").alias("pair"),
        F.col("event_type").alias("a"),
        F.dayofweek("ts").cast("string").alias("b"),
    ).agg(F.count(F.lit(1)).alias("o"))
    cells = c1.unionByName(c2)
    ra = cells.groupBy("pair", "a").agg(F.sum("o").alias("r"))
    cb = cells.groupBy("pair", "b").agg(F.sum("o").alias("c"))
    tot = cells.groupBy("pair").agg(
        F.sum("o").alias("n"),
        F.countDistinct("a").alias("r_levels"),
        F.countDistinct("b").alias("c_levels"),
    )
    s = (
        cells.join(F.broadcast(ra), ["pair", "a"])
        .join(F.broadcast(cb), ["pair", "b"])
        .groupBy("pair")
        .agg(
            dsum(
                (F.col("o").cast("decimal(38,0)") * F.col("o")).cast("double")
                / (F.col("r").cast("decimal(38,0)") * F.col("c")),
                9,
            ).alias("s")
        )
    )
    chi2 = F.col("n") * (F.col("s") - 1.0)
    return (
        tot.join(F.broadcast(s), "pair")
        .select(
            "pair",
            F.col("n").cast("long").alias("n"),
            F.col("r_levels").cast("long").alias("r_levels"),
            F.col("c_levels").cast("long").alias("c_levels"),
            ((F.col("r_levels") - 1) * (F.col("c_levels") - 1))
            .cast("long")
            .alias("dof"),
            dround(chi2, 6).alias("chi2"),
            dround(
                F.sqrt(
                    F.greatest(chi2, F.lit(0.0))
                    / (
                        F.col("n")
                        * (F.least(F.col("r_levels"), F.col("c_levels")) - 1)
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
        .orderBy("pair")
    )


@query(
    "x214_kendall_tau_signals",
    oracle="""
    WITH sig AS (SELECT least(n_chars // 100, 9) AS lb,
                        least(len(string_split(text, ' ')) // 20, 9) AS tb
                 FROM documents),
    cells AS (SELECT lb, tb, CAST(count(*) AS BIGINT) AS o
              FROM sig GROUP BY 1, 2),
    conc AS (SELECT
                 CAST(sum(CASE WHEN j.lb > i.lb AND j.tb > i.tb
                          THEN CAST(i.o AS DECIMAL(38,0)) * j.o
                          ELSE 0 END) AS DECIMAL(38,0)) AS c_pairs,
                 CAST(sum(CASE WHEN j.lb > i.lb AND j.tb < i.tb
                          THEN CAST(i.o AS DECIMAL(38,0)) * j.o
                          ELSE 0 END) AS DECIMAL(38,0)) AS d_pairs
             FROM cells i CROSS JOIN cells j),
    marg AS (SELECT
                 CAST(sum(o) AS BIGINT) AS n,
                 (SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1))
                         AS DECIMAL(38,0))
                  FROM (SELECT CAST(sum(o) AS BIGINT) AS t FROM cells
                        GROUP BY lb)) AS tx2,
                 (SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1))
                         AS DECIMAL(38,0))
                  FROM (SELECT CAST(sum(o) AS BIGINT) AS t FROM cells
                        GROUP BY tb)) AS ty2
             FROM cells)
    SELECT m.n, CAST(c.c_pairs AS BIGINT) AS concordant,
           CAST(c.d_pairs AS BIGINT) AS discordant,
           CAST(m.tx2 AS BIGINT) AS ties_x2, CAST(m.ty2 AS BIGINT) AS ties_y2,
           round(2.0 * CAST(c.c_pairs - c.d_pairs AS DOUBLE)
                 / sqrt(CAST((CAST(m.n AS DECIMAL(38,0)) * (m.n - 1) - m.tx2)
                        * (CAST(m.n AS DECIMAL(38,0)) * (m.n - 1) - m.ty2)
                        AS DOUBLE)), 6) AS tau_b
    FROM conc c, marg m
    """,
)
def x214_kendall_tau_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between two ordinal curation signals (char-length
    bucket vs token-count bucket) — the tie-aware rank correlation used
    to check whether two quality signals are redundant before paying for
    both (x188's Spearman weights by rank distance; tau-b counts pair
    inversions, is robust to the bucketing, and its C/D counts are
    auditable integers). The corpus collapses to a <=10x10 contingency
    table in one pass; concordant/discordant pairs come from the cell
    self-join (<=100^2 rows) with decimal-exact products, ties from the
    marginals doubled (t*(t-1), integer). The single double expression
    is one division of exact decimals, rounded once. Fixed-width buckets
    (not ntile) keep the signal definition scale-independent — no global
    rank is ever computed."""
    d = load(spark, sf_dir, "documents")
    sig = d.select(
        F.least(F.floor(F.col("n_chars") / 100), F.lit(9)).alias("lb"),
        F.least(
            F.floor(F.size(F.split("text", " ")) / 20), F.lit(9)
        ).alias("tb"),
    )
    cells = sig.groupBy("lb", "tb").agg(F.count(F.lit(1)).alias("o"))
    i = cells.select(
        F.col("lb").alias("lb_i"),
        F.col("tb").alias("tb_i"),
        F.col("o").alias("o_i"),
    )
    j = cells.select(
        F.col("lb").alias("lb_j"),
        F.col("tb").alias("tb_j"),
        F.col("o").alias("o_j"),
    )
    prod = F.col("o_i").cast("decimal(38,0)") * F.col("o_j")
    conc = i.crossJoin(F.broadcast(j)).agg(
        F.sum(
            F.when(
                (F.col("lb_j") > F.col("lb_i"))
                & (F.col("tb_j") > F.col("tb_i")),
                prod,
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("c_pairs"),
        F.sum(
            F.when(
                (F.col("lb_j") > F.col("lb_i"))
                & (F.col("tb_j") < F.col("tb_i")),
                prod,
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("d_pairs"),
    )
    tx = (
        cells.groupBy("lb")
        .agg(F.sum("o").alias("t"))
        .agg(
            F.sum(F.col("t").cast("decimal(38,0)") * (F.col("t") - 1)).alias(
                "tx2"
            )
        )
    )
    ty = (
        cells.groupBy("tb")
        .agg(F.sum("o").alias("t"))
        .agg(
            F.sum(F.col("t").cast("decimal(38,0)") * (F.col("t") - 1)).alias(
                "ty2"
            )
        )
    )
    n = cells.agg(F.sum("o").alias("n"))
    n0 = F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)
    return (
        conc.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("c_pairs").cast("long").alias("concordant"),
            F.col("d_pairs").cast("long").alias("discordant"),
            F.col("tx2").cast("long").alias("ties_x2"),
            F.col("ty2").cast("long").alias("ties_y2"),
            dround(
                2.0
                * (F.col("c_pairs") - F.col("d_pairs")).cast("double")
                / F.sqrt(
                    ((n0 - F.col("tx2")) * (n0 - F.col("ty2"))).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )


@query(
    "x216_ewma_anomaly",
    oracle=f"""
    WITH day AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
    hist AS (SELECT b.event_type, b.day, b.c,
                    CAST(sum((1::BIGINT << (30 - date_diff('day', a.day, b.day)))
                         ) AS DECIMAL(38,0)) AS den,
                    CAST(sum(CAST(a.c AS DECIMAL(38,0))
                         * (1::BIGINT << (30 - date_diff('day', a.day, b.day)))
                         ) AS DECIMAL(38,0)) AS num,
                    CAST(sum(CAST(a.c AS DECIMAL(38,0)) * a.c
                         * (1::BIGINT << (30 - date_diff('day', a.day, b.day)))
                         ) AS DECIMAL(38,0)) AS num2
             FROM day b JOIN day a ON a.event_type = b.event_type
                  AND date_diff('day', a.day, b.day) BETWEEN 1 AND 30
             GROUP BY 1, 2, 3),
    m AS (SELECT event_type, day, c,
                 CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma,
                 sqrt(greatest(CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE)
                      - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                      * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)), 0.0))
                     AS sigma
          FROM hist)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c,
           {dround_sql("ewma", 6)} AS ewma,
           {dround_sql("sigma", 6)} AS sigma,
           (abs(c - ewma) > 2.0 * sigma) AS anomaly
    FROM m ORDER BY event_type, day
    """,
)
def x216_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart on daily event volume: each day is scored
    against an exponentially-weighted mean/sigma of its trailing 30
    days (halving decay), flagging days outside +-2 sigma — the
    streaming-friendly anomaly baseline (p12's z-score uses the GLOBAL
    mean, so one regime shift poisons every later day; EWMA forgets).
    Exactness: decay weights are powers of two carried as INTEGERS
    (w = 2^(30-lag), so num/den/num2 are exact decimals and both
    engines' ewma/sigma/flag are the same IEEE doubles — a 0.7^lag
    weight would differ in ulps between libm and the JVM and flip
    boundary flags). Plan: one corpus pass to the (type, day) table,
    then a bounded self-join (<=30 history rows per day) on the value
    domain; no window over the corpus."""
    # r15 optimization (guide §2.4): the trailing-30-day weighted sums
    # used a (type-keyed) self-join of the day table with a datediff
    # filter. Each day's count now EMITS itself at anchors day+1..day+30
    # with the same integer weight 2^(30-k) (offset explode, the x225
    # alignment), plus a k=0 row carrying the anchor day's own count —
    # one hash agg on (event_type, anchor) then reproduces exactly the
    # join's groups: anchors lacking a day-table row have no k=0 row and
    # are dropped, anchors with no history had no inner-join row before
    # and are dropped via den IS NULL. Same weights, same decimal sums,
    # identical outputs; join gone.
    e = load(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    off = day.select(
        "event_type",
        F.col("c").alias("ca"),
        F.explode(F.sequence(F.lit(0), F.lit(30))).alias("k"),
        "day",
    ).select(
        "event_type",
        "ca",
        "k",
        F.expr("date_add(day, k)").alias("anchor"),
    )
    # pow(2, k) is exact in IEEE double for integer k <= 53, so the cast to
    # decimal loses nothing and the weights are true integers
    w = F.pow(F.lit(2.0), (30 - F.col("k")).cast("double")).cast(
        "decimal(38,0)"
    )
    hist = (
        off.groupBy("event_type", F.col("anchor").alias("day"))
        .agg(
            F.max(F.when(F.col("k") == 0, F.col("ca"))).alias("c"),
            F.sum(F.when(F.col("k") > 0, w)).alias("den"),
            F.sum(
                F.when(F.col("k") > 0, F.col("ca").cast("decimal(38,0)") * w)
            ).alias("num"),
            F.sum(
                F.when(
                    F.col("k") > 0,
                    F.col("ca").cast("decimal(38,0)") * F.col("ca") * w,
                )
            ).alias("num2"),
        )
        .filter(F.col("c").isNotNull() & F.col("den").isNotNull())
    )
    ewma = F.col("num").cast("double") / F.col("den").cast("double")
    sigma = F.sqrt(
        F.greatest(
            F.col("num2").cast("double") / F.col("den").cast("double")
            - ewma * ewma,
            F.lit(0.0),
        )
    )
    return (
        hist.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("c").cast("long").alias("c"),
            dround(ewma, 6).alias("ewma"),
            dround(sigma, 6).alias("sigma"),
            (F.abs(F.col("c") - ewma) > 2.0 * sigma).alias("anomaly"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "x217_nelson_aalen_hazard",
    oracle=f"""
    WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY 1),
    p AS (SELECT s.user_id, s.t0,
                 min(CASE WHEN e.event_type = 'purchase' AND e.ts >= s.t0
                          THEN e.ts END) AS tp
          FROM s JOIN events e ON e.user_id = s.user_id
          GROUP BY 1, 2),
    horizon AS (SELECT max(ts) AS tmax FROM events),
    subj AS (SELECT CASE WHEN tp IS NOT NULL
                         THEN date_diff('day', t0, tp)
                         ELSE date_diff('day', t0, tmax) END AS dur,
                    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS converted
             FROM p CROSS JOIN horizon),
    days AS (SELECT dur AS d, CAST(sum(converted) AS BIGINT) AS d_events
             FROM subj GROUP BY 1 HAVING sum(converted) > 0),
    risk AS (SELECT days.d, days.d_events,
                    CAST((SELECT count(*) FROM subj WHERE subj.dur >= days.d)
                         AS BIGINT) AS n_risk
             FROM days),
    t AS (SELECT d, d_events, n_risk,
                 CAST(CAST(d_events AS DOUBLE) / n_risk AS DECIMAL(18,9))
                     AS hq,
                 CAST(CAST(d_events AS DOUBLE)
                      / (CAST(n_risk AS DOUBLE) * n_risk)
                      AS DECIMAL(18,9)) AS vq
          FROM risk),
    c AS (SELECT d, d_events, n_risk,
                 CAST(sum(hq) OVER (ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(18,9)) AS ch,
                 CAST(sum(vq) OVER (ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(18,9)) AS cv
          FROM t)
    SELECT d AS day, d_events, n_risk,
           {dround_sql("CAST(ch AS DOUBLE)", 6)} AS cum_hazard,
           {dround_sql("CAST(cv AS DOUBLE)", 6)} AS cum_hazard_var,
           {dround_sql("exp(-CAST(ch AS DOUBLE))", 6)} AS survival_na
    FROM c ORDER BY day
    """,
)
def x217_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of signup->purchase conversion —
    the estimator pair to x186's Kaplan-Meier: KM multiplies survival
    factors (unstable when a day's risk set is tiny), NA sums hazard
    increments d_i/n_i and carries a closed-form variance (sum
    d_i/n_i^2), which is what monitoring alerts on ('conversion hazard
    this week vs last'). Same censoring-correct subject table as x186
    (first signup, first qualifying purchase, right-censored at the
    horizon). Each increment is one IEEE division of exact integers
    quantized to DECIMAL(18,9) before the cumulative sum, so both
    engines accumulate identical decimals (the x186 ln discipline);
    exp(-H) is emitted as the NA survival to cross-check KM. Plan: two
    user-keyed hash aggs, a day-level agg, a reverse cumulative sum
    over |distinct days| rows (value domain, audited)."""
    e = load(spark, sf_dir, "events")
    # r15 optimization (guide §2.4): the signup aggregate used to be
    # JOINED back to the event stream (an extra exchange + join) only so
    # each user's t0 sat next to their purchases. A window min over
    # user_id computes t0 in place, and the follow-up groupBy is on the
    # SAME key, so it reuses the window's partitioning — one exchange,
    # no join, identical (user_id, t0, tp) rows.
    p = (
        e.withColumn(
            "t0",
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).over(Window.partitionBy("user_id")),
        )
        .filter(F.col("t0").isNotNull())
        .groupBy("user_id", "t0")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t0")),
                    F.col("ts"),
                )
            ).alias("tp")
        )
    )
    horizon = e.agg(F.max("ts").alias("tmax"))
    subj = p.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("tp").isNotNull(), F.datediff(F.col("tp"), F.col("t0"))
        )
        .otherwise(F.datediff(F.col("tmax"), F.col("t0")))
        .alias("dur"),
        F.col("tp").isNotNull().cast("int").alias("converted"),
    )
    alldur = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("converted").alias("d_events"),
    )
    w_desc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = alldur.select(
        "dur",
        "d_events",
        F.sum("n_at").over(w_desc).alias("n_risk"),
    ).filter(F.col("d_events") > 0)
    hq = (
        F.col("d_events").cast("double") / F.col("n_risk")
    ).cast("decimal(18,9)")
    vq = (
        F.col("d_events").cast("double")
        / (F.col("n_risk").cast("double") * F.col("n_risk"))
    ).cast("decimal(18,9)")
    w_asc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    c = risk.select(
        F.col("dur").alias("day"),
        "d_events",
        "n_risk",
        F.sum(hq).over(w_asc).cast("decimal(18,9)").alias("ch"),
        F.sum(vq).over(w_asc).cast("decimal(18,9)").alias("cv"),
    )
    return c.select(
        "day",
        F.col("d_events").cast("long").alias("d_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        dround(F.col("ch").cast("double"), 6).alias("cum_hazard"),
        dround(F.col("cv").cast("double"), 6).alias("cum_hazard_var"),
        dround(F.exp(-F.col("ch").cast("double")), 6).alias("survival_na"),
    ).orderBy("day")


@query(
    "x218_two_proportion_ztest",
    oracle=f"""
    WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_j,
                      CAST(sum(CASE WHEN n_chars < 500 THEN 1 ELSE 0 END)
                           AS BIGINT) AS k_j
               FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_j) AS BIGINT) AS n,
                   CAST(sum(k_j) AS BIGINT) AS k
            FROM g)
    SELECT g.source, g.n_j, g.k_j,
           {dround_sql("CAST(g.k_j AS DOUBLE) / g.n_j", 6)} AS p_src,
           {dround_sql(
               "CAST(tot.k - g.k_j AS DOUBLE) / (tot.n - g.n_j)", 6)}
               AS p_rest,
           {dround_sql(
               "(CAST(g.k_j AS DOUBLE) / g.n_j"
               " - CAST(tot.k - g.k_j AS DOUBLE) / (tot.n - g.n_j))"
               " / sqrt((CAST(tot.k AS DOUBLE) / tot.n)"
               " * (1.0 - CAST(tot.k AS DOUBLE) / tot.n)"
               " * (1.0 / g.n_j + 1.0 / (tot.n - g.n_j)))", 6)} AS z
    FROM g, tot ORDER BY g.source
    """,
)
def x218_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test panel: is each source's short-document rate
    (n_chars < 500) different from the REST of the corpus? The
    per-slice drilldown behind 'which source is dragging the quality
    gate' — x205's Wilson CI bounds one rate; this tests each slice
    against its complement with the pooled-variance z, and feeds the
    x226 Benjamini-Hochberg panel (k slices = k hypotheses). One
    conditional-sum hash agg to |sources| rows; global totals come from
    re-aggregating those rows (the corpus is scanned once); every z is
    IEEE-deterministic arithmetic on exact integers, rounded once."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum((F.col("n_chars") < 500).cast("long")).alias("k_j"),
    )
    tot = g.agg(F.sum("n_j").alias("n"), F.sum("k_j").alias("k"))
    p_src = F.col("k_j").cast("double") / F.col("n_j")
    p_rest = (F.col("k") - F.col("k_j")).cast("double") / (
        F.col("n") - F.col("n_j")
    )
    p_pool = F.col("k").cast("double") / F.col("n")
    z = (p_src - p_rest) / F.sqrt(
        p_pool
        * (1.0 - p_pool)
        * (1.0 / F.col("n_j") + 1.0 / (F.col("n") - F.col("n_j")))
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_j").cast("long").alias("n_j"),
            F.col("k_j").cast("long").alias("k_j"),
            dround(p_src, 6).alias("p_src"),
            dround(p_rest, 6).alias("p_rest"),
            dround(z, 6).alias("z"),
        )
        .orderBy("source")
    )


@query(
    "x215_brown_forsythe_length",
    oracle=f"""
    WITH med AS (SELECT source,
                        CAST(2 * quantile_cont(n_chars, 0.5) AS BIGINT)
                            AS med2
                 FROM documents GROUP BY source),
    z AS (SELECT d.source, abs(2 * d.n_chars - m.med2) AS z2
          FROM documents d JOIN med m ON m.source = d.source),
    g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_j,
                 CAST(sum(CAST(z2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
                 CAST(sum(CAST(z2 AS DECIMAL(38,0)) * z2) AS DECIMAL(38,0))
                     AS s2
          FROM z GROUP BY source),
    tot AS (SELECT CAST(sum(n_j) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(s1) AS DECIMAL(38,0)) AS s_all
            FROM g),
    terms AS (SELECT
        {dsum_sql(
            "CAST(g.s1 * tot.n - tot.s_all * g.n_j AS DOUBLE)"
            " * CAST(g.s1 * tot.n - tot.s_all * g.n_j AS DOUBLE) / g.n_j",
            6)} AS ssb_n2,
        {dsum_sql(
            "CAST(g.s2 * g.n_j - g.s1 * g.s1 AS DOUBLE) / g.n_j", 6)} AS ssw
        FROM g, tot GROUP BY tot.n)
    SELECT g.source, g.n_j,
           {dround_sql("m.med2 / 2.0", 6)} AS median,
           {dround_sql("CAST(g.s1 AS DOUBLE) / (2.0 * g.n_j)", 6)}
               AS mean_absdev,
           tot.k AS k_groups, tot.n,
           {dround_sql(
               "(CAST(tot.n AS DOUBLE) - tot.k) / (tot.k - 1)"
               " * (terms.ssb_n2 / (CAST(tot.n AS DOUBLE) * tot.n))"
               " / terms.ssw", 6)} AS f_stat
    FROM g JOIN med m ON m.source = g.source, tot, terms
    ORDER BY g.source
    """,
)
def x215_brown_forsythe_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test: do the sources differ in length SPREAD, not
    just location? (KW/x212 detects median shifts; a source with the
    same median but wild variance is a different curation problem —
    mixed-quality scrapes show up here first.) Median-centered absolute
    deviations are carried DOUBLED (z2 = |2x - 2*median|, exact integers
    since the interpolated median is a multiple of 0.5), group sums and
    sums-of-squares ride decimal(38,0), the between-group sum of squares
    uses the integer identity (s1_j*N - S*n_j)^2 / (n_j * N^2), and the
    F statistic is assembled from dsum-accumulated IEEE divisions of
    exact integers, rounded once. Plan: one corpus pass for the medians
    (percentile agg), one for the deviations; everything else is
    |sources| rows."""
    # r15 optimization (guide §2.4): after the per-source agg the panel is
    # <= |sources| rows, yet the original re-aggregated it twice (tot,
    # terms) and attached the results with three broadcast crossJoins.
    # Totals and the dsum terms now ride ONE SinglePartition window over
    # the panel (dsum's decimal accumulation is the same order-free sum as
    # a window sum), and med2 is carried through z/g instead of re-joined.
    # Identical exact integers -> identical IEEE expressions -> identical
    # output bits. 5 exchanges + 4 broadcasts -> 3 exchanges + 1 broadcast.
    d = load(spark, sf_dir, "documents")
    med = d.groupBy("source").agg(
        (2 * F.expr("percentile(n_chars, 0.5)")).cast("long").alias("med2")
    )
    z = d.join(F.broadcast(med), "source").select(
        "source",
        "med2",
        F.abs(2 * F.col("n_chars") - F.col("med2")).alias("z2"),
    )
    g = z.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.max("med2").alias("med2"),
        F.sum(F.col("z2").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("z2").cast("decimal(38,0)") * F.col("z2")).alias("s2"),
    )
    wall = Window.partitionBy()
    gt = g.select(
        "source",
        "n_j",
        "med2",
        "s1",
        "s2",
        F.sum("n_j").over(wall).alias("n"),
        F.count(F.lit(1)).over(wall).alias("k"),
        F.sum("s1").over(wall).alias("s_all"),
    )
    ssb_num = F.col("s1") * F.col("n") - F.col("s_all") * F.col("n_j")
    _dec6 = "decimal(38,6)"
    terms = gt.select(
        "source",
        "n_j",
        "med2",
        "s1",
        "n",
        "k",
        dround(
            F.sum(
                (
                    ssb_num.cast("double")
                    * ssb_num.cast("double")
                    / F.col("n_j")
                ).cast(_dec6)
            )
            .over(wall)
            .cast("double"),
            6,
        ).alias("ssb_n2"),
        dround(
            F.sum(
                (
                    (
                        F.col("s2") * F.col("n_j")
                        - F.col("s1") * F.col("s1")
                    ).cast("double")
                    / F.col("n_j")
                ).cast(_dec6)
            )
            .over(wall)
            .cast("double"),
            6,
        ).alias("ssw"),
    )
    return (
        terms
        .select(
            "source",
            F.col("n_j").cast("long").alias("n_j"),
            dround(F.col("med2") / 2.0, 6).alias("median"),
            dround(
                F.col("s1").cast("double") / (2.0 * F.col("n_j")), 6
            ).alias("mean_absdev"),
            F.col("k").cast("long").alias("k_groups"),
            F.col("n").cast("long").alias("n"),
            dround(
                (F.col("n").cast("double") - F.col("k"))
                / (F.col("k") - 1)
                * (
                    F.col("ssb_n2")
                    / (F.col("n").cast("double") * F.col("n"))
                )
                / F.col("ssw"),
                6,
            ).alias("f_stat"),
        )
        .orderBy("source")
    )


@query(
    "x222_concentration_panel",
    oracle=f"""
    WITH base AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(n_chars) AS BIGINT) AS n_chars
                  FROM documents GROUP BY 1, 2),
    langs AS (SELECT lang, source, n_docs, n_chars FROM base
              UNION ALL
              SELECT '*', source, CAST(sum(n_docs) AS BIGINT),
                     CAST(sum(n_chars) AS BIGINT)
              FROM base GROUP BY source),
    melt AS (SELECT lang, 'docs' AS measure, source,
                    CAST(n_docs AS BIGINT) AS v FROM langs
             UNION ALL
             SELECT lang, 'chars', source, CAST(n_chars AS BIGINT)
             FROM langs),
    tot AS (SELECT lang, measure, CAST(sum(v) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS n_sources,
                   CAST(max(v) AS BIGINT) AS vmax
            FROM melt GROUP BY 1, 2),
    agg AS (SELECT m.lang, m.measure,
                   {dsum_sql(
                       "(CAST(m.v AS DOUBLE) / t.t)"
                       " * (CAST(m.v AS DOUBLE) / t.t)", 9)} AS hhi,
                   {dsum_sql(
                       "CASE WHEN m.v > 0 THEN -(CAST(m.v AS DOUBLE) / t.t)"
                       " * ln(CAST(m.v AS DOUBLE) / t.t) ELSE 0.0 END",
                       9)} AS entropy
            FROM melt m JOIN tot t ON t.lang = m.lang
                 AND t.measure = m.measure
            GROUP BY 1, 2)
    SELECT t.lang, t.measure, t.n_sources, t.t AS total,
           {dround_sql("a.hhi", 6)} AS hhi,
           {dround_sql("CAST(t.vmax AS DOUBLE) / t.t", 6)} AS top_share,
           {dround_sql("a.entropy", 6)} AS entropy
    FROM tot t JOIN agg a ON a.lang = t.lang AND a.measure = t.measure
    ORDER BY t.lang, t.measure
    """,
)
def x222_concentration_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-concentration panel per language (and overall '*'), over
    BOTH document count and character mass: Herfindahl index, top-source
    share, Shannon entropy — the "is this slice effectively one source"
    diagnostic a mixture planner (x151) reads before trusting a
    per-lang quota, and the scalar summary of x72's full skew report.
    Char-mass vs doc-count disagreement is itself the signal (one
    source contributing few huge docs). All shares are IEEE divisions
    of exact integers; HHI/entropy terms accumulate via dsum and round
    once. One corpus pass to the (lang, source) table (~|langs x
    sources| rows); everything else is re-aggregation of that table."""
    # r15 optimization (guide §2.4): the original built base UNION
    # overall (a second agg pass over base), melted via a two-branch
    # union, then joined the melt back to its own totals twice — 8
    # sequential exchange/broadcast rounds over at most a few hundred
    # rows, all orchestration. GROUPING SETS computes (lang, source) and
    # (source) partials in ONE aggregation (exact integer sums are
    # associative, so the '*' rows are the identical longs); the melt is
    # an in-row explode instead of a union; and the per-(lang, measure)
    # totals ride a window over the SAME key the final agg groups on, so
    # the window's exchange is reused — no self-joins, no duplicated
    # subtrees. Values are bit-identical: shares divide the same exact
    # longs, and dsum keeps HHI/entropy order-independent.
    d = load(spark, sf_dir, "documents")
    langs = d.groupingSets(
        [["lang", "source"], ["source"]], "lang", "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.grouping("lang").alias("_g"),
    ).select(
        F.when(F.col("_g") == 1, F.lit("*"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "source",
        "n_docs",
        "n_chars",
    )
    melt = langs.select(
        "lang",
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit("docs").alias("measure"),
                    F.col("n_docs").alias("v"),
                ),
                F.struct(
                    F.lit("chars").alias("measure"),
                    F.col("n_chars").alias("v"),
                ),
            )
        ).alias("mv"),
    ).select("lang", F.col("mv.measure").alias("measure"), "source", F.col("mv.v").alias("v"))
    w = Window.partitionBy("lang", "measure")
    melt = melt.select(
        "lang",
        "measure",
        "v",
        F.sum("v").over(w).alias("t"),
        F.count(F.lit(1)).over(w).alias("n_sources"),
        F.max("v").over(w).alias("vmax"),
    )
    share = F.col("v").cast("double") / F.col("t")
    return (
        melt.groupBy("lang", "measure")
        .agg(
            F.max("n_sources").cast("long").alias("n_sources"),
            F.max("t").cast("long").alias("total"),
            dround(dsum(share * share, 9), 6).alias("hhi"),
            dround(
                F.max("vmax").cast("double") / F.max("t"), 6
            ).alias("top_share"),
            dround(
                dsum(
                    F.when(
                        F.col("v") > 0, -share * F.log(share)
                    ).otherwise(F.lit(0.0)),
                    9,
                ),
                6,
            ).alias("entropy"),
        )
        .orderBy("lang", "measure")
    )


@query(
    "x223_cochran_armitage_trend",
    oracle=f"""
    WITH ud AS (SELECT user_id, CAST(ts AS DATE) AS day,
                       CAST(sum(CASE WHEN event_type = 'view'
                                THEN 1 ELSE 0 END) AS BIGINT) AS views,
                       CAST(max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS y
                FROM events GROUP BY 1, 2),
    g AS (SELECT least(views, 5) AS s, CAST(count(*) AS BIGINT) AS n_i,
                 CAST(sum(y) AS BIGINT) AS r_i
          FROM ud GROUP BY 1),
    tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
                   CAST(sum(r_i) AS BIGINT) AS r,
                   CAST(sum(CAST(s AS DECIMAL(38,0)) * n_i)
                        AS DECIMAL(38,0)) AS sn,
                   CAST(sum(CAST(s AS DECIMAL(38,0)) * r_i)
                        AS DECIMAL(38,0)) AS sr,
                   CAST(sum(CAST(s AS DECIMAL(38,0)) * s * n_i)
                        AS DECIMAL(38,0)) AS s2n
            FROM g),
    z AS (SELECT n, r,
                 CAST(n * sr - r * sn AS DECIMAL(38,0)) AS a,
                 CAST(n * s2n - sn * sn AS DECIMAL(38,0)) AS b
          FROM tot)
    SELECT g.s, g.n_i, g.r_i,
           {dround_sql("CAST(g.r_i AS DOUBLE) / g.n_i", 6)} AS rate,
           z.n, z.r AS successes,
           CAST(z.a AS BIGINT) AS a_num,
           CAST(z.b AS BIGINT) AS b_den,
           {dround_sql(
               "CAST(z.a AS DOUBLE) / sqrt(CAST(z.r"
               " * (z.n - z.r) * z.b AS DOUBLE) / z.n)", 6)} AS z
    FROM g, z ORDER BY g.s
    """,
)
def x223_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does per-user-day purchase propensity
    rise MONOTONICALLY with view count? The ordered-groups complement to
    x94's omnibus chi-square (which spends power on any deviation; CA
    targets the dose-response alternative 'more views -> more
    conversion', one degree of freedom). Scores are the capped view
    buckets s=0..5, so the statistic's numerator A = N*sum(s*r) -
    R*sum(s*n) and curvature term B = N*sum(s^2*n) - (sum(s*n))^2 are
    exact decimals; z = A / sqrt(R(N-R)B/N) is assembled from two IEEE
    operations on those exacts, rounded once. Plan: one (user, day)
    hash agg (conditional sums, no join), collapse to <=6 bucket rows,
    closed form on those."""
    e = load(spark, sf_dir, "events")
    ud = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("views"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias("y"),
    )
    # r15 optimization (guide §2.4): the <=6-bucket panel's totals rode a
    # separate 1-row aggregate broadcast-crossJoined back; they now ride
    # one SinglePartition window over the same exact decimal sums —
    # identical integers, identical z, 2 fewer exchange/broadcast rounds.
    g = ud.groupBy(F.least(F.col("views"), F.lit(5)).alias("s")).agg(
        F.count(F.lit(1)).alias("n_i"), F.sum("y").alias("r_i")
    )
    sd = F.col("s").cast("decimal(38,0)")
    wall = Window.partitionBy()
    gt = g.select(
        "s",
        "n_i",
        "r_i",
        F.sum("n_i").over(wall).alias("n"),
        F.sum("r_i").over(wall).alias("r"),
        F.sum(sd * F.col("n_i")).over(wall).alias("sn"),
        F.sum(sd * F.col("r_i")).over(wall).alias("sr"),
        F.sum(sd * F.col("s") * F.col("n_i")).over(wall).alias("s2n"),
    )
    z = gt.select(
        "s",
        "n_i",
        "r_i",
        "n",
        "r",
        (F.col("n") * F.col("sr") - F.col("r") * F.col("sn"))
        .cast("decimal(38,0)")
        .alias("a"),
        (F.col("n") * F.col("s2n") - F.col("sn") * F.col("sn"))
        .cast("decimal(38,0)")
        .alias("b"),
    )
    return (
        z
        .select(
            F.col("s").cast("long").alias("s"),
            F.col("n_i").cast("long").alias("n_i"),
            F.col("r_i").cast("long").alias("r_i"),
            dround(F.col("r_i").cast("double") / F.col("n_i"), 6).alias(
                "rate"
            ),
            F.col("n").cast("long").alias("n"),
            F.col("r").cast("long").alias("successes"),
            F.col("a").cast("long").alias("a_num"),
            F.col("b").cast("long").alias("b_den"),
            dround(
                F.col("a").cast("double")
                / F.sqrt(
                    (
                        F.col("r")
                        * (F.col("n") - F.col("r")).cast("decimal(38,0)")
                        * F.col("b")
                    ).cast("double")
                    / F.col("n")
                ),
                6,
            ).alias("z"),
        )
        .orderBy("s")
    )


@query(
    "x224_isotonic_calibration",
    oracle=f"""
    WITH bins AS (SELECT least(n_chars // 50, 19) AS b,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                              AS BIGINT) AS y
                  FROM documents GROUP BY 1),
    c AS (SELECT b, n, y,
                 CAST(sum(n) OVER (ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cn,
                 CAST(sum(y) OVER (ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cy
          FROM bins),
    triple AS (SELECT i.b AS bi, j.b AS bj, k.b AS bk,
                      CAST(k.cy - (j.cy - j.y) AS DOUBLE)
                          / (k.cn - (j.cn - j.n)) AS mean_jk
               FROM c i JOIN c j ON j.b <= i.b
                        JOIN c k ON k.b >= i.b),
    inner_min AS (SELECT bi, bj, min(mean_jk) AS m FROM triple
                  GROUP BY 1, 2),
    iso AS (SELECT bi AS b, max(m) AS iso_rate FROM inner_min GROUP BY 1)
    SELECT bins.b, bins.n, bins.y,
           {dround_sql("CAST(bins.y AS DOUBLE) / bins.n", 6)} AS rate,
           {dround_sql("iso.iso_rate", 6)} AS iso_rate
    FROM bins JOIN iso USING (b) ORDER BY bins.b
    """,
)
def x224_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the 'is-English' rate against the
    length bucket: the monotone regression that turns a noisy
    per-bin empirical rate (x184's calibration curve) into the best
    monotone fit — what you apply before thresholding a score whose
    direction you trust but whose values you don't. Computed by the
    minimax identity iso(i) = max_{{j<=i}} min_{{k>=i}} mean(y_j..y_k)
    — equivalent to pool-adjacent-violators but CLOSED FORM, so it runs
    as a triple join over the <=20-bin value domain (<=8000 rows, all
    broadcast) instead of a sequential pooling loop; every candidate
    mean is one IEEE division of exact prefix-sum integers, and min/max
    over those doubles are order-free. The corpus contributes one
    conditional-sum hash agg. The prefix cumsum rides the audited
    bin-domain window."""
    # r15 optimization (guide §2.4): the <=20-bin panel was run through a
    # single-partition cumsum window, an i x j x k triple join (two
    # broadcast builds), two re-aggregations and a join back to bins — 5+
    # exchange/broadcast rounds of orchestration around ~8000 tiny rows.
    # The whole PAV minimax is now evaluated IN-ROW on the sorted bin
    # array with higher-order functions: prefix sums via slice+aggregate,
    # iso(i) = array_max over j<=i of array_min over k>=i of the same
    # (cy_k - cy_{j-1}) / (cn_k - cn_{j-1}) IEEE division of exact longs,
    # then one explode back to rows. min/max over identical doubles and
    # identical divisions — bit-equal outputs, one corpus agg + one 1-row
    # agg + explode. The former audited global cumsum window is gone.
    d = load(spark, sf_dir, "documents")
    bins = d.groupBy(
        F.least(F.floor(F.col("n_chars") / 50), F.lit(19)).alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("lang") == "en").cast("long")).alias("y"),
    )
    arr = bins.groupBy().agg(
        F.expr("array_sort(collect_list(struct(b, n, y)))").alias("a")
    )
    # prefix sums over the sorted bins (cn/cy through index i, 0-based)
    pre = (
        "transform(sequence(0, size(a) - 1), i -> struct("
        "aggregate(slice(a, 1, i + 1), 0L, (s, x) -> s + x.n) AS cn, "
        "aggregate(slice(a, 1, i + 1), 0L, (s, x) -> s + x.y) AS cy))"
    )
    mean_jk = (
        "cast(p[k].cy - (p[j].cy - a[j].y) as double)"
        " / (p[k].cn - (p[j].cn - a[j].n))"
    )
    iso = (
        "transform(sequence(0, size(a) - 1), i -> "
        "array_max(transform(sequence(0, i), j -> "
        f"array_min(transform(sequence(i, size(a) - 1), k -> {mean_jk})))))"
    )
    rows = (
        arr.select("a", F.expr(pre).alias("p"))
        .select("a", F.expr(iso).alias("iso"))
        .select(
            F.expr(
                "explode(transform(sequence(0, size(a) - 1), "
                "i -> struct(a[i].b AS b, a[i].n AS n, a[i].y AS y, "
                "iso[i] AS iso_rate)))"
            ).alias("r")
        )
        .select("r.b", "r.n", "r.y", "r.iso_rate")
    )
    return rows.select(
        F.col("b").cast("long").alias("b"),
        F.col("n").cast("long").alias("n"),
        F.col("y").cast("long").alias("y"),
        dround(F.col("y").cast("double") / F.col("n"), 6).alias("rate"),
        dround(F.col("iso_rate"), 6).alias("iso_rate"),
    ).orderBy("b")


@query(
    "x225_pacf_profile",
    oracle=f"""
    WITH day AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(c) AS BIGINT) AS s
           FROM day GROUP BY event_type),
    dev AS (SELECT day.event_type, day.day, day.c * st.n - st.s AS d
            FROM day JOIN st USING (event_type)),
    den AS (SELECT event_type,
                   CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS den
            FROM dev GROUP BY event_type),
    lags AS (SELECT unnest(range(1, 4)) AS lag_days),
    p AS (SELECT a.event_type, lags.lag_days,
                 CAST(sum(CAST(a.d AS HUGEINT) * b.d) AS HUGEINT) AS num
          FROM dev a CROSS JOIN lags
          JOIN dev b ON b.event_type = a.event_type
                    AND b.day = a.day + CAST(lags.lag_days AS INTEGER)
          GROUP BY 1, 2),
    r AS (SELECT p.event_type,
                 max(CASE WHEN lag_days = 1 THEN CAST(num AS DOUBLE)
                     / CAST(den AS DOUBLE) END) AS r1,
                 max(CASE WHEN lag_days = 2 THEN CAST(num AS DOUBLE)
                     / CAST(den AS DOUBLE) END) AS r2,
                 max(CASE WHEN lag_days = 3 THEN CAST(num AS DOUBLE)
                     / CAST(den AS DOUBLE) END) AS r3
          FROM p JOIN den USING (event_type) GROUP BY 1),
    dl AS (SELECT event_type, r1, r2, r3,
                  (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
           FROM r),
    dl2 AS (SELECT *, r1 * (1.0 - phi22) AS a21 FROM dl)
    SELECT event_type,
           {dround_sql("r1", 6)} AS r1,
           {dround_sql("r2", 6)} AS r2,
           {dround_sql("r3", 6)} AS r3,
           {dround_sql("r1", 6)} AS pacf1,
           {dround_sql("phi22", 6)} AS pacf2,
           {dround_sql(
               "(r3 - a21 * r2 - phi22 * r1)"
               " / (1.0 - a21 * r1 - phi22 * r2)", 6)} AS pacf3
    FROM dl2 ORDER BY event_type
    """,
)
def x225_pacf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (lags 1-3) of daily event volume per type
    via the Durbin-Levinson closed form on x201's exact ACF — the
    model-order diagnostic ACF can't give: x201's lag-2 correlation
    may just be lag-1 echoing twice; PACF(2) is the lag-2 effect AFTER
    regressing out lag-1 (AR(p) shows PACF cutting off at p). The ACF
    numerators/denominator are x201's decimal-exact products; the
    Durbin-Levinson recursion (phi22 = (r2-r1^2)/(1-r1^2), phi33 via
    the level-2 coefficients) is a fixed sequence of IEEE operations on
    those deterministic doubles, identical in both engines, rounded
    once at emission. Plan: identical to x201 — one corpus pass, then
    everything on the |types| x |days| table."""
    # r15 optimization (guide §2.4): the original materialized st and den
    # as separate aggregations joined back (2 broadcasts) and matched the
    # lag pairs with an exploded equi-join — 8 exchange rounds for a
    # |types| x |days| table. Now: per-type (n, s) ride ONE window over
    # event_type; the lag products come from an OFFSET EXPLODE (each day
    # contributes its deviation at anchors day-0..day-3) so one hash agg
    # on (event_type, anchor) aligns d(t) with d(t+l) exactly where the
    # join matched them (missing days yield NULL products, which the sum
    # skips — identical semantics); den = sum(d0²) over anchors, which is
    # exactly sum(d²) over days. Same exact integers through the same
    # decimal accumulation — identical outputs, half the exchanges.
    e = load(spark, sf_dir, "events")
    day = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wt = Window.partitionBy("event_type")
    dev = day.select(
        "event_type",
        "day",
        (
            F.col("c") * F.count(F.lit(1)).over(wt) - F.sum("c").over(wt)
        ).alias("d"),
    )
    off = dev.select(
        "event_type",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("off"),
        "day",
    ).select(
        "event_type",
        "d",
        "off",
        F.expr("date_sub(day, off)").alias("anchor"),
    )
    d_at = [
        F.max(F.when(F.col("off") == i, F.col("d"))).alias(f"d{i}")
        for i in range(4)
    ]
    per_anchor = off.groupBy("event_type", "anchor").agg(*d_at)
    d0dec = F.col("d0").cast("decimal(38,0)")
    r = per_anchor.groupBy("event_type").agg(
        F.sum(d0dec * F.col("d0")).alias("den"),
        F.sum(d0dec * F.col("d1")).alias("num1"),
        F.sum(d0dec * F.col("d2")).alias("num2"),
        F.sum(d0dec * F.col("d3")).alias("num3"),
    ).select(
        "event_type",
        *[
            (
                F.col(f"num{i}").cast("double")
                / F.col("den").cast("double")
            ).alias(f"r{i}")
            for i in (1, 2, 3)
        ],
    )
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1.0 - F.col("r1") * F.col("r1")
    )
    dl = r.select("event_type", "r1", "r2", "r3", phi22.alias("phi22"))
    a21 = F.col("r1") * (1.0 - F.col("phi22"))
    return dl.select(
        "event_type",
        dround(F.col("r1"), 6).alias("r1"),
        dround(F.col("r2"), 6).alias("r2"),
        dround(F.col("r3"), 6).alias("r3"),
        dround(F.col("r1"), 6).alias("pacf1"),
        dround(F.col("phi22"), 6).alias("pacf2"),
        dround(
            (F.col("r3") - a21 * F.col("r2") - F.col("phi22") * F.col("r1"))
            / (1.0 - a21 * F.col("r1") - F.col("phi22") * F.col("r2")),
            6,
        ).alias("pacf3"),
    ).orderBy("event_type")


# Abramowitz & Stegun 7.1.26 erf approximation (max abs error 1.5e-7) —
# both engines lack a built-in normal CDF; this is a fixed sequence of
# IEEE double operations (one exp, one division, a degree-5 polynomial)
# computed identically by Spark and DuckDB, so the approximated p-value is
# cross-engine deterministic to the last bit modulo exp()'s ulp.
_AS_COEF = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _norm_sf2_sql(zabs: str) -> str:
    """SQL for p = 2*(1 - Phi(|z|)) = erfc(|z|/sqrt(2))."""
    x = f"({zabs} / 1.4142135623730951)"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    a1, a2, a3, a4, a5 = _AS_COEF
    poly = (
        f"({a1} * {t} + {a2} * {t} * {t} + {a3} * {t} * {t} * {t}"
        f" + {a4} * {t} * {t} * {t} * {t}"
        f" + {a5} * {t} * {t} * {t} * {t} * {t})"
    )
    return f"({poly} * exp(-{x} * {x}))"


def _norm_sf2(zabs):
    """Column for p = 2*(1 - Phi(|z|)) — mirrors :func:`_norm_sf2_sql`."""
    x = zabs / 1.4142135623730951
    t = 1.0 / (1.0 + 0.3275911 * x)
    a1, a2, a3, a4, a5 = _AS_COEF
    poly = a1 * t + a2 * t * t + a3 * t * t * t + a4 * t * t * t * t + (
        a5 * t * t * t * t * t
    )
    return poly * F.exp(-x * x)


@query(
    "x226_bh_fdr_panel",
    oracle=f"""
    WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_j,
                      CAST(sum(CASE WHEN n_chars < 500 THEN 1 ELSE 0 END)
                           AS BIGINT) AS k_j
               FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_j) AS BIGINT) AS n,
                   CAST(sum(k_j) AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS m
            FROM g),
    zt AS (SELECT g.source, tot.m,
                  abs((CAST(g.k_j AS DOUBLE) / g.n_j
                      - CAST(tot.k - g.k_j AS DOUBLE) / (tot.n - g.n_j))
                      / sqrt((CAST(tot.k AS DOUBLE) / tot.n)
                      * (1.0 - CAST(tot.k AS DOUBLE) / tot.n)
                      * (1.0 / g.n_j + 1.0 / (tot.n - g.n_j)))) AS zabs
          FROM g, tot),
    pt AS (SELECT source, m, zabs,
                  {dround_sql(_norm_sf2_sql("zabs"), 6)} AS p6 FROM zt),
    rk AS (SELECT source, m, zabs, p6,
                  CAST(row_number() OVER (ORDER BY p6, source) AS BIGINT)
                      AS rnk
           FROM pt),
    kmax AS (SELECT COALESCE(max(CASE WHEN p6 <=
                             {dround_sql("rnk * 0.10 / m", 6)}
                             THEN rnk END), 0) AS kmax
             FROM rk)
    SELECT rk.source,
           {dround_sql("rk.zabs", 6)} AS z_abs,
           rk.p6 AS p_approx,
           rk.rnk, (rk.rnk <= kmax.kmax) AS bh_reject
    FROM rk, kmax ORDER BY rk.source
    """,
)
def x226_bh_fdr_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the x218 per-source proportion
    tests — the multiple-testing step every per-slice drilldown needs:
    with 20 sources, one 'significant' z at alpha=0.05 is expected by
    chance; BH (q=0.10) bounds the FALSE DISCOVERY rate across the
    panel. p-values come from the A&S 7.1.26 erfc approximation (both
    engines lack a normal CDF; the closed form is the same IEEE
    sequence in both), ranking is over the |sources| panel (bounded
    domain, audited window; ties broken by source name), and the BH
    step-up rule is the rank of the largest p under its threshold —
    computed as one bounded agg, no iteration. At 100 TB the panel is
    still |sources| rows; the corpus cost is x218's single pass."""
    # r15 optimization (guide §2.4): after the one corpus agg the panel is
    # <= |sources| rows, yet the original re-aggregated it (tot), broadcast-
    # crossJoined twice, and aggregated again for kmax — 5 exchanges + 2
    # broadcast-build jobs of pure orchestration. All the panel-level
    # quantities now ride ONE SinglePartition window chain (the same
    # audited bounded domain the BH rank window already funnels through):
    # totals as unordered global-window sums, the BH step-up kmax as a
    # global-window max over the ranked rows. Identical exact integers
    # feed identical IEEE expressions, so every output bit is unchanged.
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum((F.col("n_chars") < 500).cast("long")).alias("k_j"),
    )
    wall = Window.partitionBy()
    gt = g.select(
        "source",
        "n_j",
        "k_j",
        F.sum("n_j").over(wall).alias("n"),
        F.sum("k_j").over(wall).alias("k"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    p_pool = F.col("k").cast("double") / F.col("n")
    zabs = F.abs(
        (
            F.col("k_j").cast("double") / F.col("n_j")
            - (F.col("k") - F.col("k_j")).cast("double")
            / (F.col("n") - F.col("n_j"))
        )
        / F.sqrt(
            p_pool
            * (1.0 - p_pool)
            * (1.0 / F.col("n_j") + 1.0 / (F.col("n") - F.col("n_j")))
        )
    )
    zt = gt.select("source", "m", zabs.alias("zabs"))
    # The step-up rule compares the 6-dp-ROUNDED p against the 6-dp-rounded
    # threshold (and ranks on the rounded p) so a 1-ulp exp() difference
    # between engines can't flip bh_reject at a boundary — the x240
    # rank-key lesson applied to the comparison itself.
    pt = zt.select(
        "source", "m", "zabs", dround(_norm_sf2(F.col("zabs")), 6).alias("p6")
    )
    rk = pt.select(
        "source",
        "m",
        "zabs",
        "p6",
        F.row_number()
        .over(Window.orderBy("p6", "source"))
        .cast("long")
        .alias("rnk"),
    )
    kmax = F.coalesce(
        F.max(
            F.when(
                F.col("p6") <= dround(F.col("rnk") * 0.10 / F.col("m"), 6),
                F.col("rnk"),
            )
        ).over(wall),
        F.lit(0).cast("long"),
    )
    return (
        rk.select(
            "source",
            dround(F.col("zabs"), 6).alias("z_abs"),
            F.col("p6").alias("p_approx"),
            "rnk",
            (F.col("rnk") <= kmax).alias("bh_reject"),
        )
        .orderBy("source")
    )


@query(
    "x227_brier_decomposition",
    oracle=f"""
    WITH d AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  least(CAST(len(list_filter(toks, t -> t IN
                            ('a','the','of','and','to','in'))) AS BIGINT)
                        * 5000000 // len(toks), 1000000) AS p
           FROM d),
    bins AS (SELECT least(p // 100001, 9) AS b,
                    CAST(count(*) AS BIGINT) AS n_k,
                    CAST(sum(y) AS BIGINT) AS y_k,
                    CAST(sum(p) AS BIGINT) AS p_k
             FROM sc GROUP BY 1),
    tot AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
                   CAST(sum(y_k) AS BIGINT) AS yy
            FROM bins),
    terms AS (SELECT
        {dsum_sql(
            "CAST((CAST(bins.p_k AS DECIMAL(38,0)) - 1000000"
            " * CAST(bins.y_k AS DECIMAL(38,0)))"
            " * (CAST(bins.p_k AS DECIMAL(38,0)) - 1000000"
            " * CAST(bins.y_k AS DECIMAL(38,0))) AS DOUBLE) / bins.n_k",
            6)} AS rel_t,
        {dsum_sql(
            "CAST((1000000 * (CAST(bins.y_k AS DECIMAL(38,0)) * tot.n"
            " - CAST(tot.yy AS DECIMAL(38,0)) * bins.n_k))"
            " * (1000000 * (CAST(bins.y_k AS DECIMAL(38,0)) * tot.n"
            " - CAST(tot.yy AS DECIMAL(38,0)) * bins.n_k))"
            " AS DOUBLE) / bins.n_k", 6)} AS res_t
        FROM bins, tot GROUP BY tot.n)
    SELECT bins.b, bins.n_k, bins.y_k,
           {dround_sql("CAST(bins.p_k AS DOUBLE) / (bins.n_k * 1000000.0)", 6)}
               AS mean_forecast,
           {dround_sql("CAST(bins.y_k AS DOUBLE) / bins.n_k", 6)}
               AS event_rate,
           {dround_sql(
               "terms.rel_t / (CAST(tot.n AS DOUBLE) * 1e12)", 6)}
               AS reliability,
           {dround_sql(
               "terms.res_t / (CAST(tot.n AS DOUBLE) * tot.n * tot.n * 1e12)",
               6)} AS resolution,
           {dround_sql(
               "(CAST(tot.yy AS DOUBLE) / tot.n)"
               " * (1.0 - CAST(tot.yy AS DOUBLE) / tot.n)", 6)}
               AS uncertainty,
           {dround_sql(
               "terms.rel_t / (CAST(tot.n AS DOUBLE) * 1e12)"
               " - terms.res_t / (CAST(tot.n AS DOUBLE) * tot.n * tot.n * 1e12)"
               " + (CAST(tot.yy AS DOUBLE) / tot.n)"
               " * (1.0 - CAST(tot.yy AS DOUBLE) / tot.n)", 6)}
               AS brier_murphy
    FROM bins, tot, terms ORDER BY bins.b
    """,
)
def x227_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of x195's Brier score into reliability
    (calibration error), resolution (discrimination) and uncertainty
    (base rate) over 10 forecast bins — the diagnosis x195's single
    number can't make: a bad Brier from miscalibration is FIXABLE
    (recalibrate, e.g. x224's isotonic fit); a bad Brier from zero
    resolution means the signal is useless. Same forecast (stopword
    density, ppm integers) and outcome as x195. Exactness: REL terms
    are (p_k - 1e6 y_k)^2 / n_k on exact integers; RES terms multiply
    through by N to avoid the float base rate ((1e6(y_k N - Y n_k))^2 /
    n_k, decimal-carried); both accumulate via dsum and divide once by
    the exact N powers. Plan: one corpus pass to 10 bin rows; the
    decomposition is arithmetic on those rows."""
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
    bins = sc.groupBy(
        F.least(F.floor(F.col("p") / 100001), F.lit(9)).alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("y").alias("y_k"),
        F.sum("p").alias("p_k"),
    )
    tot = bins.agg(F.sum("n_k").alias("n"), F.sum("y_k").alias("yy"))
    bt = bins.crossJoin(F.broadcast(tot))
    # cast to decimal BEFORE every multiply (the x167/x182 overflow lesson —
    # p_k is ~n_k*1e6 and the squared terms blow past int64 at 4x sf0.1)
    rel_num = F.col("p_k").cast("decimal(38,0)") - F.lit(1_000_000) * F.col(
        "y_k"
    ).cast("decimal(38,0)")
    res_num = F.lit(1_000_000).cast("decimal(38,0)") * (
        F.col("y_k").cast("decimal(38,0)") * F.col("n")
        - F.col("yy").cast("decimal(38,0)") * F.col("n_k")
    )
    terms = bt.groupBy("n").agg(
        dsum((rel_num * rel_num).cast("double") / F.col("n_k"), 6).alias(
            "rel_t"
        ),
        dsum((res_num * res_num).cast("double") / F.col("n_k"), 6).alias(
            "res_t"
        ),
    ).drop("n")
    rel = F.col("rel_t") / (F.col("n").cast("double") * 1e12)
    res = F.col("res_t") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") * 1e12
    )
    unc = (F.col("yy").cast("double") / F.col("n")) * (
        1.0 - F.col("yy").cast("double") / F.col("n")
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(terms))
        .select(
            F.col("b").cast("long").alias("b"),
            F.col("n_k").cast("long").alias("n_k"),
            F.col("y_k").cast("long").alias("y_k"),
            dround(
                F.col("p_k").cast("double") / (F.col("n_k") * 1_000_000.0), 6
            ).alias("mean_forecast"),
            dround(F.col("y_k").cast("double") / F.col("n_k"), 6).alias(
                "event_rate"
            ),
            dround(rel, 6).alias("reliability"),
            dround(res, 6).alias("resolution"),
            dround(unc, 6).alias("uncertainty"),
            dround(rel - res + unc, 6).alias("brier_murphy"),
        )
        .orderBy("b")
    )


@query(
    "x231_fleiss_kappa",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                  FROM documents),
    raters AS (SELECT doc_id,
                      (CASE WHEN len(list_filter(t, x -> x IN
                           ('a','the','of','and','to','in'))) * 5000000
                           // len(t) >= 300000 THEN 1 ELSE 0 END)
                      + (CASE WHEN list_contains(t, 'the')
                         THEN 1 ELSE 0 END)
                      + (CASE WHEN length(array_to_string(t, '')) * 10
                           <= 52 * len(t) THEN 1 ELSE 0 END) AS k
               FROM toks),
    hist AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM raters
             GROUP BY k),
    agg AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(c * (k * (k - 1) + (3 - k) * (2 - k)))
                        AS BIGINT) AS agree6,
                   CAST(sum(c * k) AS BIGINT) AS votes
            FROM hist)
    SELECT hist.k AS n_votes_en, hist.c AS n_docs, agg.n,
           {dround_sql("CAST(agg.agree6 AS DOUBLE) / (6.0 * agg.n)", 6)}
               AS p_bar,
           {dround_sql(
               "(CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               " * (CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               " + (1.0 - CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               " * (1.0 - CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))", 6)}
               AS p_e,
           CASE WHEN ((CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))
                    * (CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))
                    + (1.0 - CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))
                    * (1.0 - CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))) < 1.0
           THEN {dround_sql(
               "(CAST(agg.agree6 AS DOUBLE) / (6.0 * agg.n)"
               " - ((CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               "    * (CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               "    + (1.0 - CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               "    * (1.0 - CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))))"
               " / (1.0 - ((CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               "    * (CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               "    + (1.0 - CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))"
               "    * (1.0 - CAST(agg.votes AS DOUBLE) / (3.0 * agg.n))))",
               6)} END AS fleiss_kappa
    FROM hist, agg ORDER BY n_votes_en
    """,
)
def x231_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across THREE deterministic is-English raters
    (stopword density >= 0.30, contains 'the', mean token length <= 5.2
    chars) — the multi-rater generalization of x185's two-rater Cohen
    kappa, the statistic you report when an ensemble of cheap heuristic
    labelers disagrees: high kappa says one labeler suffices, low kappa
    says the ensemble is doing real work. With 3 raters and 2 categories
    the per-item agreement P_i collapses onto the VOTE-COUNT value
    domain (k = 0..3 votes; P_i*6 = k(k-1) + (3-k)(2-k), integer), so
    the whole statistic reduces to a 4-row histogram of exact integers;
    the three divisions are IEEE-deterministic and rounded once. The
    per-vote-count histogram rows carry kappa/P_bar/P_e as cross-joined
    audit columns. One corpus pass."""
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    r1 = (
        F.expr(
            "cast(size(filter(split(text, ' '),"
            " t -> array_contains(array('a','the','of','and','to','in'), t)))"
            " as bigint) * 5000000 div size(split(text, ' '))"
        )
        >= 300_000
    ).cast("int")
    r2 = F.array_contains(t, "the").cast("int")
    r3 = (
        F.length(F.array_join(t, "")) * 10
        <= 52 * F.size(t)
    ).cast("int")
    raters = d.select((r1 + r2 + r3).alias("k"))
    hist = raters.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    agg = hist.agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c")
            * (
                F.col("k") * (F.col("k") - 1)
                + (3 - F.col("k")) * (2 - F.col("k"))
            )
        ).alias("agree6"),
        F.sum(F.col("c") * F.col("k")).alias("votes"),
    )
    p1 = F.col("votes").cast("double") / (3.0 * F.col("n"))
    p_e = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    p_bar = F.col("agree6").cast("double") / (6.0 * F.col("n"))
    return (
        hist.crossJoin(F.broadcast(agg))
        .select(
            F.col("k").cast("long").alias("n_votes_en"),
            F.col("c").cast("long").alias("n_docs"),
            F.col("n").cast("long").alias("n"),
            dround(p_bar, 6).alias("p_bar"),
            dround(p_e, 6).alias("p_e"),
            # kappa is undefined at p_e = 1 (every rater unanimous on one
            # category corpus-wide — chance agreement saturates): NULL,
            # not a sentinel, and never a divide-by-zero under ANSI mode
            F.when(
                p_e < 1.0, dround((p_bar - p_e) / (1.0 - p_e), 6)
            ).alias("fleiss_kappa"),
        )
        .orderBy("n_votes_en")
    )


@query(
    "x232_tukey_fences",
    oracle="""
    WITH hist AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
                  FROM documents GROUP BY 1, 2),
    cum AS (SELECT source, v, c,
                   CAST(sum(c) OVER (PARTITION BY source ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM hist),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist
            GROUP BY source),
    q AS (SELECT cum.source, tot.n,
                 CAST(min(CASE WHEN cum >= (tot.n + 3) // 4 THEN v END)
                      AS BIGINT) AS q1,
                 CAST(min(CASE WHEN cum >= (3 * tot.n + 3) // 4 THEN v END)
                      AS BIGINT) AS q3
          FROM cum JOIN tot USING (source) GROUP BY 1, 2),
    f AS (SELECT source, n, q1, q3, q3 - q1 AS iqr FROM q)
    SELECT f.source, f.n, f.q1, f.q3, f.iqr,
           CAST(COALESCE(sum(CASE WHEN 2 * h.v < 2 * f.q1 - 3 * f.iqr
                         THEN h.c END), 0) AS BIGINT) AS n_out_lo,
           CAST(COALESCE(sum(CASE WHEN 2 * h.v > 2 * f.q3 + 3 * f.iqr
                         THEN h.c END), 0) AS BIGINT) AS n_out_hi,
           CAST(COALESCE(sum(CASE WHEN 2 * h.v < 2 * f.q1 - 6 * f.iqr
                         OR 2 * h.v > 2 * f.q3 + 6 * f.iqr
                         THEN h.c END), 0) AS BIGINT) AS n_extreme
    FROM f JOIN hist h USING (source)
    GROUP BY 1, 2, 3, 4, 5 ORDER BY f.source
    """,
)
def x232_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census per source on document length: Q1/Q3 by
    nearest-rank histogram selection, 1.5xIQR outlier and 3xIQR extreme
    counts — the robust companion to p27's MAD z-scores for the 'scrape
    went wrong' triage (a source whose n_extreme is nonzero has a tail
    no mean/stddev gate sees). All-integer: quartiles are value-domain
    selections (min v with cum >= nearest-rank), and the fence
    comparisons run DOUBLED (2v vs 2q1 - 3*iqr) so the .5 half-steps of
    1.5xIQR never materialize as floats. Plan: one (source, length)
    hash agg; the cumsum window is PARTITIONED by source over its value
    domain; fences broadcast back onto the histogram, never the
    corpus."""
    d = load(spark, sf_dir, "documents")
    hist = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select("source", "v", "c", F.sum("c").over(w).alias("cum"))
    tot = hist.groupBy("source").agg(F.sum("c").alias("n"))
    q = (
        cum.join(F.broadcast(tot), "source")
        .groupBy("source", "n")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 3) div 4"), F.col("v"))
            ).cast("long").alias("q1"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(3 * n + 3) div 4"), F.col("v")
                )
            ).cast("long").alias("q3"),
        )
    )
    f = q.select(
        "source", "n", "q1", "q3", (F.col("q3") - F.col("q1")).alias("iqr")
    )
    j = f.join(hist, "source")
    lo = 2 * F.col("v") < 2 * F.col("q1") - 3 * F.col("iqr")
    hi = 2 * F.col("v") > 2 * F.col("q3") + 3 * F.col("iqr")
    xlo = 2 * F.col("v") < 2 * F.col("q1") - 6 * F.col("iqr")
    xhi = 2 * F.col("v") > 2 * F.col("q3") + 6 * F.col("iqr")
    return (
        j.groupBy("source", "n", "q1", "q3", "iqr")
        .agg(
            F.coalesce(F.sum(F.when(lo, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_out_lo"),
            F.coalesce(F.sum(F.when(hi, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_out_hi"),
            F.coalesce(F.sum(F.when(xlo | xhi, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_extreme"),
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n"),
            "q1",
            "q3",
            F.col("iqr").cast("long").alias("iqr"),
            "n_out_lo",
            "n_out_hi",
            "n_extreme",
        )
        .orderBy("source")
    )


@query(
    "x233_trimmed_mean_panel",
    oracle=f"""
    WITH hist AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
                  FROM documents GROUP BY 1, 2),
    cum AS (SELECT source, v, c,
                   CAST(sum(c) OVER (PARTITION BY source ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM hist),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(CAST(c AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
                       AS sv
            FROM hist GROUP BY source),
    r AS (SELECT source, n, sv, n // 10 AS r FROM tot),
    trim AS (SELECT cum.source,
                    CAST(sum(CAST(greatest(least(cum.cum, r.n - r.r)
                         - greatest(cum.cum - cum.c, r.r), 0)
                         AS DECIMAL(38,0)) * cum.v) AS DECIMAL(38,0))
                        AS tsum
             FROM cum JOIN r USING (source) GROUP BY 1),
    bounds AS (SELECT cum.source,
                      CAST(min(CASE WHEN cum.cum >= r.r + 1 THEN cum.v END)
                           AS BIGINT) AS v_lo,
                      CAST(min(CASE WHEN cum.cum >= r.n - r.r THEN cum.v END)
                           AS BIGINT) AS v_hi
               FROM cum JOIN r USING (source) GROUP BY 1)
    SELECT r.source, r.n, r.r AS n_trimmed_each_side,
           {dround_sql("CAST(r.sv AS DOUBLE) / r.n", 6)} AS mean_raw,
           {dround_sql(
               "CAST(t.tsum AS DOUBLE) / (r.n - 2 * r.r)", 6)} AS mean_trim,
           {dround_sql(
               "CAST(t.tsum + CAST(r.r AS DECIMAL(38,0))"
               " * (b.v_lo + b.v_hi) AS DOUBLE) / r.n", 6)} AS mean_winsor
    FROM r JOIN trim t ON t.source = r.source
           JOIN bounds b ON b.source = r.source
    ORDER BY r.source
    """,
)
def x233_trimmed_mean_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed and winsorized mean of document length per source next
    to the raw mean — the robust location estimates that tell you how
    much of a source's 'average length' is tail artifact (raw >>
    trimmed = a few huge docs carry the mean; x232 counts those docs,
    this measures their pull). Exact by histogram algebra: each length
    value contributes clamp(min(cum, n-r) - max(cum_before, r), 0, c)
    occurrences to the trimmed sum (r = n/10 dropped per side), the
    winsorized sum adds r copies of the (r+1)-th and (n-r)-th order
    statistics (value-domain selections), and all sums ride
    decimal(38,0); the three means are single IEEE divisions, rounded
    once. One corpus hash-agg; everything else is the per-source value
    domain."""
    d = load(spark, sf_dir, "documents")
    hist = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select("source", "v", "c", F.sum("c").over(w).alias("cum"))
    tot = hist.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("v")).alias("sv"),
    )
    r = tot.select(
        "source", "n", "sv", (F.col("n") / 10).cast("long").alias("r")
    )
    jr = cum.join(F.broadcast(r), "source")
    contrib = F.greatest(
        F.least(F.col("cum"), F.col("n") - F.col("r"))
        - F.greatest(F.col("cum") - F.col("c"), F.col("r")),
        F.lit(0),
    )
    trim = jr.groupBy("source").agg(
        F.sum(contrib.cast("decimal(38,0)") * F.col("v")).alias("tsum")
    )
    bounds = jr.groupBy("source").agg(
        F.min(F.when(F.col("cum") >= F.col("r") + 1, F.col("v")))
        .cast("long")
        .alias("v_lo"),
        F.min(
            F.when(F.col("cum") >= F.col("n") - F.col("r"), F.col("v"))
        )
        .cast("long")
        .alias("v_hi"),
    )
    return (
        r.join(F.broadcast(trim), "source")
        .join(F.broadcast(bounds), "source")
        .select(
            "source",
            F.col("n").cast("long").alias("n"),
            F.col("r").cast("long").alias("n_trimmed_each_side"),
            dround(F.col("sv").cast("double") / F.col("n"), 6).alias(
                "mean_raw"
            ),
            dround(
                F.col("tsum").cast("double") / (F.col("n") - 2 * F.col("r")),
                6,
            ).alias("mean_trim"),
            dround(
                (
                    F.col("tsum")
                    + F.col("r").cast("decimal(38,0)")
                    * (F.col("v_lo") + F.col("v_hi"))
                ).cast("double")
                / F.col("n"),
                6,
            ).alias("mean_winsor"),
        )
        .orderBy("source")
    )


@query(
    "x234_logrank_test",
    oracle=f"""
    WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY 1),
    p AS (SELECT s.user_id, s.t0,
                 min(CASE WHEN e.event_type = 'purchase' AND e.ts >= s.t0
                          THEN e.ts END) AS tp
          FROM s JOIN events e ON e.user_id = s.user_id
          GROUP BY 1, 2),
    horizon AS (SELECT max(ts) AS tmax FROM events),
    subj AS (SELECT CASE WHEN date_diff('day', DATE '1970-01-05',
                              CAST(t0 AS DATE)) % 7 >= 5
                         THEN 1 ELSE 0 END AS g,
                    CASE WHEN tp IS NOT NULL
                         THEN date_diff('day', t0, tp)
                         ELSE date_diff('day', t0, tmax) END AS dur,
                    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS conv
             FROM p CROSS JOIN horizon),
    gh AS (SELECT g, dur, CAST(count(*) AS BIGINT) AS n_at,
                  CAST(sum(conv) AS BIGINT) AS d_ev
           FROM subj GROUP BY 1, 2),
    days AS (SELECT dur AS d,
                    CAST(sum(CASE WHEN g = 1 THEN d_ev ELSE 0 END)
                         AS BIGINT) AS d1,
                    CAST(sum(d_ev) AS BIGINT) AS d_tot
             FROM gh GROUP BY 1 HAVING sum(d_ev) > 0),
    risk AS (SELECT days.d, days.d1, days.d_tot,
                    CAST(sum(CASE WHEN gh.g = 1 THEN gh.n_at ELSE 0 END)
                         AS BIGINT) AS n1,
                    CAST(sum(gh.n_at) AS BIGINT) AS n
             FROM days JOIN gh ON gh.dur >= days.d
             GROUP BY 1, 2, 3),
    terms AS (SELECT
                  CAST(sum(d1) AS BIGINT) AS o1,
                  CAST(sum(CAST(CAST(d_tot AS DOUBLE) * n1 / n
                       AS DECIMAL(18,9))) AS DECIMAL(18,9)) AS e1,
                  CAST(sum(CASE WHEN n > 1 THEN
                       CAST(CAST(d_tot AS DOUBLE) * n1 / n
                            * (n - n1) / n * (n - d_tot) / (n - 1)
                            AS DECIMAL(18,9)) ELSE 0 END)
                       AS DECIMAL(18,9)) AS v
              FROM risk)
    SELECT o1, {dround_sql("CAST(e1 AS DOUBLE)", 6)} AS e1,
           {dround_sql("CAST(v AS DOUBLE)", 6)} AS v,
           CASE WHEN CAST(v AS DOUBLE) > 0.0 THEN {dround_sql(
               "(o1 - CAST(e1 AS DOUBLE)) * (o1 - CAST(e1 AS DOUBLE))"
               " / CAST(v AS DOUBLE)", 6)} END AS chi2
    FROM terms
    """,
)
def x234_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: do weekend-signup users convert on a different
    timetable than weekday-signup users? Completes the survival family —
    x186 draws the curve, x217 its hazard, this TESTS two curves'
    equality the censoring-correct way (comparing raw conversion rates
    throws away censored users; the log-rank compares observed vs
    expected events inside each day's risk set). Weekend-ness comes from
    days-since-Monday-epoch mod 7 (both engines' dayofweek() conventions
    differ; date arithmetic doesn't). Per-day E1/V terms are IEEE
    arithmetic on exact risk-set integers quantized to DECIMAL(18,9)
    before summation (the x217 discipline); chi2 is assembled from those
    exacts, rounded once. Plan: the x186 subject pipeline with a cohort
    bit, then everything runs on the |cohorts| x |duration days| table;
    risk sets come from a bounded days x histogram inequality join
    (<= |days|^2 rows), never a corpus rescan."""
    e = load(spark, sf_dir, "events")
    # r15 optimization (guide §2.4): the signup aggregate used to be
    # JOINED back to the event stream (an extra exchange + join) only so
    # each user's t0 sat next to their purchases. A window min over
    # user_id computes t0 in place, and the follow-up groupBy is on the
    # SAME key, so it reuses the window's partitioning — one exchange,
    # no join, identical (user_id, t0, tp) rows.
    p = (
        e.withColumn(
            "t0",
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).over(Window.partitionBy("user_id")),
        )
        .filter(F.col("t0").isNotNull())
        .groupBy("user_id", "t0")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t0")),
                    F.col("ts"),
                )
            ).alias("tp")
        )
    )
    horizon = e.agg(F.max("ts").alias("tmax"))
    subj = p.crossJoin(F.broadcast(horizon)).select(
        (
            F.datediff(F.to_date("t0"), F.lit("1970-01-05").cast("date")) % 7
            >= 5
        )
        .cast("int")
        .alias("g"),
        F.when(
            F.col("tp").isNotNull(), F.datediff(F.col("tp"), F.col("t0"))
        )
        .otherwise(F.datediff(F.col("tmax"), F.col("t0")))
        .alias("dur"),
        F.col("tp").isNotNull().cast("int").alias("conv"),
    )
    gh = subj.groupBy("g", "dur").agg(
        F.count(F.lit(1)).alias("n_at"), F.sum("conv").alias("d_ev")
    )
    days = (
        gh.groupBy(F.col("dur").alias("d"))
        .agg(
            F.sum(F.when(F.col("g") == 1, F.col("d_ev")).otherwise(0)).alias(
                "d1"
            ),
            F.sum("d_ev").alias("d_tot"),
        )
        .filter(F.col("d_tot") > 0)
    )
    risk = (
        days.join(F.broadcast(gh), gh["dur"] >= days["d"])
        .groupBy("d", "d1", "d_tot")
        .agg(
            F.sum(
                F.when(F.col("g") == 1, F.col("n_at")).otherwise(0)
            ).alias("n1"),
            F.sum("n_at").alias("n"),
        )
    )
    e1q = (
        F.col("d_tot").cast("double") * F.col("n1") / F.col("n")
    ).cast("decimal(18,9)")
    vq = F.when(
        F.col("n") > 1,
        (
            F.col("d_tot").cast("double")
            * F.col("n1")
            / F.col("n")
            * (F.col("n") - F.col("n1"))
            / F.col("n")
            * (F.col("n") - F.col("d_tot"))
            / (F.col("n") - 1)
        ).cast("decimal(18,9)"),
    ).otherwise(F.lit(0).cast("decimal(18,9)"))
    terms = risk.agg(
        F.sum("d1").alias("o1"),
        F.sum(e1q).cast("decimal(18,9)").alias("e1"),
        F.sum(vq).cast("decimal(18,9)").alias("v"),
    )
    return terms.select(
        F.col("o1").cast("long").alias("o1"),
        dround(F.col("e1").cast("double"), 6).alias("e1"),
        dround(F.col("v").cast("double"), 6).alias("v"),
        # chi2 undefined when the variance term is 0 (degenerate risk sets
        # — e.g. every conversion shares one day, or a tiny fixture): NULL
        F.when(
            F.col("v").cast("double") > 0.0,
            dround(
                (F.col("o1") - F.col("e1").cast("double"))
                * (F.col("o1") - F.col("e1").cast("double"))
                / F.col("v").cast("double"),
                6,
            ),
        ).alias("chi2"),
    )


@query(
    "x236_simpson_audit",
    oracle=f"""
    WITH sl AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_sl,
                       CAST(sum(CASE WHEN n_chars < 500 THEN 1 ELSE 0 END)
                            AS BIGINT) AS k_sl
                FROM documents GROUP BY 1, 2),
    l AS (SELECT lang, CAST(sum(n_sl) AS BIGINT) AS n_l,
                 CAST(sum(k_sl) AS BIGINT) AS k_l
          FROM sl GROUP BY lang),
    srcs AS (SELECT source, CAST(sum(n_sl) AS BIGINT) AS n_s,
                    CAST(sum(k_sl) AS BIGINT) AS k_s
             FROM sl GROUP BY source),
    tot AS (SELECT CAST(sum(n_l) AS BIGINT) AS n,
                   CAST(sum(k_l) AS BIGINT) AS k FROM l),
    adj AS (SELECT sl.source,
                   CAST(sum(sl.n_sl * 0 + l.n_l) AS BIGINT) AS w_tot,
                   {dsum_sql(
                       "CAST(l.n_l AS DOUBLE) * sl.k_sl / sl.n_sl", 9)}
                       AS adj_src_num,
                   {dsum_sql(
                       "CAST(l.n_l AS DOUBLE) * (l.k_l - sl.k_sl)"
                       " / (l.n_l - sl.n_sl)", 9)} AS adj_rest_num
            FROM sl JOIN l USING (lang)
            WHERE sl.n_sl > 0 AND l.n_l - sl.n_sl > 0
            GROUP BY sl.source)
    SELECT s.source, s.n_s, s.k_s,
           {dround_sql("CAST(s.k_s AS DOUBLE) / s.n_s", 6)} AS p_src,
           {dround_sql(
               "CAST(tot.k - s.k_s AS DOUBLE) / (tot.n - s.n_s)", 6)}
               AS p_rest,
           {dround_sql("a.adj_src_num / a.w_tot", 6)} AS p_src_adj,
           {dround_sql("a.adj_rest_num / a.w_tot", 6)} AS p_rest_adj,
           ((CAST(s.k_s AS DOUBLE) / s.n_s
             > CAST(tot.k - s.k_s AS DOUBLE) / (tot.n - s.n_s))
            <> (a.adj_src_num / a.w_tot > a.adj_rest_num / a.w_tot))
               AS simpson_reversal
    FROM srcs s JOIN adj a ON a.source = s.source CROSS JOIN tot
    ORDER BY s.source
    """,
)
def x236_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit on the per-source short-doc rate: the
    marginal comparison (source vs rest, x218's contrast) NEXT TO the
    language-standardized comparison (direct standardization: per-lang
    rates reweighted by the corpus lang mix), flagging sources whose
    association REVERSES once language is controlled — the classic trap
    when sources have skewed language mixes and 'short' correlates with
    language. Weights are the overall lang sizes restricted to strata
    where both the source and its complement have docs (renormalized by
    the same w_tot on both sides, so the comparison stays paired). All
    rates are IEEE divisions of exact integers; the weighted sums ride
    dsum; the reversal flag compares deterministic doubles. One
    (source, lang) hash agg; everything else is bounded re-aggregation."""
    d = load(spark, sf_dir, "documents")
    sl = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_sl"),
        F.sum((F.col("n_chars") < 500).cast("long")).alias("k_sl"),
    )
    l = sl.groupBy("lang").agg(
        F.sum("n_sl").alias("n_l"), F.sum("k_sl").alias("k_l")
    )
    srcs = sl.groupBy("source").agg(
        F.sum("n_sl").alias("n_s"), F.sum("k_sl").alias("k_s")
    )
    tot = l.agg(F.sum("n_l").alias("n"), F.sum("k_l").alias("k"))
    adj = (
        sl.join(F.broadcast(l), "lang")
        .filter((F.col("n_sl") > 0) & (F.col("n_l") - F.col("n_sl") > 0))
        .groupBy("source")
        .agg(
            F.sum("n_l").alias("w_tot"),
            dsum(
                F.col("n_l").cast("double") * F.col("k_sl") / F.col("n_sl"),
                9,
            ).alias("adj_src_num"),
            dsum(
                F.col("n_l").cast("double")
                * (F.col("k_l") - F.col("k_sl"))
                / (F.col("n_l") - F.col("n_sl")),
                9,
            ).alias("adj_rest_num"),
        )
    )
    p_src = F.col("k_s").cast("double") / F.col("n_s")
    p_rest = (F.col("k") - F.col("k_s")).cast("double") / (
        F.col("n") - F.col("n_s")
    )
    a_src = F.col("adj_src_num") / F.col("w_tot")
    a_rest = F.col("adj_rest_num") / F.col("w_tot")
    return (
        srcs.join(adj, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_s"),
            F.col("k_s").cast("long").alias("k_s"),
            dround(p_src, 6).alias("p_src"),
            dround(p_rest, 6).alias("p_rest"),
            dround(a_src, 6).alias("p_src_adj"),
            dround(a_rest, 6).alias("p_rest_adj"),
            ((p_src > p_rest) != (a_src > a_rest)).alias(
                "simpson_reversal"
            ),
        )
        .orderBy("source")
    )


@query(
    "x237_ols_diagnostics",
    oracle=f"""
    WITH day AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS y
                 FROM events GROUP BY 1, 2),
    t0 AS (SELECT event_type, min(day) AS d0 FROM day GROUP BY 1),
    xy AS (SELECT day.event_type,
                  CAST(date_diff('day', t0.d0, day.day) AS BIGINT) AS t,
                  day.y
           FROM day JOIN t0 USING (event_type)),
    s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(t) AS DECIMAL(38,0)) AS st,
                 CAST(sum(y) AS DECIMAL(38,0)) AS sy,
                 CAST(sum(CAST(t AS DECIMAL(38,0)) * t) AS DECIMAL(38,0))
                     AS stt,
                 CAST(sum(CAST(t AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
                     AS sty,
                 CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
                     AS syy
          FROM xy GROUP BY event_type),
    fit AS (SELECT event_type, n, st, sy, stt, sty, syy,
                   CAST(n * sty - st * sy AS DOUBLE)
                       / CAST(n * stt - st * st AS DOUBLE) AS b
            FROM s),
    ab AS (SELECT *,
                  (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE)) / n AS a
           FROM fit),
    res AS (SELECT xy.event_type,
                   xy.t,
                   xy.y - ab.a - ab.b * xy.t AS e
            FROM xy JOIN ab USING (event_type)),
    dw AS (SELECT r1.event_type,
                  {dsum_sql("(r2.e - r1.e) * (r2.e - r1.e)", 9)} AS dnum
           FROM res r1 JOIN res r2 ON r2.event_type = r1.event_type
                AND r2.t = r1.t + 1
           GROUP BY r1.event_type),
    sse AS (SELECT event_type, {dsum_sql("e * e", 9)} AS sse FROM res
            GROUP BY event_type)
    SELECT ab.event_type, ab.n,
           {dround_sql("ab.b", 6)} AS slope,
           {dround_sql("ab.a", 6)} AS intercept,
           {dround_sql(
               "CAST(ab.n * ab.sty - ab.st * ab.sy AS DOUBLE)"
               " * CAST(ab.n * ab.sty - ab.st * ab.sy AS DOUBLE)"
               " / (CAST(ab.n * ab.stt - ab.st * ab.st AS DOUBLE)"
               "    * CAST(ab.n * ab.syy - ab.sy * ab.sy AS DOUBLE))", 6)}
               AS r2,
           {dround_sql(
               "ab.b / sqrt(sse.sse / (ab.n - 2)"
               " / (CAST(ab.n * ab.stt - ab.st * ab.st AS DOUBLE) / ab.n))",
               6)} AS slope_t,
           {dround_sql("dw.dnum / sse.sse", 6)} AS durbin_watson
    FROM ab JOIN sse USING (event_type) JOIN dw USING (event_type)
    ORDER BY ab.event_type
    """,
)
def x237_ols_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression diagnostics for daily volume vs day index, per event
    type: slope/intercept PLUS the inference layer p15's point forecast
    and x179's robust slope skip — R^2 (how much trend explains), the
    slope t-statistic (is the trend significant), and Durbin-Watson on
    the residuals (is 'significant' an artifact of autocorrelated errors
    — DW << 2 says the t-stat overstates; read it with x201's ACF). All
    moment sums ride decimal(38,0); slope/intercept are IEEE on those
    exacts, so residuals are deterministic doubles whose squares/lag
    products accumulate via dsum. Plan: one corpus pass to (type, day),
    then moments, residuals and the DW lag join all on the
    |types| x |days| table."""
    e = load(spark, sf_dir, "events")
    day = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    t0 = day.groupBy("event_type").agg(F.min("day").alias("d0"))
    xy = day.join(F.broadcast(t0), "event_type").select(
        "event_type",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("t"),
        "y",
    )
    td = F.col("t").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(td).alias("st"),
        F.sum(yd).alias("sy"),
        F.sum(td * F.col("t")).alias("stt"),
        F.sum(td * F.col("y")).alias("sty"),
        F.sum(yd * F.col("y")).alias("syy"),
    )
    b = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    ab = s.select("*", b.alias("b")).select(
        "*",
        (
            (F.col("sy").cast("double") - F.col("b") * F.col("st").cast("double"))
            / F.col("n")
        ).alias("a"),
    )
    res = xy.join(F.broadcast(ab), "event_type").select(
        "event_type",
        "t",
        (F.col("y") - F.col("a") - F.col("b") * F.col("t")).alias("e"),
    )
    r2cols = res.select(
        "event_type", F.col("t").alias("t2"), F.col("e").alias("e2")
    )
    dw = (
        res.join(
            r2cols,
            (res["event_type"] == r2cols["event_type"])
            & (F.col("t2") == F.col("t") + 1),
        )
        .drop(r2cols["event_type"])
        .groupBy("event_type")
        .agg(
            dsum(
                (F.col("e2") - F.col("e")) * (F.col("e2") - F.col("e")), 9
            ).alias("dnum")
        )
    )
    sse = res.groupBy("event_type").agg(
        dsum(F.col("e") * F.col("e"), 9).alias("sse")
    )
    num = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    dent = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        ab.join(sse, "event_type")
        .join(dw, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            dround(F.col("b"), 6).alias("slope"),
            dround(F.col("a"), 6).alias("intercept"),
            dround(
                num.cast("double")
                * num.cast("double")
                / (dent.cast("double") * deny.cast("double")),
                6,
            ).alias("r2"),
            dround(
                F.col("b")
                / F.sqrt(
                    F.col("sse")
                    / (F.col("n") - 2)
                    / (dent.cast("double") / F.col("n"))
                ),
                6,
            ).alias("slope_t"),
            dround(F.col("dnum") / F.col("sse"), 6).alias("durbin_watson"),
        )
        .orderBy("event_type")
    )


@query(
    "x241_cuped_adjustment",
    oracle=f"""
    WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0,
                         max(CAST(ts AS DATE)) AS d1 FROM events),
    u AS (SELECT user_id,
                 CAST(sum(CASE WHEN date_diff('day', span.d0, CAST(ts AS DATE))
                          * 2 < date_diff('day', span.d0, span.d1)
                          THEN 1 ELSE 0 END) AS BIGINT) AS pre,
                 CAST(sum(CASE WHEN date_diff('day', span.d0, CAST(ts AS DATE))
                          * 2 >= date_diff('day', span.d0, span.d1)
                          THEN 1 ELSE 0 END) AS BIGINT) AS post
          FROM events, span GROUP BY user_id, span.d0, span.d1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(pre) AS DECIMAL(38,0)) AS sx,
                 CAST(sum(post) AS DECIMAL(38,0)) AS sy,
                 CAST(sum(CAST(pre AS DECIMAL(38,0)) * pre)
                      AS DECIMAL(38,0)) AS sxx,
                 CAST(sum(CAST(pre AS DECIMAL(38,0)) * post)
                      AS DECIMAL(38,0)) AS sxy,
                 CAST(sum(CAST(post AS DECIMAL(38,0)) * post)
                      AS DECIMAL(38,0)) AS syy
          FROM u)
    SELECT n,
           {dround_sql(
               "CAST(n * sxy - sx * sy AS DOUBLE)"
               " / CAST(n * sxx - sx * sx AS DOUBLE)", 6)} AS theta,
           {dround_sql(
               "CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n)",
               6)} AS var_post,
           {dround_sql(
               "(CAST(n * syy - sy * sy AS DOUBLE)"
               " - CAST(n * sxy - sx * sy AS DOUBLE)"
               "   * CAST(n * sxy - sx * sy AS DOUBLE)"
               "   / CAST(n * sxx - sx * sx AS DOUBLE))"
               " / (CAST(n AS DOUBLE) * n)", 6)} AS var_adjusted,
           {dround_sql(
               "CAST(n * sxy - sx * sy AS DOUBLE)"
               " * CAST(n * sxy - sx * sy AS DOUBLE)"
               " / (CAST(n * sxx - sx * sx AS DOUBLE)"
               "    * CAST(n * syy - sy * sy AS DOUBLE))", 6)}
               AS variance_reduction
    FROM s
    """,
)
def x241_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled pre-period covariate adjustment): per-user
    pre-period activity (first half of the observation span) as the
    covariate for post-period activity, theta = cov(pre,post)/var(pre),
    and the achieved variance reduction (= corr^2) — the experiment-
    platform primitive that decides how much smaller an A/B test's
    confidence intervals get before any experiment runs. Identities keep
    it exact: var_adj = var(post) - cov^2/var(pre), reduction =
    cov^2/(var(pre) var(post)), all from five decimal moment sums; the
    divisions are IEEE on exacts, rounded once. Plan: one corpus pass to
    per-user (pre, post) conditional sums (the span row broadcasts),
    one moment agg, closed form on 1 row."""
    e = load(spark, sf_dir, "events")
    span = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    es = e.crossJoin(F.broadcast(span))
    is_pre = (
        F.datediff(F.to_date("ts"), F.col("d0")) * 2
        < F.datediff(F.col("d1"), F.col("d0"))
    )
    u = es.groupBy("user_id").agg(
        F.sum(is_pre.cast("long")).alias("pre"),
        F.sum((~is_pre).cast("long")).alias("post"),
    )
    xd = F.col("pre").cast("decimal(38,0)")
    yd = F.col("post").cast("decimal(38,0)")
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * F.col("pre")).alias("sxx"),
        F.sum(xd * F.col("post")).alias("sxy"),
        F.sum(yd * F.col("post")).alias("syy"),
    )
    covn = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    varxn = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    varyn = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    nn = F.col("n").cast("double") * F.col("n")
    return s.select(
        F.col("n").cast("long").alias("n"),
        dround(covn / varxn, 6).alias("theta"),
        dround(varyn / nn, 6).alias("var_post"),
        dround((varyn - covn * covn / varxn) / nn, 6).alias("var_adjusted"),
        dround(covn * covn / (varxn * varyn), 6).alias(
            "variance_reduction"
        ),
    )


@query(
    "x242_odds_ratio_panel",
    oracle=f"""
    WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_j,
                      CAST(sum(CASE WHEN n_chars < 500 THEN 1 ELSE 0 END)
                           AS BIGINT) AS k_j
               FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_j) AS BIGINT) AS n,
                   CAST(sum(k_j) AS BIGINT) AS k FROM g),
    cells AS (SELECT g.source,
                     g.k_j AS a, g.n_j - g.k_j AS b,
                     tot.k - g.k_j AS c,
                     (tot.n - g.n_j) - (tot.k - g.k_j) AS d
              FROM g, tot)
    SELECT source, a, b, c, d,
           CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
             {dround_sql(
                 "CAST(CAST(a AS DECIMAL(38,0)) * d AS DOUBLE)"
                 " / CAST(CAST(b AS DECIMAL(38,0)) * c AS DOUBLE)", 6)}
           END AS odds_ratio,
           CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
             {dround_sql(
                 "ln(CAST(CAST(a AS DECIMAL(38,0)) * d AS DOUBLE)"
                 " / CAST(CAST(b AS DECIMAL(38,0)) * c AS DOUBLE))"
                 " - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)", 6)}
           END AS log_or_lo,
           CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
             {dround_sql(
                 "ln(CAST(CAST(a AS DECIMAL(38,0)) * d AS DOUBLE)"
                 " / CAST(CAST(b AS DECIMAL(38,0)) * c AS DOUBLE))"
                 " + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)", 6)}
           END AS log_or_hi
    FROM cells ORDER BY source
    """,
)
def x242_odds_ratio_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio of short-doc membership per source vs the rest, with the
    Woolf 95% CI on the log scale — the RATIO-scale companion to x218's
    difference-of-proportions z (an OR of 2 reads the same at 1% and 30%
    base rates, which is why dashboards comparing rare-flag slices
    report OR, not risk difference). 2x2 cells come from the same one-
    pass conditional sums; the cross products a*d / b*c ride decimal;
    OR/CI are IEEE on exacts with one ln/sqrt each, rounded once, and
    NULL when any cell is 0 (Woolf undefined — no 0.5 continuity fudge
    that would differ from textbook values). |sources| rows total."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum((F.col("n_chars") < 500).cast("long")).alias("k_j"),
    )
    tot = g.agg(F.sum("n_j").alias("n"), F.sum("k_j").alias("k"))
    cells = g.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("k_j").alias("a"),
        (F.col("n_j") - F.col("k_j")).alias("b"),
        (F.col("k") - F.col("k_j")).alias("c"),
        ((F.col("n") - F.col("n_j")) - (F.col("k") - F.col("k_j"))).alias(
            "d"
        ),
    )
    ok = (
        (F.col("a") > 0)
        & (F.col("b") > 0)
        & (F.col("c") > 0)
        & (F.col("d") > 0)
    )
    orr = (F.col("a").cast("decimal(38,0)") * F.col("d")).cast("double") / (
        F.col("b").cast("decimal(38,0)") * F.col("c")
    ).cast("double")
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return cells.select(
        "source",
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.when(ok, dround(orr, 6)).alias("odds_ratio"),
        F.when(ok, dround(F.log(orr) - 1.96 * se, 6)).alias("log_or_lo"),
        F.when(ok, dround(F.log(orr) + 1.96 * se, 6)).alias("log_or_hi"),
    ).orderBy("source")


@query(
    "x243_poisson_rate_test",
    oracle=f"""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
    g AS (SELECT event_type,
                 CAST(sum(CASE WHEN date_diff('day', DATE '1970-01-05', day)
                          % 7 >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS c_we,
                 CAST(sum(CASE WHEN date_diff('day', DATE '1970-01-05', day)
                          % 7 < 5 THEN 1 ELSE 0 END) AS BIGINT) AS c_wd
          FROM d GROUP BY event_type),
    ex AS (SELECT CAST(count(DISTINCT CASE WHEN
                       date_diff('day', DATE '1970-01-05', day) % 7 >= 5
                       THEN day END) AS BIGINT) AS e_we,
                  CAST(count(DISTINCT CASE WHEN
                       date_diff('day', DATE '1970-01-05', day) % 7 < 5
                       THEN day END) AS BIGINT) AS e_wd
           FROM d)
    SELECT g.event_type, g.c_we, g.c_wd, ex.e_we, ex.e_wd,
           {dround_sql(
               "CAST(g.c_we AS DOUBLE) / ex.e_we", 6)} AS rate_weekend,
           {dround_sql(
               "CAST(g.c_wd AS DOUBLE) / ex.e_wd", 6)} AS rate_weekday,
           {dround_sql(
               "(g.c_we - (g.c_we + g.c_wd)"
               " * (CAST(ex.e_we AS DOUBLE) / (ex.e_we + ex.e_wd)))"
               " / sqrt((g.c_we + g.c_wd)"
               " * (CAST(ex.e_we AS DOUBLE) / (ex.e_we + ex.e_wd))"
               " * (1.0 - CAST(ex.e_we AS DOUBLE) / (ex.e_we + ex.e_wd)))",
               6)} AS z
    FROM g, ex ORDER BY g.event_type
    """,
)
def x243_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-rate Poisson comparison per event type: weekend vs weekday
    DAILY RATE with exposure-corrected significance — the conditional
    (binomial) test: given C = c_we + c_wd total events, under equal
    rates c_we ~ Binomial(C, e_we/(e_we+e_wd)), so
    z = (c_we - C*p) / sqrt(C*p*(1-p)) with p the weekend share of
    exposure DAYS. This is the rate-vs-exposure question x218/x242's
    per-doc proportions can't pose (events per day, not events per
    event). Weekend-ness via days-since-Monday-epoch mod 7 (the x234
    convention). Counts and exposures are exact integers from one
    corpus pass; z is IEEE on exacts, rounded once. |types| rows."""
    e = load(spark, sf_dir, "events")
    d = e.select(F.to_date("ts").alias("day"), "event_type")
    is_we = (
        F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7 >= 5
    )
    g = d.groupBy("event_type").agg(
        F.sum(is_we.cast("long")).alias("c_we"),
        F.sum((~is_we).cast("long")).alias("c_wd"),
    )
    ex = d.agg(
        F.countDistinct(F.when(is_we, F.col("day"))).alias("e_we"),
        F.countDistinct(F.when(~is_we, F.col("day"))).alias("e_wd"),
    )
    p = F.col("e_we").cast("double") / (F.col("e_we") + F.col("e_wd"))
    c = F.col("c_we") + F.col("c_wd")
    return (
        g.crossJoin(F.broadcast(ex))
        .select(
            "event_type",
            F.col("c_we").cast("long").alias("c_we"),
            F.col("c_wd").cast("long").alias("c_wd"),
            F.col("e_we").cast("long").alias("e_we"),
            F.col("e_wd").cast("long").alias("e_wd"),
            dround(F.col("c_we").cast("double") / F.col("e_we"), 6).alias(
                "rate_weekend"
            ),
            dround(F.col("c_wd").cast("double") / F.col("e_wd"), 6).alias(
                "rate_weekday"
            ),
            dround(
                (F.col("c_we") - c * p) / F.sqrt(c * p * (1.0 - p)), 6
            ).alias("z"),
        )
        .orderBy("event_type")
    )


@query(
    "x244_sprt_conversion_drift",
    oracle=f"""
    WITH du AS (SELECT CAST(ts AS DATE) AS day, user_id,
                       max(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS conv
                FROM events GROUP BY 1, 2),
    day AS (SELECT day, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(conv) AS BIGINT) AS k
            FROM du GROUP BY day),
    llr AS (SELECT day, n, k,
                   CAST(k * ln(0.3 / 0.2)
                        + (n - k) * ln(0.7 / 0.8) AS DECIMAL(18,9)) AS q
            FROM day),
    c AS (SELECT day, n, k,
                 CAST(sum(q) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(18,9)) AS cum
          FROM llr)
    SELECT strftime(day, '%Y-%m-%d') AS day, n, k,
           {dround_sql("CAST(cum AS DOUBLE)", 6)} AS cum_llr,
           (CAST(cum AS DOUBLE) >= 2.944439) AS accept_h1,
           (CAST(cum AS DOUBLE) <= -2.944439) AS accept_h0
    FROM c ORDER BY day
    """,
)
def x244_sprt_conversion_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test on the daily conversion
    rate: cumulative log-likelihood ratio of H1 (p=0.30) vs H0 (p=0.20)
    with the standard A/B boundaries ln(19) = +-2.944 (alpha = beta =
    0.05) — the SEQUENTIAL monitor that answers 'can we stop early'
    where x205's per-day Wilson CI and x218's fixed-horizon z cannot:
    SPRT controls error rates under continuous looking. Per-day LLR
    increments are IEEE arithmetic on exact (n, k) integers quantized to
    DECIMAL(18,9) before the cumulative sum (the x217 discipline), so
    boundary crossings flag identically in both engines. Plan: one
    (day, user) hash agg, a |days|-row value-domain cumsum (audited
    global window)."""
    e = load(spark, sf_dir, "events")
    du = e.groupBy(F.to_date("ts").alias("day"), "user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("conv")
    )
    day = du.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    import math

    l1 = math.log(0.3 / 0.2)
    l0 = math.log(0.7 / 0.8)
    q = (F.col("k") * F.lit(l1) + (F.col("n") - F.col("k")) * F.lit(l0)).cast(
        "decimal(18,9)"
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = day.select(
        "day", "n", "k", F.sum(q).over(w).cast("decimal(18,9)").alias("cum")
    )
    bound = 2.944439
    return c.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        dround(F.col("cum").cast("double"), 6).alias("cum_llr"),
        (F.col("cum").cast("double") >= bound).alias("accept_h1"),
        (F.col("cum").cast("double") <= -bound).alias("accept_h0"),
    ).orderBy("day")


#: x264's z-constant and delta**2, folded ONCE in Python doubles and
#: injected into BOTH engines via repr() — DuckDB parses a bare numeric
#: literal as exact DECIMAL and folds `(1.959964+0.841621)^2` in decimal
#: arithmetic (7.848878512225), while Spark receives the Python-double
#: fold (7.848878512225001): the ulp gap fed floor(n_need)+1 and could
#: flip n_required at an integer boundary (round-12 ADVICE). A string
#: CAST is a correctly-rounded double parse in DuckDB, so both engines
#: now start from bit-identical constants.
_X264_Z2 = (1.959964 + 0.841621) * (1.959964 + 0.841621)
_X264_D2 = 0.02 * 0.02


@query(
    "x264_sample_size_planner",
    oracle=f"""
    WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_j,
                      CAST(sum(CASE WHEN n_chars < 500 THEN 1 ELSE 0 END)
                           AS BIGINT) AS k_j
               FROM documents GROUP BY source),
    c AS (SELECT source, n_j, k_j,
                 CAST(k_j AS DOUBLE) / n_j AS p1
          FROM g),
    v AS (SELECT source, n_j, k_j, p1,
                 {dround_sql(
                     f"CAST('{_X264_Z2!r}' AS DOUBLE)"
                     " * ((p1 * (1.0 - p1))"
                     " + ((p1 + CAST('0.02' AS DOUBLE))"
                     " * (1.0 - (p1 + CAST('0.02' AS DOUBLE)))))"
                     f" / CAST('{_X264_D2!r}' AS DOUBLE)", 6)} AS n_need
          FROM c)
    SELECT source, n_j, k_j,
           {dround_sql("p1", 6)} AS p_short,
           CAST(floor(n_need) AS BIGINT) + 1 AS n_required,
           (n_j >= CAST(floor(n_need) AS BIGINT) + 1) AS powered
    FROM v ORDER BY source
    """,
)
def x264_sample_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis for the per-source proportion panel: the per-arm
    sample size needed to detect a +2 pp shift in each source's
    short-doc rate at alpha = 0.05 (two-sided) / power 0.8, next to
    whether the source's CURRENT volume already clears it — the design
    half of x218/x226 (those test what happened; this says how much
    data the NEXT comparison needs, which is what an A/B on a curation
    rule gets sized with). Determinism: p1 is one exact-integer-derived
    IEEE division; the z**2 and delta**2 constants are folded ONCE in
    Python (`_X264_Z2`/`_X264_D2`) and injected into both engines —
    DuckDB would otherwise fold the same literal expressions in exact
    DECIMAL and land ulps away from Spark's double fold (round-12
    ADVICE: 7.848878512225 vs ...2225001) — and n_need is dround'd to
    6 dp in BOTH engines before floor(v) + 1, the repo's
    dround-before-discretize discipline, so an ulp can no longer flip
    n_required at an integer boundary. Plan: one conditional-sum corpus
    pass; everything after is |sources| rows."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_j"),
        F.sum((F.col("n_chars") < 500).cast("long")).cast("long").alias("k_j"),
    )
    p1 = F.col("k_j").cast("double") / F.col("n_j")
    n_need = dround(
        F.lit(_X264_Z2)
        * ((p1 * (1.0 - p1)) + ((p1 + 0.02) * (1.0 - (p1 + 0.02))))
        / F.lit(_X264_D2),
        6,
    )
    return (
        g.select(
            "source",
            "n_j",
            "k_j",
            dround(p1, 6).alias("p_short"),
            (F.floor(n_need).cast("long") + 1).alias("n_required"),
            (
                F.col("n_j") >= F.floor(n_need).cast("long") + 1
            ).alias("powered"),
        )
        .orderBy("source")
    )
