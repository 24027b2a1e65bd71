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
               "CAST(r2_j * r2_j AS DOUBLE) / n_j", 6)} AS s4
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
            (F.col("r2_j") * F.col("r2_j")).cast("double") / F.col("n_j"), 6
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
    e = load(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = day.select(
        "event_type", F.col("day").alias("day_a"), F.col("c").alias("ca")
    )
    dd = F.datediff(F.col("day"), F.col("day_a"))
    # pow(2, k) is exact in IEEE double for integer k <= 53, so the cast to
    # decimal loses nothing and the weights are true integers
    w = F.pow(F.lit(2.0), (30 - dd).cast("double")).cast("decimal(38,0)")
    hist = (
        day.join(a, "event_type")
        .filter(dd.between(1, 30))
        .groupBy("event_type", "day", "c")
        .agg(
            F.sum(w.cast("decimal(38,0)")).alias("den"),
            F.sum(F.col("ca").cast("decimal(38,0)") * w).alias("num"),
            F.sum(
                F.col("ca").cast("decimal(38,0)") * F.col("ca") * w
            ).alias("num2"),
        )
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
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        e.join(s, "user_id")
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
            "CAST((g.s1 * tot.n - tot.s_all * g.n_j)"
            " * (g.s1 * tot.n - tot.s_all * g.n_j) AS DOUBLE) / g.n_j",
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
    d = load(spark, sf_dir, "documents")
    med = d.groupBy("source").agg(
        (2 * F.expr("percentile(n_chars, 0.5)")).cast("long").alias("med2")
    )
    z = d.join(F.broadcast(med), "source").select(
        "source", F.abs(2 * F.col("n_chars") - F.col("med2")).alias("z2")
    )
    g = z.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum(F.col("z2").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("z2").cast("decimal(38,0)") * F.col("z2")).alias("s2"),
    )
    tot = g.agg(
        F.sum("n_j").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s1").alias("s_all"),
    )
    gt = g.crossJoin(F.broadcast(tot))
    ssb_num = F.col("s1") * F.col("n") - F.col("s_all") * F.col("n_j")
    terms = gt.groupBy("n").agg(
        dsum((ssb_num * ssb_num).cast("double") / F.col("n_j"), 6).alias(
            "ssb_n2"
        ),
        dsum(
            (F.col("s2") * F.col("n_j") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / F.col("n_j"),
            6,
        ).alias("ssw"),
    ).drop("n")
    return (
        g.join(F.broadcast(med), "source")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(terms))
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
