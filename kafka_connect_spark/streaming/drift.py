"""Streaming twins of the drift/sketch operators (x171/x178 registers,
x172 CUSUM).

Reference parity: the reference's runtime is a continuously-polling
connector (JdbcSourceTask poll loop); our batch registry computes these
statistics over a full table, and these operators compute the SAME values
incrementally over the stream, with bounded state — pinned row-for-row to
their batch twins by tests/test_streaming_drift.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.dedupfns import token_hash60

CUSUM_OUTPUT = (
    "event_type STRING, day STRING, n_events BIGINT, "
    "cusum_up BIGINT, cusum_down BIGINT, alarm_up BIGINT, alarm_down BIGINT"
)
CUSUM_STATE = "su BIGINT, sd BIGINT"


def hll_registers(df: DataFrame, scope_col: str, entity_col: str) -> DataFrame:
    """p=10 HLL registers as ONE aggregation — (scope, bucket) -> max rho.

    Works identically on a batch frame and a streaming frame: max is the
    canonical mergeable sketch update, so the streaming state is exactly
    the register table (<= 1024 BIGINTs per scope — bounded regardless of
    stream length), every microbatch folds its rows in by the same MAX,
    and the final streaming state equals the batch registers bit-for-bit.
    This is the incremental path behind x171/x178: at 100 TB the stream
    maintains registers forever and any window/union answer is a register
    merge, never a recount of entities."""
    hv = token_hash60(F.col(entity_col))
    w = F.expr("hv div 1024")
    return (
        df.select(F.col(scope_col).alias("scope"), hv.alias("hv"))
        .select(
            "scope",
            (F.col("hv") % 1024).alias("bucket"),
            F.when(w == 0, F.lit(51))
            .otherwise(F.lit(51) - F.length(F.bin(w)))
            .alias("rho"),
        )
        .groupBy("scope", "bucket")
        .agg(F.max("rho").cast("long").alias("m"))
    )


def streaming_cusum(
    day_counts: DataFrame,
    calibration: dict[str, tuple[int, int, int]],
) -> DataFrame:
    """Continuous CUSUM over a per-day count stream, the online twin of
    x172: the textbook recursion S_up = max(0, S_up + y),
    S_down = max(0, S_down - y) carried in two BIGINTs of checkpointed
    state per type — which is why CUSUM (not the z-test) is the detector
    you can actually RUN on a stream: state is O(1) and each day folds in
    once.

    ``calibration`` maps event_type -> (n_days, s, thresh2) frozen from a
    historical window (production CUSUM always runs against a calibrated
    reference; x172's batch form self-calibrates because it sees the whole
    series). With the calibration x172 derives from the same data, the
    emitted alarm rows match x172 exactly (tests pin this). Input rows
    must arrive day-ordered across microbatches, which the replay harness
    guarantees and an event-time-sorted upstream window provides in
    production."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        etype = key[0]
        n_days, s, thresh2 = calibration.get(etype, (0, 0, 0))
        su, sd = state.get if state.exists else (0, 0)
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("day")
        for _, r in rows.iterrows():
            n = int(r["n_events"])
            y = n * n_days - s
            su = max(0, su + y)
            sd = max(0, sd - y)
            au, ad = int(su * su > thresh2), int(sd * sd > thresh2)
            if au or ad:
                out.append((etype, r["day"], n, su, sd, au, ad))
        state.update((int(su), int(sd)))
        yield pd.DataFrame(
            out,
            columns=[
                "event_type", "day", "n_events",
                "cusum_up", "cusum_down", "alarm_up", "alarm_down",
            ],
        )

    return day_counts.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quantile_histogram(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """x200's shared value histogram as ONE aggregation — (group, value)
    -> (total count, md5-threshold-sampled count).

    Works identically on a batch frame and a streaming frame: counting is
    mergeable, so the streaming state IS the histogram — bounded by
    |groups| x |distinct values| (the VALUE DOMAIN), never by stream
    length — and the final streaming state equals the batch histogram
    row-for-row. Quantile answers (exact and sketch-estimated, x200's
    cumulative-selection closed form) then read this table without
    touching the stream again: the incremental path to streaming
    percentiles with no per-row state, the same contract as
    hll_registers for distinct counts."""
    thresh = 144115188075855872  # 2^60 / 8: the x177/x200 md5 clock rate
    hv = F.expr(
        f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).alias("val"),
            hv.alias("hv"),
        )
        .groupBy("grp", "val")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.when(F.col("hv") < thresh, 1).otherwise(0))
            .cast("long")
            .alias("sc"),
        )
    )


def skyline_staircase(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """x210's per-length max-vocab table as ONE aggregation — (a) ->
    max(b). MAX is the canonical mergeable update (the hll_registers
    argument), so on a stream the complete-mode state IS the staircase
    input, bounded by |distinct a| (the value domain) regardless of
    stream length, and the final streaming state equals the batch table
    row-for-row. The Pareto front then falls out of the same cumulative-
    max selection x210 runs — incremental skyline maintenance with no
    per-row state and no corpus replay."""
    return (
        df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a")
        .agg(F.max("b").cast("long").alias("mb"))
    )


EWMA_OUTPUT = (
    "event_type STRING, day STRING, c BIGINT, "
    "ewma DOUBLE, sigma DOUBLE, anomaly BOOLEAN"
)
# trailing <=30 (day-ordinal, count) pairs — bounded regardless of stream
# length; the day ordinal is days-since-epoch so weight exponents need no
# date parsing in the hot loop
EWMA_STATE = "ds ARRAY<INT>, cs ARRAY<BIGINT>"


def streaming_ewma(day_counts: DataFrame) -> DataFrame:
    """Online twin of x216's EWMA control chart: each (event_type, day,
    count) row is scored against the exponentially-weighted mean/sigma of
    its trailing 30 days (halving decay) and emitted with the same
    anomaly flag, maintaining only the trailing window as state.

    Exactness contract with the batch twin: weights are the same integer
    powers of two (2^(30-lag)), num/den/num2 are exact Python ints
    (arbitrary precision), and the final ewma/sigma go through
    float(num)/float(den) — i.e. one int->double rounding per operand
    then one IEEE division, exactly Spark's decimal(38,0)->double cast +
    divide — so emitted rows equal x216's bit-for-bit after the shared
    6-dp round (tests pin this). State is <=30 (ordinal, count) pairs per
    event_type — bounded by the WINDOW, not the stream. Input must
    arrive day-ordered per key across microbatches (replay harness
    guarantees; an event-time-sorted upstream window provides it in
    production).

    ``day_counts`` needs columns event_type, day ('yyyy-MM-dd'), c.
    """
    from datetime import date

    import math

    def _dr6(x: float) -> float:
        # scalar twin of functions.rounding.dround (floor(x*1e6+0.5)/1e6):
        # Python round() is half-even and would diverge on boundaries
        if not math.isfinite(x) or abs(x) >= 2.0**52 / 1e6:
            return x
        return math.floor(x * 1e6 + 0.5) / 1e6

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        etype = key[0]
        ds, cs = ([], []) if not state.exists else (
            list(state.get[0]), list(state.get[1])
        )
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("day")
        for _, r in rows.iterrows():
            # ordinal comes from the date PREFIX so finer-grained period
            # strings ('yyyy-MM-dd HH') still evict on the 30-DAY horizon
            y, m, dd_ = map(int, r["day"][:10].split("-"))
            ordinal = date(y, m, dd_).toordinal()
            c = int(r["c"])
            num = den = num2 = 0
            for o, cc in zip(ds, cs):
                lag = ordinal - o
                if 1 <= lag <= 30:
                    w = 1 << (30 - lag)
                    den += w
                    num += cc * w
                    num2 += cc * cc * w
            if den > 0:
                ewma = float(num) / float(den)
                var = float(num2) / float(den) - ewma * ewma
                sigma = max(var, 0.0) ** 0.5
                out.append(
                    (
                        etype,
                        r["day"],
                        c,
                        _dr6(ewma),
                        _dr6(sigma),
                        abs(c - ewma) > 2.0 * sigma,
                    )
                )
            ds.append(ordinal)
            cs.append(c)
            # evict everything older than the 30-day horizon of the NEWEST
            # day — the state bound
            cut = ordinal - 30
            while ds and ds[0] < cut:
                ds.pop(0)
                cs.pop(0)
        state.update((ds, cs))
        yield pd.DataFrame(
            out,
            columns=["event_type", "day", "c", "ewma", "sigma", "anomaly"],
        )

    return day_counts.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def brier_bins(df: DataFrame) -> DataFrame:
    """x227's forecast-bin table as ONE aggregation — bin -> (n_k, y_k,
    p_k sums).

    Works identically on a batch frame and a streaming frame: counting
    and integer sums are mergeable, so the streaming state IS the
    10-row bin table (bounded by the bin domain, never stream length)
    and the complete-mode result equals the batch bins row-for-row. The
    Murphy reliability/resolution/uncertainty decomposition (x227) is
    closed-form arithmetic over this table, so a live calibration
    dashboard reads 10 rows per refresh and never rescans the stream —
    the same contract as hll_registers (distinct counts) and
    quantile_histogram (percentiles).

    ``df`` needs columns y (0/1 outcome) and p (forecast, ppm integer).
    """
    return (
        df.groupBy(
            F.least(F.floor(F.col("p") / 100001), F.lit(9)).alias("b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_k"),
            F.sum("y").cast("long").alias("y_k"),
            F.sum("p").cast("long").alias("p_k"),
        )
    )


def score_label_counts(df: DataFrame) -> DataFrame:
    """The shared sufficient statistic behind the x187 AUC and x194 gain
    chart: the (score value, label) count table.

    Counting is mergeable, so this is ONE streaming aggregation whose
    complete-mode state is the table itself — bounded by 2 x |score
    domain| (<= 2e6+2 rows for a ppm-integer score), never the stream
    length. Both online-eval curves (:func:`auc_from_counts`,
    :func:`gain_chart_from_counts`) are closed-form arithmetic over this
    table, so a live eval dashboard reads the value-domain table per
    refresh and never rescans the stream — the brier_bins/hll_registers
    contract applied to the two curves a training-data pipeline monitors
    most.

    ``df`` needs columns y (0/1 label) and p (score, ppm integer).
    """
    return df.groupBy("p", "y").agg(F.count(F.lit(1)).cast("long").alias("c"))


def auc_from_counts(counts: DataFrame) -> DataFrame:
    """x187's exact Mann-Whitney midrank AUC derived from the
    :func:`score_label_counts` table — the identical count-of-counts
    closed form (doubled midrank of a value group = 2*cum_before + count
    + 1), so the emitted single row equals the batch x187 row bit-for-bit
    on the same data. The only ordered window runs over the score value
    domain (<= 1e6+1 rows by construction)."""
    from pyspark.sql import Window

    cc = counts.groupBy("p").agg(
        F.sum("c").alias("c"), F.sum(F.col("c") * F.col("y")).alias("pos")
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


def gain_chart_from_counts(counts: DataFrame) -> DataFrame:
    """x194's cumulative gains / lift chart derived from the
    :func:`score_label_counts` table.

    Works because x194's decile order is (p DESC, y, doc_id): every
    (p, y) group is homogeneous in the label, so a decile boundary that
    splits a group splits it into rows with KNOWN label composition —
    the chart is a pure function of the count table (the negatives-first
    tie convention; see x194's docstring). Derivation: order the <=
    2 x |score domain| groups, give each its global rank interval
    [s, s+c) via one value-domain cumsum, intersect with the 10 exact
    ntile intervals (first n mod 10 tiles get the extra row — window
    NTILE semantics), and aggregate overlaps. The batch x194 row set
    equals this on the same data (tests pin it)."""
    from pyspark.sql import Window

    wcum = Window.orderBy(F.col("p").desc(), F.col("y")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    g = counts.select(
        "p",
        "y",
        "c",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("s"),
    )
    tot = counts.agg(F.sum("c").cast("long").alias("n_tot"))
    dec = tot.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"), "n_tot"
    ).select(
        "decile",
        (
            (F.col("decile") - 1) * F.expr("n_tot div 10")
            + F.least(F.col("decile") - 1, F.col("n_tot") % 10)
        ).alias("lo"),
        (
            F.col("decile") * F.expr("n_tot div 10")
            + F.least(F.col("decile"), F.col("n_tot") % 10)
        ).alias("hi"),
    )
    ov = (
        g.crossJoin(F.broadcast(dec))
        .filter((F.col("s") < F.col("hi")) & (F.col("s") + F.col("c") > F.col("lo")))
        .select(
            "decile",
            "y",
            (
                F.least(F.col("s") + F.col("c"), F.col("hi"))
                - F.greatest(F.col("s"), F.col("lo"))
            ).alias("k"),
        )
    )
    byd = ov.groupBy("decile").agg(
        F.sum("k").alias("n"), F.sum(F.col("k") * F.col("y")).alias("npos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = byd.select(
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


def source_lang_counts(df: DataFrame) -> DataFrame:
    """The x249 raking sufficient statistic as ONE mergeable aggregation
    — the (source, lang) cell-count table. Complete-mode state is the
    cell table itself (|sources| x |langs| rows, never stream length);
    applying queries.quality.ipf_rake to the emitted table gives a LIVE
    mixture monitor: the raking weights the pipeline would need RIGHT
    NOW to hit balanced marginals, updated per microbatch — pinned
    row-exact to the batch x249 in tests/test_streaming_r11_twins.py."""
    return df.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def operating_point_from_counts(counts: DataFrame) -> DataFrame:
    """x263's Youden/F1 threshold pick derived from the
    :func:`score_label_counts` table — with this, the ENTIRE eval family
    (AUC, gain chart, operating point) refreshes from one complete-mode
    value-domain aggregation: a live dashboard re-picks the deployed
    cutoff every microbatch without rescanning the stream. Same integer
    cross-multiply argmax keys as the batch query; pinned row-exact in
    tests/test_streaming_r11_twins.py."""
    from pyspark.sql import Window

    cc = counts.groupBy("p").agg(
        F.sum("c").alias("c"), F.sum(F.col("c") * F.col("y")).alias("pos")
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


def decontamination_counts(docs: DataFrame, eval_grams: list[str]) -> DataFrame:
    """x269's per-source decontamination census as ONE streaming
    aggregation — the live monitor that watches eval contamination as a
    crawl lands, instead of discovering it at training-set freeze.

    Each arriving doc's distinct 5-grams intersect the eval gram set
    IN-ROW (``array_intersect`` against the fixed gram array), so the
    per-doc hit count never needs a second stateful operator; the one
    groupBy(source) agg then carries (n_docs, n_contaminated,
    gram_hits) — state bounded by |sources|, never stream length —
    and :func:`decontamination_table` derives x269's published rows
    (ppm included) from the state per refresh. Scale note: the in-row
    gram set is right up to ~1e4 grams (a broadcast-sized eval suite);
    past that the production shape is the x269 batch plan run
    incrementally — bucketed broadcast join per microbatch — with this
    same per-source additive state.

    ``docs`` needs columns source, text."""
    # r15: word_ngrams (per-row zip_with chain) — the SQL-string transform
    # re-split the text per gram element (guide §4.1); identical strings
    from ..functions.textfns import word_ngrams

    grams5 = F.array_distinct(word_ngrams("text", 5))
    ev = F.array(*[F.lit(g) for g in eval_grams])
    hits = F.size(F.array_intersect(grams5, ev)).cast("long")
    return (
        docs.select("source", hits.alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("h") > 0).cast("long"))
            .cast("long")
            .alias("n_contaminated"),
            F.sum("h").cast("long").alias("gram_hits"),
        )
    )


def decontamination_table(state: DataFrame) -> DataFrame:
    """x269's published per-source rows derived from the
    :func:`decontamination_counts` state — the ppm is the only
    non-state column, integer `div` exactly as the batch query."""
    return state.select(
        "source",
        "n_docs",
        "n_contaminated",
        F.expr(
            "cast(n_contaminated * 1000000 div n_docs as bigint)"
        ).alias("contaminated_ppm"),
        "gram_hits",
    ).orderBy("source")


def block_keeper_state(docs: DataFrame) -> DataFrame:
    """x272's segment-level keep-first dedup maintained LIVE: the
    complete-mode state is one row per DISTINCT 20-token block — (h,
    keep_clock, keep_source, n_tok) — with the keeper re-elected by
    ``min/min_by`` on the encoded (doc_id, block_idx) clock as blocks
    arrive, so replay order cannot change the final state (min is
    order-free). This is the streaming half of exact segment dedup: the
    state IS the dedup decision, and grows with distinct content (the
    x37 exact-dedup bound — inherent to the semantics, not a leak; a
    production deployment shards this state by h, which is uniform by
    construction).

    Segmentation is shared verbatim with the batch query via
    :func:`~kafka_connect_spark.functions.dedupfns.segment_blocks`.
    ``docs`` needs columns doc_id, source, text."""
    from ..functions.dedupfns import segment_blocks

    return segment_blocks(docs).groupBy("h").agg(
        F.min("clock").alias("keep_clock"),
        F.min_by("source", "clock").alias("keep_source"),
        F.min("n_tok").alias("n_tok"),  # equal across instances of h
    )


def segment_keeper_table(state: DataFrame) -> DataFrame:
    """The per-source KEPT mass derived from the
    :func:`block_keeper_state` rows — pinned in tests to exactly
    x272's (n_blocks - dup_blocks, tokens_total - tokens_dropped):
    the batch prune plan and the live state agree on every keeper."""
    return (
        state.groupBy(F.col("keep_source").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_blocks"),
            F.sum("n_tok").cast("long").alias("kept_tokens"),
        )
        .orderBy("source")
    )


def block_source_state(docs: DataFrame) -> DataFrame:
    """x276's segment-sharing provenance maintained LIVE: the
    complete-mode state is one row per DISTINCT 20-token block holding
    the sorted SET of sources it has appeared in — a set-valued
    companion to :func:`block_keeper_state` over the same
    ``segment_blocks`` segmentation (shared verbatim, so batch and
    stream can never disagree on a block boundary). Set union is
    order-free, so replay order cannot change the final state; the set
    is bounded by |sources|, the row count by distinct content (the
    x37 exact-dedup bound, inherent to the semantics).

    ``docs`` needs columns doc_id, source, text."""
    from ..functions.dedupfns import segment_blocks

    return (
        segment_blocks(docs)
        .groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
    )


def share_matrix_table(state: DataFrame) -> DataFrame:
    """x276's published pair matrix derived from the
    :func:`block_source_state` rows — per-source totals come from
    exploding the source sets (a state-only pass, no corpus rescan),
    pairs from the same in-row fan-out as the batch query (x167's
    idiom, <= |sources| choose 2 per block)."""
    tot = (
        state.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    pairs = (
        state.filter(F.size("ss") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(ss) - 2),"
                    " i -> transform(sequence(i + 1, size(ss) - 1),"
                    " j -> named_struct('a', ss[i], 'b', ss[j]))))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
    )
    c = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("shared_blocks")
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        c.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_blocks",
            F.expr(
                "cast(shared_blocks * 1000000 div least(n_a, n_b)"
                " as bigint)"
            ).alias("overlap_ppm"),
        )
        .orderBy("source_a", "source_b")
    )
