"""Round-7 fifth wave (x167-x171): engine-independent refolds.

The DuckDB oracles prove Spark<->DuckDB parity; these tests prove the
SPEC is what the docstrings claim, by recomputing each result with plain
Python/pandas folds that share no code with either engine."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.dedupfns import ngram_jaccard_pairs
from kafka_connect_spark.queries.dedup import x168_dup_graph_pagerank
from kafka_connect_spark.queries.metrics import x169_daily_anomaly_flags
from kafka_connect_spark.queries.quality import x171_hll_distinct_calibration
from kafka_connect_spark.queries.relational import x167_copurchase_lift


def test_x168_matches_pure_python_integer_pagerank(spark, sf_dir):
    """3 iterations of the integer update rule folded in Python dicts
    must equal the distributed query row-for-row — same discipline as the
    x166 product-rule test."""
    d = load(spark, sf_dir, "documents")
    pairs = [
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(d, n=3, threshold=0.5).collect()
    ]
    assert pairs, "fixture should contain near-dup edges"
    nbrs: dict[int, list[int]] = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    pr = {v: 10**12 for v in nbrs}
    for _ in range(3):
        contrib = {v: pr[v] // len(nbrs[v]) for v in nbrs}
        nxt = {}
        for v in nbrs:
            s = sum(contrib[u] for u in nbrs[v])
            nxt[v] = 150_000_000_000 + (85 * s) // 100
        pr = nxt
    got = {r["doc_id"]: (r["deg"], r["pagerank_e12"])
           for r in x168_dup_graph_pagerank(spark, sf_dir).collect()}
    assert set(got) == set(nbrs)
    for v in nbrs:
        assert got[v] == (len(nbrs[v]), pr[v]), v


def test_x167_lift_recomputed_from_baskets(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = defaultdict(set)
    for r in li.collect():
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    n_orders = len(baskets)
    part_ct: dict[int, int] = defaultdict(int)
    pair_ct: dict[tuple[int, int], int] = defaultdict(int)
    for ps in baskets.values():
        s = sorted(ps)
        for p in s:
            part_ct[p] += 1
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pair_ct[(a, b)] += 1
    for r in x167_copurchase_lift(spark, sf_dir).collect():
        a, b = r["part_a"], r["part_b"]
        assert pair_ct[(a, b)] == r["n_both"] >= 2
        assert part_ct[a] == r["n_a"] and part_ct[b] == r["n_b"]
        want = r["n_both"] * n_orders * 1_000_000 // (r["n_a"] * r["n_b"])
        assert want == r["lift_ppm"]


def test_x169_flags_are_exactly_the_2_sigma_days(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    counts: dict[tuple[str, str], int] = defaultdict(int)
    for r in e.collect():
        counts[(r["event_type"], r["day"])] += 1
    per_type = defaultdict(list)
    for (t, day), n in counts.items():
        per_type[t].append((day, n))
    want = set()
    for t, days in per_type.items():
        n_days = len(days)
        s = sum(n for _, n in days)
        ss = sum(n * n for _, n in days)
        for day, n in days:
            if (n * n_days - s) ** 2 > 4 * (n_days * ss - s * s):
                want.add((t, day, n))
    got = {
        (r["event_type"], r["day"], r["n_events"])
        for r in x169_daily_anomaly_flags(spark, sf_dir).collect()
    }
    assert got == want and want


def test_x171_hll_error_within_sketch_tolerance(spark, sf_dir):
    """m=1024 HLL has ~3.25% relative standard error; anything past 15%
    means the estimator (bucketing, rho, harmonic mean, LC branch) broke."""
    rows = x171_hll_distinct_calibration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["err_ppm"] < 150_000, r
        # the two branches partition correctly: LC only fires with empties
        if r["empty_buckets"] == 0:
            assert r["hll_estimate"] > 2560


def test_x172_cusum_closed_form_equals_recursion(spark, sf_dir):
    """The windowed closed form S_t = C_t - min(0, min C_j) must equal the
    textbook max(0, S+y) recursion, per type, both directions."""
    from kafka_connect_spark.queries.metrics import x172_cusum_changepoint

    e = load(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    counts: dict[tuple[str, str], int] = defaultdict(int)
    for r in e.collect():
        counts[(r["event_type"], r["day"])] += 1
    per_type = defaultdict(list)
    for (t, day), n in counts.items():
        per_type[t].append((day, n))
    want = {}
    for t, days in per_type.items():
        days.sort()
        n_days = len(days)
        s = sum(n for _, n in days)
        ss = sum(n * n for _, n in days)
        thresh2 = 16 * (n_days * ss - s * s)
        su = sd = 0
        for day, n in days:
            y = n * n_days - s
            su = max(0, su + y)  # textbook recursion
            sd = max(0, sd - y)
            if su * su > thresh2 or sd * sd > thresh2:
                want[(t, day)] = (
                    n, su, sd, int(su * su > thresh2), int(sd * sd > thresh2)
                )
    got = {
        (r["event_type"], r["day"]): (
            r["n_events"], r["cusum_up"], r["cusum_down"],
            r["alarm_up"], r["alarm_down"],
        )
        for r in x172_cusum_changepoint(spark, sf_dir).collect()
    }
    assert got == want


def test_x175_transition_rows_sum_to_one(spark, sf_dir):
    from kafka_connect_spark.queries.metrics import x175_event_transition_matrix

    rows = x175_event_transition_matrix(spark, sf_dir).collect()
    assert rows
    by_cur = defaultdict(list)
    for r in rows:
        by_cur[r["cur"]].append(r)
    for cur, rs in by_cur.items():
        n_cur = rs[0]["n_cur"]
        assert sum(r["n"] for r in rs) == n_cur
        # floored ppm rows sum to 1e6 within |row| ulps
        assert 1_000_000 - len(rs) <= sum(r["p_ppm"] for r in rs) <= 1_000_000


def test_x174_ks_matches_scipy_style_fold(spark, sf_dir):
    from kafka_connect_spark.queries.text import x174_ks_length_distance

    d = load(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    a = sorted(r["n_chars"] for r in d if r["lang"] == "en")
    b = sorted(r["n_chars"] for r in d if r["lang"] != "en")
    na, nb = len(a), len(b)
    xs = sorted(set(a) | set(b))
    import bisect

    dmax = max(
        abs(bisect.bisect_right(a, x) * nb - bisect.bisect_right(b, x) * na)
        for x in xs
    )
    row = x174_ks_length_distance(spark, sf_dir).collect()[0]
    assert (row["na"], row["nb"]) == (na, nb)
    assert row["ks_ppm"] == dmax * 1_000_000 // (na * nb)


def test_x176_gini_bounds_and_fold(spark, sf_dir):
    from kafka_connect_spark.queries.text import x176_token_gini

    d = load(spark, sf_dir, "documents").select("text").collect()
    freq: dict[str, int] = defaultdict(int)
    for r in d:
        for t in r["text"].split(" "):
            freq[t] += 1
    ranked = sorted(freq.items(), key=lambda kv: (kv[1], kv[0]))
    v = len(ranked)
    n = sum(freq.values())
    swf = sum((i + 1) * f for i, (_, f) in enumerate(ranked))
    want = (2 * swf - (v + 1) * n) * 1_000_000 // (v * n)
    row = x176_token_gini(spark, sf_dir).collect()[0]
    assert (row["vocab"], row["n_tokens"], row["gini_ppm"]) == (v, n, want)
    assert 0 <= row["gini_ppm"] < 1_000_000


def test_x177_weighted_sample_is_biased_toward_weight_and_deterministic(spark, sf_dir):
    from kafka_connect_spark.queries.quality import x177_weighted_sample

    got1 = x177_weighted_sample(spark, sf_dir).collect()
    got2 = x177_weighted_sample(spark, sf_dir).collect()
    assert [r.asDict() for r in got1] == [r.asDict() for r in got2]
    assert len(got1) == 20
    corpus_mean = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r["n_chars"] for r in got1) / len(got1)
    # A-ES with weight=n_chars must oversample long docs
    assert sample_mean > corpus_mean


def test_x178_windowed_hll_within_tolerance(spark, sf_dir):
    from kafka_connect_spark.queries.quality import x178_windowed_hll_users

    rows = x178_windowed_hll_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["err_ppm"] < 150_000, r


def test_x179_theil_sen_matches_python_fold(spark, sf_dir):
    from kafka_connect_spark.queries.metrics import x179_theil_sen_trend

    e = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    counts: dict[str, int] = defaultdict(int)
    for r in e.collect():
        counts[r["day"]] += 1
    days = [n for _, n in sorted(counts.items())]
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            num = (days[j] - days[i]) * 1_000_000
            slopes.append(num // (j - i))  # python // IS floor division
    slopes.sort()
    np_ = len(slopes)
    row = x179_theil_sen_trend(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == np_
    assert row["theil_sen_slope_ppm"] == slopes[(np_ + 1) // 2 - 1]
    assert row["upper_median_ppm"] == slopes[np_ // 2]
