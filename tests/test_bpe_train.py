"""BPE merge learning (x39): the distributed trainer must reproduce the
reference sequential algorithm exactly — same merges, same order, same
counts — since the argmax-per-round recursion leaves no room for
approximation. The reference implementation below is the standard
sequential BPE (word-frequency table, greedy left-to-right pair merge,
lexicographic tie-break), ~25 lines of pure Python."""

from __future__ import annotations

from collections import Counter

import duckdb

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.textfns import bpe_train


def _reference_bpe(texts: list[str], num_merges: int, min_freq: int = 2):
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    vocab = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for w, freq in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        # max count, ties broken lexicographically (smallest pair wins)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_freq:
            break
        merges.append((rank, left, right, left + right, cnt))
        for w in vocab:
            syms = vocab[w]
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_train_matches_reference_on_fixture(spark, sf_dir):
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    expected = _reference_bpe(texts, num_merges=10)

    d = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=10)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["cnt"])
        for r in merges.orderBy("rank").collect()
    ]
    assert got == expected
    assert len(got) == 10  # fixture corpus is rich enough for all rounds


def test_bpe_train_classic_example(spark):
    """Sennrich et al.'s worked example: 'es' -> 'est' -> 'est</w>' first."""
    df = spark.createDataFrame(
        [
            (
                "low low low low low lower lower newest newest newest "
                "newest newest newest widest widest widest",
            )
        ],
        ["text"],
    )
    merges, words = bpe_train(df, num_merges=3)
    got = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    assert got == [("e", "s"), ("es", "t"), ("est", "</w>")]
    # the learned merges actually contracted the word symbol tables
    syms = {r["w"]: r["syms"] for r in words.collect()}
    assert syms["newest"][-1] == "est</w>"


def test_bpe_merge_is_greedy_left_to_right(spark):
    """'aaaa' under merge (a,a) must become ['aa','aa'] (non-overlapping)."""
    df = spark.createDataFrame([("aa aa aaaa",)], ["text"])
    merges, words = bpe_train(df, num_merges=1, min_freq=1)
    [(rank, left, right, merged, cnt)] = [
        (r["rank"], r["left"], r["right"], r["merged"], r["cnt"])
        for r in merges.collect()
    ]
    assert (left, right) == ("a", "a")
    syms = {r["w"]: r["syms"] for r in words.collect()}
    assert syms["aaaa"] == ["aa", "aa", "</w>"]


def test_bpe_train_batched_equals_sequential_on_fixture(spark, sf_dir):
    """The batched trainer (batch_merges>1) reproduces the sequential
    merge table exactly — order, pairs, counts — while using fewer
    driver rounds (the prefix/non-interaction/strict-boundary selection
    is exactness-preserving by construction)."""
    d = load(spark, sf_dir, "documents")
    s_stats, b_stats = {}, {}
    m_seq, _ = bpe_train(d, num_merges=25, batch_merges=1, stats=s_stats)
    m_bat, _ = bpe_train(d, num_merges=25, batch_merges=16, stats=b_stats)
    seq = [tuple(r) for r in m_seq.orderBy("rank").collect()]
    bat = [tuple(r) for r in m_bat.orderBy("rank").collect()]
    assert seq == bat
    assert b_stats["rounds"] < s_stats["rounds"]


def test_bpe_train_batched_rounds_collapse_on_dispersed_corpus(spark):
    """On a dispersed-alphabet corpus (single-symbol words, no adjacency
    chaining — the CJK-like shape) the exact batch fills completely:
    32 merges land in ~10x fewer driver rounds than sequential, with the
    identical merge table."""
    chars = [chr(0x3041 + i) for i in range(40)]
    text = " ".join(
        " ".join([c] * (500 - 7 * i)) for i, c in enumerate(chars)
    )
    df = spark.createDataFrame([(text,)], ["text"])
    s_stats, b_stats = {}, {}
    m_seq, _ = bpe_train(
        df, num_merges=32, min_freq=1, batch_merges=1, stats=s_stats
    )
    m_bat, _ = bpe_train(
        df, num_merges=32, min_freq=1, batch_merges=32, stats=b_stats
    )
    seq = [tuple(r) for r in m_seq.orderBy("rank").collect()]
    bat = [tuple(r) for r in m_bat.orderBy("rank").collect()]
    assert seq == bat
    assert len(seq) == 32
    assert s_stats["rounds"] >= 32
    assert b_stats["rounds"] * 10 <= s_stats["rounds"]
