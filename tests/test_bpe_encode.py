"""BPE encode/apply (x245) exactness: the distributed min-rank encoder
== the sequential rank-order oracle == the trainer's own final
word-symbol table — the train/apply consistency triangle."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.textfns import (
    _bpe_encode_min_rank,
    bpe_encode_reference,
    bpe_encode_words,
    bpe_train,
)
from kafka_connect_spark.queries import QUERIES


def _fixture_vocab(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return [
        r["w"]
        for r in d.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .distinct()
        .collect()
    ]


def test_min_rank_equals_rank_order_oracle(spark, sf_dir):
    """Per-word: the production min-rank loop must emit exactly the
    sequential apply-rules-in-rank-order token sequence for every
    distinct word in the fixture (the freshness-guard equivalence the
    docstring argues)."""
    d = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=10)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    rank = {pair: i for i, pair in enumerate(rules)}
    words = _fixture_vocab(spark, sf_dir)
    assert len(words) > 20
    for w in words:
        assert _bpe_encode_min_rank(w, rank, "</w>") == bpe_encode_reference(
            w, rules
        ), w


def test_encode_matches_trainer_final_symbols(spark, sf_dir):
    """Train/apply consistency: encoding each word with the learned merge
    list must reproduce the trainer's OWN final word-symbol table (the
    state bpe_train returns) — BPE's defining invariant."""
    d = load(spark, sf_dir, "documents")
    merges, word_syms = bpe_train(d, num_merges=10)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    enc = {
        r["w"]: list(r["bpe_toks"])
        for r in bpe_encode_words(
            word_syms.select("w"), rules
        ).collect()
    }
    for r in word_syms.select("w", "syms").collect():
        assert enc[r["w"]] == list(r["syms"]), r["w"]


def test_tokens_reconstruct_word(spark, sf_dir):
    """Concatenating a word's BPE tokens must give back word + '</w>' —
    merges only ever join adjacent symbols, never drop or alter bytes."""
    d = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=10)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    vocab = (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    bad = (
        bpe_encode_words(vocab, rules)
        .filter(
            F.concat_ws("", "bpe_toks") != F.concat(F.col("w"), F.lit("</w>"))
        )
        .count()
    )
    assert bad == 0


def test_x245_equals_pure_python_corpus_encode(spark, sf_dir):
    """End-to-end: the x245 per-document token accounting must equal a
    single-threaded pure-Python encode of the whole fixture corpus
    (collect docs, split, rank-order-encode every occurrence, count) —
    the same sequential-oracle bar x39's trainer meets."""
    d = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=10)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    cache: dict[str, int] = {}
    want: dict = {}
    for r in d.select("doc_id", "text").collect():
        n_words = 0
        n_bpe = 0
        for w in r["text"].lower().split():
            if not w:
                continue
            n_words += 1
            if w not in cache:
                cache[w] = len(bpe_encode_reference(w, rules))
            n_bpe += cache[w]
        want[r["doc_id"]] = (
            n_words,
            n_bpe,
            (n_bpe * 1_000_000) // n_words,
        )
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_bpe_tokens"],
            r["toks_per_word_ppm"],
        )
        for r in QUERIES["x245_bpe_encode"](spark, sf_dir).collect()
    }
    assert got == want


def test_x250_equals_pure_python_audit(spark, sf_dir):
    """The per-source fertility/compression/fallback audit must equal a
    single-threaded pure-Python encode-and-count of the fixture."""
    d = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=10)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    enc_cache: dict[str, list[str]] = {}
    agg: dict[str, list[int]] = {}
    for r in d.select("source", "text").collect():
        a = agg.setdefault(r["source"], [0, 0, 0, 0])
        for w in r["text"].lower().split():
            if not w:
                continue
            if w not in enc_cache:
                enc_cache[w] = bpe_encode_reference(w, rules)
            toks = enc_cache[w]
            a[0] += 1
            a[1] += len(toks)
            a[2] += sum(
                1
                for t in toks
                if len(t[:-4] if t.endswith("</w>") else t) == 1
            )
            a[3] += len(w)
    want = {
        s: (
            v[0],
            v[1],
            (v[1] * 1_000_000) // v[0],
            (v[3] * 1_000_000) // v[1],
            (v[2] * 1_000_000) // v[1],
        )
        for s, v in agg.items()
    }
    got = {
        r["source"]: (
            r["n_words"],
            r["n_tokens"],
            r["fertility_ppm"],
            r["chars_per_token_ppm"],
            r["fallback_ppm"],
        )
        for r in QUERIES["x250_bpe_fertility_audit"](spark, sf_dir).collect()
    }
    assert got == want


def test_x262_equals_pure_python_holdout(spark, sf_dir):
    """Held-out fertility: train on even doc_ids in pure Python too
    (same rules come from the distributed trainer — the trainer equality
    is x39's own test), encode the odd half single-threaded, compare."""
    d = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(
        d.filter(F.col("doc_id") % 2 == 0), num_merges=10
    )
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    cache: dict[str, list[str]] = {}
    agg: dict[str, list[int]] = {}
    for r in d.filter(F.col("doc_id") % 2 == 1).select("lang", "text").collect():
        a = agg.setdefault(r["lang"], [0, 0, 0])
        for w in r["text"].lower().split():
            if not w:
                continue
            if w not in cache:
                cache[w] = bpe_encode_reference(w, rules)
            toks = cache[w]
            a[0] += 1
            a[1] += len(toks)
            a[2] += sum(
                1
                for t in toks
                if len(t[:-4] if t.endswith("</w>") else t) == 1
            )
    want = {
        lang: (
            v[0],
            v[1],
            (v[1] * 1_000_000) // v[0],
            (v[2] * 1_000_000) // v[1],
        )
        for lang, v in agg.items()
    }
    got = {
        r["lang"]: (
            r["n_words"],
            r["n_tokens"],
            r["fertility_ppm"],
            r["fallback_ppm"],
        )
        for r in QUERIES["x262_bpe_holdout_fertility"](spark, sf_dir).collect()
    }
    assert got == want


def test_min_rank_equals_reference_on_random_words():
    """Property leg (no Spark): the min-rank encoder equals the
    rank-order reference on adversarial random words over a tiny
    alphabet, where merge chains and overlaps are dense — the regime
    the fixture's natural text never stresses."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rules = [
        ("a", "b"),
        ("b", "a"),
        ("ab", "a"),
        ("a", "</w>"),
        ("ab", "ab"),
        ("b", "</w>"),
        ("abab", "a"),
        ("b", "b"),
        ("bb", "ab"),
    ]
    rank = {p: i for i, p in enumerate(rules)}

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(st.text(alphabet="ab", min_size=1, max_size=24))
    def check(w):
        assert _bpe_encode_min_rank(w, rank, "</w>") == bpe_encode_reference(
            w, rules
        )
        # byte preservation holds for every word too
        assert "".join(
            _bpe_encode_min_rank(w, rank, "</w>")
        ) == w + "</w>"

    check()


def test_applied_ranks_prefix_property(spark, sf_dir):
    """x266's load-bearing invariant: the rank sequence the min-rank
    encoder applies is non-decreasing, and for EVERY prefix budget V the
    token count derived from the full encode's applied ranks
    (len(w) + 1 - #{r < V}) equals actually encoding with only the
    first V rules (sequential oracle) — for every distinct fixture word
    and every x266 budget."""
    from kafka_connect_spark.functions.textfns import (
        _bpe_encode_applied_ranks,
    )
    from kafka_connect_spark.queries.text import _X266_BUDGETS

    d = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=_X266_BUDGETS[-1])
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    rank = {pair: i for i, pair in enumerate(rules)}
    words = _fixture_vocab(spark, sf_dir)
    assert len(words) > 20
    applied_any = False
    for w in words:
        ranks = _bpe_encode_applied_ranks(w, rank, "</w>")
        assert ranks == sorted(ranks), (w, ranks)
        applied_any = applied_any or bool(ranks)
        for v in _X266_BUDGETS:
            derived = len(w) + 1 - sum(1 for r in ranks if r < v)
            assert derived == len(bpe_encode_reference(w, rules[:v])), (
                w,
                v,
                ranks,
            )
    assert applied_any


def test_x266_sweep_monotone_and_anchored_to_x245(spark, sf_dir):
    """The sweep's corpus totals must be monotone non-increasing in the
    budget, and the largest-budget row re-derives from a direct
    pure-Python corpus encode at that budget."""
    from collections import Counter

    from kafka_connect_spark.queries import QUERIES
    from kafka_connect_spark.queries.text import _X266_BUDGETS

    rows = {
        r["n_rules"]: r
        for r in QUERIES["x266_bpe_vocab_sweep"](spark, sf_dir).collect()
    }
    assert sorted(rows) == _X266_BUDGETS
    for lo, hi in zip(_X266_BUDGETS, _X266_BUDGETS[1:]):
        assert rows[hi]["total_tokens"] <= rows[lo]["total_tokens"]
        assert rows[hi]["rules_used"] >= rows[lo]["rules_used"]

    d = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=_X266_BUDGETS[-1])
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    wc = Counter(
        w
        for r in d.select(F.lower("text").alias("t")).collect()
        for w in r["t"].split()
        if w
    )
    want = sum(
        cnt * len(bpe_encode_reference(w, rules)) for w, cnt in wc.items()
    )
    assert rows[_X266_BUDGETS[-1]]["total_tokens"] == want
