"""Text-analysis column functions (SURVEY.md §2.6 X14 + training-data
pipeline ops): tokenization, quality scoring, language-ID heuristic,
document fingerprinting.

All pure JVM-side expressions (split / higher-order array functions) — no
Python UDF in the hot path, so these stay inside whole-stage codegen and
scale linearly with input splits."""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import dround

# Marker stopword sets for the language-ID heuristic. Deterministic and
# mirrored verbatim in the DuckDB oracle SQL (queries/text.py).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "los", "que", "y", "es", "una"],
    "fr": ["le", "les", "et", "des", "une", "est"],
}

STOPWORDS = ["a", "the", "of", "and", "to", "in"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (matches DuckDB string_split(text, ' '))."""
    return F.split(text if isinstance(text, Column) else F.col(text), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def word_ngrams(text: Column | str, n: int, sep: str = " ") -> Column:
    """Array of overlapping word n-grams (positions 1..L-n+1; ``[]`` for
    texts shorter than n tokens) — the shared gram builder for the
    text/dedup families.

    r15 optimization (guide §4.1): the previous idiom,
    ``transform(sequence(..), i -> concat_ws(sep, slice(toks, i, n)))``,
    re-evaluated ``toks`` — the full split of the text — for EVERY
    element: a non-argument subexpression inside a higher-order-function
    lambda is interpreted per element with no common-subexpression reuse,
    so an L-token doc paid L full splits (measured: x14j 9.9s -> 1.7s at
    sf0.1 from this fix alone). This builder references ``toks`` only in
    per-ROW positions (zip_with/slice collection arguments); the lambdas
    touch nothing but their own arguments. Output strings are identical
    to the concat_ws form: split() yields no NULL tokens, and zip_with's
    null tail padding is sliced off before anything reads it."""
    toks = tokens(text)
    size = F.size(toks)
    cur = toks
    for j in range(1, n):
        cur = F.zip_with(
            cur,
            F.slice(toks, j + 1, size - j),
            lambda x, y: F.concat(x, F.lit(sep), y),
        )
    grams = F.slice(cur, 1, size - (n - 1)) if n > 1 else cur
    return F.when(size >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def _stopword_ratio_raw(toks: Column) -> Column:
    return _hits(toks, STOPWORDS) / F.size(toks)


def _punct_ratio_raw(t: Column) -> Column:
    return F.length(F.regexp_replace(t, "[^.,!?;:]", "")) / F.length(t)


def stopword_ratio(text: Column | str) -> Column:
    return dround(_stopword_ratio_raw(tokens(text)), 6)


def punct_ratio(text: Column | str) -> Column:
    t = text if isinstance(text, Column) else F.col(text)
    return dround(_punct_ratio_raw(t), 6)


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: long-enough docs with a healthy
    stopword ratio and low punctuation density score high. Single final
    round (4 dp) over unrounded ratios — nesting rounds amplifies
    engine-level ulp differences and breaks cross-engine hash checks."""
    t = text if isinstance(text, Column) else F.col(text)
    n = token_count(t)
    len_score = F.least(n, F.lit(100)) / 100.0
    stop_score = F.least(_stopword_ratio_raw(tokens(t)) * 5, F.lit(1.0))
    punct_pen = _punct_ratio_raw(t)
    return dround((len_score + stop_score) / 2.0 - punct_pen, 4)


def lang_id(text: Column | str) -> Column:
    """n-gram/stopword language-ID heuristic: count marker-token hits per
    language; argmax in fixed (en, de, es, fr) priority order; no hits =>
    'und'. (A real pipeline swaps in fastText/CLD3 via a pandas UDF — the
    operator contract is the same column-in/column-out.)"""
    toks = tokens(text)
    hits = {lang: _hits(toks, words) for lang, words in LANG_MARKERS.items()}
    en, de, es, fr = hits["en"], hits["de"], hits["es"], hits["fr"]
    return (
        F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= es) & (de >= fr) & (de > 0), F.lit("de"))
        .when((es >= fr) & (es > 0), F.lit("es"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


# GPT-2-style pre-tokenization pattern (the public BPE pre-split regex,
# simplified to RE2-safe constructs — no lookahead): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
# Behaves identically under Java regex (Spark) and RE2 (DuckDB oracle).
BPE_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pre-tokenization: the regex split an LLM tokenizer applies
    before byte-pair merges (word-with-leading-space pieces, contraction
    suffixes, digit and punctuation runs). Whitespace-run tokens are kept —
    filter them out for counting."""
    t = text if isinstance(text, Column) else F.col(text)
    return F.regexp_extract_all(t, F.lit(BPE_SPLIT_PATTERN), 0)


# PII patterns, deliberately RE2-compatible (no backrefs/lookaround) so the
# DuckDB oracle runs the IDENTICAL regex — and so the scan stays a plain
# regexp_replace chain at 100 TB (JVM codegen, no Python).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+", "[EMAIL]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
    (r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "[CARD]"),
]


def redact_pii(text: Column | str) -> Column:
    """Training-data PII scrubbing: emails, SSNs, phone numbers, and card
    numbers replaced with typed placeholders. The patterns' digit-group
    shapes are mutually exclusive (3-2-4 / 3-3-4 / 4-4-4-4), so the chain
    order cannot double-redact."""
    t = text if isinstance(text, Column) else F.col(text)
    for pat, repl in PII_PATTERNS:
        t = F.regexp_replace(t, pat, repl)
    return t


def repetition_score(text: Column | str, n: int = 3) -> Column:
    """Gopher-style repetition signal: frequency of the most common word
    n-gram over the total n-gram count (1.0 = the document is one phrase
    repeated). Pure higher-order array expressions — per-row, no shuffle;
    docs shorter than n score 0."""
    toks = tokens(text)
    # gram identity as a 64-bit hash (equality preserved modulo a
    # ~L^2/2^64 per-doc collision chance — the oracle hash-check would
    # surface one): sorting and run-comparing int64s is several times
    # cheaper than the equivalent over gram STRINGS. r15: grams come from
    # word_ngrams (per-row zip_with chain) and the hash transform's
    # collection argument is evaluated once per row — the previous
    # element_at(toks, i + j) lambda re-split the text per element
    # (guide §4.1; measured 9.9s -> 1.7s at sf0.1).
    grams = F.sort_array(
        F.transform(word_ngrams(text, n), lambda g: F.xxhash64(g))
    )
    # inside the size >= n guard there are exactly L-(n-1) grams; sizing
    # from toks avoids evaluating the gram pipeline a second row-pass
    total = F.size(toks) - (n - 1)
    # single O(L log L) pass: sort, then the longest run of equal adjacent
    # grams IS the max frequency (vs. the naive distinct x contains scan,
    # which is O(L^2) per document)
    zero = F.struct(
        F.lit(0).cast("bigint").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    max_cnt = F.aggregate(grams, zero, step, lambda acc: acc["best"])
    return F.when(F.size(toks) >= n, dround(max_cnt / total, 6)).otherwise(F.lit(0.0))


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set of the lowercased text. Two docs with permuted wording share a
    fingerprint — the cheap first-pass bucket key for dedup."""
    t = text if isinstance(text, Column) else F.col(text)
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.lower(t), " "))))
    return F.md5(canon)


def add_text_stats(df, text_col: str = "text"):
    """Convenience: attach the full stat column family."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("stopword_ratio", stopword_ratio(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_guess", lang_id(t))
        .withColumn("fp", fingerprint(t))
    )


def _merge_pair_in_syms(syms: Column, left: str, right: str) -> Column:
    """Replace every non-overlapping (left, right) adjacency in a symbol
    array with their concatenation, greedy left-to-right — one fold, no
    UDF. 'a a a' under merge (a,a) -> ['aa','a'] (the BPE contract)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _select_merge_batch(
    ranked: list,
    budget: tuple[int, int, bool],  # (soft batch cap, hard cap, collect-limit hit)
    min_freq: int,
    symbols: set[str],
) -> list:
    """Pick the longest PREFIX of the (cnt desc, l, r)-ranked pair list
    that is provably safe to apply in one round while reproducing the
    sequential trainer's merge sequence EXACTLY:

    - Adjacency-level non-interaction (not mere symbol-sharing): merging
      (a, b) changes cnt(c, d) only if d==a (pattern c,a,b destroys
      (c,a)), c==b (pattern a,b,y destroys (b,y)), (c,d)==(a,b), or
      (c,d) touches the merged symbol — so e.g. (e,</w>) and (s,</w>)
      batch together (a </w> has ONE left neighbor) while (t,h)/(h,e)
      conflict. Each selected pair's count is therefore invariant under
      every earlier selected merge, and the sequential trainer would
      record the identical count at its step.
    - Merged-string freshness: l+r must not equal an existing symbol or
      another selected merged string, else the merge would BOOST an
      existing pair's count above the selection-time ranking (the
      "a+bc vs ab+c = 'abc'" concat collision).
    - Prefix-only (stop at the first failing pair, never skip): every
      unselected pair then ranks strictly below the whole batch, so
      neither it nor any pair the batch creates (each bounded by a
      conflicting — hence unselected — parent's count) can overtake a
      selected pair in the sequential order.
    - Strict boundary: trailing selected pairs whose count ties the
      first unselected row are dropped, turning all the above "<="
      bounds into "<". If that empties the batch, the caller falls back
      to a single merge, which is sequential by definition.
    """
    soft, hard, exhausted = budget
    sel: list = []
    used_m: set[str] = set()
    last_cnt = None
    for row in ranked:
        lft, rgt, cnt = row["l"], row["r"], int(row["cnt"])
        if cnt < min_freq or len(sel) >= hard:
            break
        # the soft (batch-size) cap may be exceeded to COMPLETE a count-tie
        # group: a fully selected tie group is ordered by the same
        # (cnt desc, lex) rule the sequential argmax uses, and stopping
        # mid-group would force the strict-boundary trim to drop it all
        if len(sel) >= soft and cnt != last_cnt:
            break
        merged = lft + rgt
        conflict = merged in symbols or merged in used_m
        for plft, prgt, pm in sel:
            if (
                rgt == plft
                or lft == prgt
                or (lft, rgt) == (plft, prgt)
                or lft == pm
                or rgt == pm
            ):
                conflict = True
                break
        if conflict:
            break
        sel.append((lft, rgt, merged))
        used_m.add(merged)
        last_cnt = cnt
    if len(ranked) > len(sel):
        boundary = int(ranked[len(sel)]["cnt"])
    elif exhausted:
        # collect limit hit and everything selected: the next pair's count
        # is unknown but can only tie sel[-1] — treat it as a tie
        boundary = int(ranked[-1]["cnt"]) if sel else 0
    else:
        boundary = -1  # pair table exhausted: nothing below the batch
    while sel:
        row = ranked[len(sel) - 1]
        if int(row["cnt"]) > boundary:
            break
        sel.pop()
    return sel


def bpe_train(
    df,
    text_col: str = "text",
    num_merges: int = 10,
    min_freq: int = 2,
    end_of_word: str = "</w>",
    batch_merges: int = 16,
    stats: dict | None = None,
):
    """Learn BPE merges from a corpus — the tokenizer-FITTING side of the
    x14k tokenizer (reference pipelines ship a fixed vocab; a training-data
    engine has to be able to fit one).

    Classic BPE trains on the WORD-FREQUENCY table, not the corpus: the
    one corpus-sized job here is the initial word count (hash agg, Zipf
    makes the result small); every merge round then runs on |vocab| rows —
    explode adjacent symbol pairs weighted by word freq, one partial+final
    sum agg, and a bounded driver collect of the top-ranked pairs (ties
    broken lexicographically for determinism). The merge application is a
    pure higher-order fold (map-side, no shuffle). Plan depth from the
    iterative withColumn chain is capped with a periodic localCheckpoint
    (the dup_clusters lesson). Returns (merges DataFrame(rank, left,
    right, merged, cnt), final word-symbol table).

    ``batch_merges``: up to this many merges are applied per driver round
    (the public batched-merge trick — a real 32K-merge vocabulary cannot
    afford one count+argmax Spark job per merge). The batch is chosen by
    :func:`_select_merge_batch`, whose prefix/non-interaction/strict-
    boundary rules make the batched trainer's merge TABLE (order, pairs,
    counts) provably identical to ``batch_merges=1`` — equality is
    asserted in tests/test_bpe_train.py on both the classic corpus and
    the fixture. Set 1 to force the sequential oracle path. Batch yield
    is corpus-shaped: dispersed alphabets (many non-interacting frequent
    pairs, e.g. CJK-like single-symbol tokens) fill whole batches, while
    heavily chained top pairs (the '(e,r)/(r,</w>)' shape of Latin text)
    cap rounds nearer ~1.4x — exactness is never traded for batch size.
    ``stats``, if a dict, receives {'rounds': driver rounds used}."""
    spark = df.sparkSession
    t = F.col(text_col)
    words = (
        df.select(F.explode(F.split(F.lower(t), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.concat(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.substr("w", i, F.lit(1)),
                ),
                F.array(F.lit(end_of_word)),
            ),
        )
        .select("w", "freq", "syms")
        .persist()
    )
    words.count()  # materialize once; rounds iterate on this table
    batch_merges = max(1, batch_merges)
    # driver-maintained symbol-string set for the concat-collision guard:
    # initial alphabet (bounded) + every merged string applied so far
    symbols: set[str] = {
        r["s"]
        for r in words.select(F.explode("syms").alias("s")).distinct().collect()
    }
    merges: list[tuple] = []
    since_ckpt = rounds = 0
    try:
        cur = words
        while len(merges) < num_merges:
            rounds += 1
            pair_structs = F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("l"),
                    F.element_at(F.col("syms"), i + 1).alias("r"),
                ),
            )
            soft = min(batch_merges, num_merges - len(merges))
            hard = num_merges - len(merges)
            # over-collect past the batch size so selection can run THROUGH
            # a count-tie group; the strict-boundary trim then only fires
            # when a tie group genuinely straddles the selected edge
            limit = min(hard, batch_merges * 4) + 8
            ranked = (
                cur.filter(F.size("syms") >= 2)
                .select(F.explode(pair_structs).alias("p"), "freq")
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "l", "r")
                .limit(limit)
                .collect()
            )
            if not ranked or ranked[0]["cnt"] < min_freq:
                break
            sel = _select_merge_batch(
                ranked, (soft, hard, len(ranked) == limit), min_freq, symbols
            )
            if not sel:
                # tie at the batch boundary: one merge is always exact
                sel = [(ranked[0]["l"], ranked[0]["r"], ranked[0]["l"] + ranked[0]["r"])]
            cnt_by_pair = {(r["l"], r["r"]): int(r["cnt"]) for r in ranked}
            syms_col = F.col("syms")
            for lft, rgt, merged in sel:
                merges.append(
                    (len(merges), lft, rgt, merged, cnt_by_pair[(lft, rgt)])
                )
                symbols.add(merged)
                # ordered fold: identical to applying the merges one job
                # at a time, minus the driver round-trips
                syms_col = _merge_pair_in_syms(syms_col, lft, rgt)
            cur = cur.withColumn("syms", syms_col)
            since_ckpt += len(sel)
            if since_ckpt >= 4:
                cur = cur.localCheckpoint(eager=True)
                since_ckpt = 0
        schema = "rank int, left string, right string, merged string, cnt bigint"
        if stats is not None:
            stats["rounds"] = rounds
        return spark.createDataFrame(merges, schema), cur
    finally:
        words.unpersist(blocking=False)


def bpe_encode_reference(
    word: str, merges: list[tuple[str, str]], end_of_word: str = "</w>"
) -> list[str]:
    """Sequential oracle for BPE ENCODING: apply the learned merge rules
    to one word in rank order, one greedy left-to-right non-overlapping
    pass per rule — Sennrich's original apply loop. O(|rules| x |word|)
    per word: correct, obviously-faithful, and far too slow to run 32K
    rules over a corpus — which is exactly why it is the TEST oracle for
    :func:`bpe_encode_words`, the same role the ``batch_merges=1``
    trainer plays for x39."""
    syms = list(word) + [end_of_word]
    for left, right, *_ in merges:
        merged = left + right
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _bpe_encode_min_rank(
    word: str, rank: dict[tuple[str, str], int], end_of_word: str
) -> list[str]:
    """Per-word production encoder: repeatedly merge the present pair
    with the LOWEST rank (all its non-overlapping occurrences, left to
    right) until none of the word's adjacencies is a learned rule.

    Equivalent to the rank-order pass of :func:`bpe_encode_reference`
    because a later rule can never create an occurrence of an earlier
    one: rule j's symbols all exist before rule k>j is learned, and the
    trainer's merged-string freshness guard means rule k's output string
    equals no earlier symbol — so the earliest-applicable-first order and
    the rank order apply the same rules to the same adjacencies
    (tests/test_bpe_encode.py asserts the equality per word). Cost is
    O(passes x |word|) with passes <= |word|, INDEPENDENT of vocabulary
    size — the property that makes corpus-scale encoding affordable."""
    syms = list(word) + [end_of_word]
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        left, right = best_pair
        merged = left + right
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_words(
    words: "DataFrame",
    merges: list[tuple[str, str]],
    word_col: str = "w",
    end_of_word: str = "</w>",
) -> "DataFrame":
    """Tokenize a DISTINCT-word table with a learned BPE merge list —
    the encode/apply half of the x39 tokenizer story (the trainer fits
    the vocab; this is the operator a 100 TB pipeline actually runs
    every day).

    Scale shape (the Zipf factoring): the corpus NEVER reaches Python —
    callers aggregate to the distinct-word table first (|vocab|, not
    |tokens| rows), this encodes each word once via an Arrow-batched
    pandas UDF whose merge table rides one broadcast (a 32K-merge vocab
    is ~1 MB), and the per-document answer comes from joining token
    counts back on the word column. Per-word cost is independent of
    vocabulary size (min-rank loop, not a 32K-rule scan); exactness vs
    the sequential rank-order oracle is pinned in
    tests/test_bpe_encode.py.

    Returns ``words`` with two new columns: ``bpe_toks array<string>``,
    ``n_bpe bigint``."""
    from pyspark.sql.functions import pandas_udf

    spark = words.sparkSession
    rules = [(str(l), str(r)) for l, r, *_ in merges]
    b_rules = spark.sparkContext.broadcast(rules)
    eow = end_of_word

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        rank = {pair: i for i, pair in enumerate(b_rules.value)}
        return col.map(lambda w: _bpe_encode_min_rank(w, rank, eow))

    return words.withColumn("bpe_toks", encode(F.col(word_col))).withColumn(
        "n_bpe", F.size("bpe_toks").cast("long")
    )


def _bpe_encode_applied_ranks(
    word: str, rank: dict[tuple[str, str], int], end_of_word: str
) -> list[int]:
    """The ranks of the merges :func:`_bpe_encode_min_rank` applies to
    ``word``, one entry per merged OCCURRENCE (each occurrence reduces
    the symbol count by exactly 1). The list is non-decreasing: applying
    a rank-k merge can only create pairs involving its fresh output
    symbol, and any rule over that symbol was learned after k — so the
    encode under the PREFIX vocabulary of the first V rules is exactly
    the full encode truncated at rank V, and
    ``len(word) + 1 - #{r in ranks : r < V}`` is the prefix-V token
    count without re-encoding (the x266 sweep rides this; equality vs
    bpe_encode_reference on the prefix rule list is pinned in
    tests/test_bpe_encode.py)."""
    syms = list(word) + [end_of_word]
    applied: list[int] = []
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        left, right = best_pair
        merged = left + right
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                applied.append(best_rank)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return applied


def bpe_encode_words_with_ranks(
    words: "DataFrame",
    merges: list[tuple[str, str]],
    word_col: str = "w",
    end_of_word: str = "</w>",
) -> "DataFrame":
    """:func:`bpe_encode_words`'s sweep twin: instead of the token list,
    emit ``applied_ranks array<int>`` — the non-decreasing rank sequence
    the min-rank encoder applied. ONE Arrow-batched pass then answers
    EVERY vocabulary-budget prefix V by plain column algebra
    (``length(w) + 1 - size(filter(applied_ranks, r -> r < V))``), so a
    vocab-size sweep costs one encode of the distinct-word table, not
    one per budget. Same Zipf factoring and ~1 MB broadcast as
    bpe_encode_words."""
    from pyspark.sql.functions import pandas_udf

    spark = words.sparkSession
    rules = [(str(l), str(r)) for l, r, *_ in merges]
    b_rules = spark.sparkContext.broadcast(rules)
    eow = end_of_word

    @pandas_udf("array<int>")
    def encode_ranks(col: pd.Series) -> pd.Series:
        rank = {pair: i for i, pair in enumerate(b_rules.value)}
        return col.map(lambda w: _bpe_encode_applied_ranks(w, rank, eow))

    return words.withColumn("applied_ranks", encode_ranks(F.col(word_col)))


#: x270's funnel gates: (name, integer-exact predicate over the
#: funnel_signals columns). The predicate text is shared verbatim with
#: the DuckDB oracle (swap `div` for `//`), so adding a stage here
#: changes query, oracle, and streaming twin together.
FUNNEL_STAGES = [
    ("min_chars_200", "n_chars >= 200"),
    ("min_tokens_30", "ntoks >= 30"),
    ("stopwords_2pct", "hits * 1000000 div ntoks >= 20000"),
    ("punct_le_10pct", "punct * 1000000 div n_chars <= 100000"),
    ("mean_tok_le_12", "n_chars * 1000 div ntoks <= 12000"),
]


def funnel_signals(df: "DataFrame", extra: tuple = ()) -> "DataFrame":
    """Per-doc integer quality signals the funnel gates read — one
    projection over (text, n_chars), exact split/translate primitives
    both engines share. ``extra`` names passthrough columns (x278's
    manifest keeps doc identity; x270/the streaming twin keep the
    default anonymous shape)."""
    return df.select(
        *extra,
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("ntoks"),
        F.expr(
            "cast(size(filter(split(text, ' '),"
            " t -> array_contains(array('a','the','of','and','to','in'),"
            " t))) as bigint)"
        ).alias("hits"),
        (F.length("text") - F.length(F.translate("text", ".,;:!?", "")))
        .cast("long")
        .alias("punct"),
    )


def funnel_flags(signals: "DataFrame") -> "DataFrame":
    """Cumulative pass flags c0..c4 (doc survives stages 1..i+1) as
    conditional expressions in one projection."""
    return signals.select(
        "n_chars",
        *[
            F.expr(
                "case when "
                + " and ".join(p for _, p in FUNNEL_STAGES[: i + 1])
                + " then 1 else 0 end"
            ).alias(f"c{i}")
            for i in range(len(FUNNEL_STAGES))
        ],
    )


def funnel_state(flags: "DataFrame") -> "DataFrame":
    """x270's sufficient statistic: ONE mergeable count/sum aggregation
    (total, and per stage the surviving doc count and char mass). On a
    stream this is the ENTIRE complete-mode state — one row, bounded by
    construction — and :func:`funnel_table` derives the published
    funnel from it per refresh without rescanning anything (the
    brier_bins contract applied to the curation funnel)."""
    agg_cols = [F.count(F.lit(1)).cast("long").alias("total")]
    for i in range(len(FUNNEL_STAGES)):
        agg_cols.append(F.sum(f"c{i}").cast("long").alias(f"n{i}"))
        agg_cols.append(
            F.sum(F.col(f"c{i}") * F.col("n_chars"))
            .cast("long")
            .alias(f"m{i}")
        )
    return flags.agg(*agg_cols)


def funnel_table(state: "DataFrame") -> "DataFrame":
    """The published 5-row funnel (stage, filter_name, n_in, n_dropped,
    n_out, char_mass_out, survival_ppm) fanned from the 1-row state —
    closed-form integer arithmetic, shared by batch x270 and the
    streaming twin."""
    parts = []
    for i, (name, _) in enumerate(FUNNEL_STAGES):
        n_in = F.col(f"n{i - 1}") if i else F.col("total")
        parts.append(
            state.select(
                F.lit(i + 1).cast("long").alias("stage"),
                F.lit(name).alias("filter_name"),
                n_in.alias("n_in"),
                (n_in - F.col(f"n{i}")).alias("n_dropped"),
                F.col(f"n{i}").alias("n_out"),
                F.col(f"m{i}").alias("char_mass_out"),
                F.expr(f"cast(n{i} * 1000000 div total as bigint)").alias(
                    "survival_ppm"
                ),
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionAll(x)
    return out.orderBy("stage")
