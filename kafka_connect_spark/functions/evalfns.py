"""Online classifier-eval primitives shared by the batch registry query
(x190) and its streaming twin (tests/test_streaming_eval.py).

The confusion/discordance counters are plain commutative sums, so the
SAME aggregation runs as a batch 1-row reduce or as a complete-mode
streaming aggregate with O(1) state — the 'is the new filter version
actually better?' monitor a curation pipeline keeps alive during
ingestion, with McNemar's test computed on counters that never grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lid_labels(df: DataFrame) -> DataFrame:
    """Label each document with truth y (lang='en') and the two LID
    heuristics x190 compares: A = stopword-density >= 0.1 (the x184/x187
    integer score thresholded), B = contains the token 'the'."""
    return df.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        (
            F.expr(
                "cast(size(filter(split(text, ' '),"
                " t -> array_contains(array('a','the','of','and','to','in'), t)))"
                " as bigint) * 5000000 div size(split(text, ' '))"
            )
            >= 500000
        )
        .cast("long")
        .alias("a"),
        F.array_contains(F.split("text", " "), "the").cast("long").alias("b"),
    )


def confusion_mcnemar(labeled: DataFrame) -> DataFrame:
    """From (y, a, b) rows to the x190 output row: accuracies, the
    discordant cells, and continuity-corrected McNemar chi2 in floored
    ppm. Pure commutative sums + a 1-row projection — valid under batch
    AND complete-mode streaming aggregation (state = 5 counters)."""
    c = labeled.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("a") == F.col("y")).cast("long")).alias("a_ok"),
        F.sum((F.col("b") == F.col("y")).cast("long")).alias("b_ok"),
        F.sum(
            ((F.col("a") == F.col("y")) & (F.col("b") != F.col("y"))).cast(
                "long"
            )
        ).alias("b01"),
        F.sum(
            ((F.col("a") != F.col("y")) & (F.col("b") == F.col("y"))).cast(
                "long"
            )
        ).alias("b10"),
    )
    return c.select(
        "n",
        F.expr("a_ok * 1000000 div n").cast("long").alias("a_acc_ppm"),
        F.expr("b_ok * 1000000 div n").cast("long").alias("b_acc_ppm"),
        "b01",
        "b10",
        F.when(F.col("b01") + F.col("b10") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "greatest(abs(b01 - b10) - 1, 0)"
                " * greatest(abs(b01 - b10) - 1, 0) * 1000000"
                " div (b01 + b10)"
            ).cast("long")
        )
        .alias("mcnemar_chi2_ppm"),
    )
