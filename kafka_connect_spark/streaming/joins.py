"""Stream-stream interval joins (Structured Streaming, SPARK-19497).

The reference's deployments express cross-topic correlation (e.g. "purchase
within 30 minutes of a view") as a Kafka Streams KStream-KStream windowed
join running downstream of the connectors (docker-compose.yaml wires the
topics; the join itself lives in consumer apps). Spark's native analog is
the watermarked stream-stream INNER join: both sides carry event-time
watermarks, and the join condition bounds each side's event time relative
to the other, so the state store provably evicts rows once the watermark
passes their last possible match — state is O(watermark + interval) per
key regardless of stream length, which is what makes the operator viable
on an unbounded 100 TB/day stream.

Batch twin: ``queries/relational.py::x158_view_purchase_attribution`` (the
same join as a batch range join, DuckDB-oracle-checked); equality of the
two is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_attribution(
    views: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 30,
    watermark: str = "60 minutes",
    how: str = "inner",
) -> DataFrame:
    """All (view, purchase) pairs per user with the view at most
    ``window_minutes`` before the purchase.

    Both inputs must be STREAMING DataFrames with columns
    (user_id, event_id, ts). The interval condition bounds view.ts on both
    sides of purchase.ts, so Spark derives state-cleanup watermarks for
    BOTH join sides (views held ``window_minutes`` + watermark; purchases
    held just the watermark). Inner join => rows emit as soon as both
    sides arrive; no results are withheld for window close.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    ).withWatermark("vts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    ).withWatermark("pts", watermark)
    cond = F.expr(
        f"""
        v_user = p_user AND
        vts <= pts AND
        vts >= pts - INTERVAL {int(window_minutes)} MINUTES
        """
    )
    if how == "inner":
        joined = v.join(p, cond)
    elif how == "right_outer":
        # LEFT-OUTER SEMANTICS ON THE PURCHASE SIDE: purchases with no view
        # in-window emit with NULL view columns once the watermark proves no
        # matching view can still arrive (the "dark conversions" stream —
        # batch twin x162). Expressed as views RIGHT OUTER purchases so the
        # preserved side is the purchase stream.
        joined = v.join(p, cond, "right_outer")
    else:  # pragma: no cover - guarded surface
        raise ValueError(f"unsupported join mode: {how}")
    return joined.select(
        F.coalesce(F.col("v_user"), F.col("p_user")).alias("user_id"),
        "view_id",
        "purchase_id",
        F.expr("(unix_micros(pts) - unix_micros(vts)) DIV 1000000").alias("gap_sec"),
    )
