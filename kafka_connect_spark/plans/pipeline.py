"""Pipeline-spec -> DataFrame-plan compiler — the engine's 'herder'.

The reference configures pipelines as connector JSON (e.g.
postgres/connector.json: connector.class + transforms chain + routing) PUT
to the Connect REST API, validated and persisted by the DistributedHerder
(SURVEY.md §3.1). Our analog: a JSON/dict spec naming a source, a
transform chain, and a sink from pluggable registries — the Connect plugin
API (SourceConnector/SinkConnector/Transformation discovered via
plugin.path) maps to these registries (SURVEY.md §2.6 'Connect plugin API
≙ our extension API').

Error handling (T6, reference README.md:280-284): ``errors.tolerance=none``
is fail-fast (any exception propagates); ``errors.tolerance=all`` routes
rows failing a declared validation predicate to a dead-letter sink and
continues — at scale both paths stay declarative (a filter + two writes),
no row-at-a-time guard."""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.upsert import UpsertParquetSink
from ..sources.incremental import IncrementalTableSource
from ..transforms import (
    extract_new_record_state,
    mask_fields,
    resolve_config_placeholders,
    to_json_envelope,
    with_topic,
)

# -- registries (name -> factory), the plugin.path analog --------------------

SOURCES: dict[str, Callable] = {}
TRANSFORMS: dict[str, Callable] = {}
SINKS: dict[str, Callable] = {}


def register_source(name):
    def deco(fn):
        SOURCES[name] = fn
        return fn
    return deco


def register_transform(name):
    def deco(fn):
        TRANSFORMS[name] = fn
        return fn
    return deco


def register_sink(name):
    def deco(fn):
        SINKS[name] = fn
        return fn
    return deco


# -- built-in plugins ---------------------------------------------------------


@register_source("parquet")
def _src_parquet(spec: dict) -> Callable[[SparkSession], DataFrame]:
    return lambda spark: spark.read.parquet(spec["path"])


@register_source("incremental")
def _src_incremental(spec: dict) -> Callable[[SparkSession], DataFrame]:
    src = IncrementalTableSource(
        path=spec["path"],
        offset_column=spec["offset.column"],
        mode=spec.get("mode", "incrementing"),
        state_dir=spec.get("state.dir"),
        batch_max_rows=spec.get("batch.max.rows"),
        incrementing_column=spec.get("incrementing.column"),
    )
    def read(spark: SparkSession) -> DataFrame:
        df = src.read_increment(spark)
        read.source = src  # expose for offset commit by the runner
        return df
    read.source = src
    return read


@register_source("jdbc_incremental")
def _src_jdbc(spec: dict) -> Callable[[SparkSession], DataFrame]:
    """The reference's defining source (README.md:88-109): incremental poll
    of a live database table over JDBC, offset predicates pushed into the
    remote query."""
    src = IncrementalTableSource(
        path=spec["connection.url"],
        offset_column=spec["offset.column"],
        mode=spec.get("mode", "incrementing"),
        state_dir=spec.get("state.dir"),
        batch_max_rows=spec.get("batch.max.rows"),
        fmt="jdbc",
        table=spec["table"],
        jdbc_options=spec.get("options"),
        incrementing_column=spec.get("incrementing.column"),
    )

    def read(spark: SparkSession) -> DataFrame:
        df = src.read_increment(spark)
        read.source = src
        return df

    read.source = src
    return read


@register_source("exposition")
def _src_exposition(spec: dict) -> Callable[[SparkSession], DataFrame]:
    """Prometheus-exposition scrape files via the custom data source plugin
    (the task-2 metrics ingest path)."""

    def read(spark: SparkSession) -> DataFrame:
        from ..sources.exposition_datasource import ExpositionDataSource

        spark.dataSource.register(ExpositionDataSource)
        return spark.read.format("exposition").option("path", spec["path"]).load()

    return read


@register_transform("mask_field")
def _t_mask(spec: dict):
    return lambda df: mask_fields(df, spec["fields"], spec.get("replacement", "CENSORED"))


def _listish(v) -> list[str] | None:
    """Connect configs write list options as comma-joined strings; specs
    may also pass real lists."""
    if v is None:
        return None
    if isinstance(v, str):
        return [p.strip() for p in v.split(",") if p.strip()]
    return list(v)


@register_transform("unwrap")
def _t_unwrap(spec: dict):
    return lambda df: extract_new_record_state(
        df,
        drop_tombstones=spec.get("drop.tombstones", "false") == "true",
        delete_handling=spec.get("delete.handling.mode", "rewrite"),
        add_fields=_listish(spec.get("add.fields")),
        add_fields_prefix=spec.get("add.fields.prefix", "__"),
        add_headers=_listish(spec.get("add.headers")),
        add_headers_prefix=spec.get("add.headers.prefix", "__"),
        route_by_field=spec.get("route.by.field") or None,
    )


@register_transform("route_topic")
def _t_route(spec: dict):
    col = spec.get("table.column")
    table = F.col(col) if col else spec.get("table")
    return lambda df: with_topic(df, spec["topic.prefix"], table)


@register_transform("json_envelope")
def _t_envelope(spec: dict):
    return lambda df: to_json_envelope(df, spec.get("key.fields"))


@register_transform("avro_envelope")
def _t_avro_envelope(spec: dict):
    """AvroConverter as a spec-addressable transform (reference
    docker-compose.yaml:63-75: value.converter=AvroConverter +
    schema.registry.url — here a file-backed registry path)."""

    def apply(df: DataFrame) -> DataFrame:
        from ..transforms.avro import FileSchemaRegistry, to_avro_envelope

        if "schema.registry.url" in spec:
            from ..transforms.schema_registry import RestSchemaRegistry

            reg = RestSchemaRegistry(spec["schema.registry.url"])
        else:
            reg = FileSchemaRegistry(spec["schema.registry.path"])
        return to_avro_envelope(df, reg, spec["subject"], key_cols=spec.get("key.fields"))

    return apply


@register_transform("filter")
def _t_filter(spec: dict):
    return lambda df: df.filter(spec["condition"])


# Transform types that drop (or duplicate) rows: under a spec-level
# predicate these must take the filter/union plan, not the single-pass
# when/otherwise rewrite (which would wrongly drop non-matching rows too).
ROW_DROPPING_TRANSFORMS = {"filter"}


@register_sink("parquet")
def _k_parquet(spec: dict):
    return lambda df: df.write.mode(spec.get("mode", "append")).parquet(spec["path"])


@register_sink("json")
def _k_json(spec: dict):
    return lambda df: df.write.mode(spec.get("mode", "append")).json(spec["path"])


@register_sink("upsert_parquet")
def _k_upsert(spec: dict):
    sink = UpsertParquetSink(
        spec["path"],
        spec["key.fields"],
        spec["order.column"],
        delete_col=spec.get("delete.column"),
    )
    return lambda df: sink.apply_batch(df)


@register_sink("upsert_jdbc")
def _k_upsert_jdbc(spec: dict):
    from ..sinks.jdbc import UpsertJdbcSink

    sink = UpsertJdbcSink(
        spec["connection.url"],
        spec["table"],
        spec["key.fields"],
        spec["order.column"],
        delete_col=spec.get("delete.column"),
        options=spec.get("options"),
    )
    return lambda df: sink.apply_batch(df)


@register_sink("scd2_parquet")
def _k_scd2(spec: dict):
    """SCD Type-2 history sink: fold each batch of change events into the
    versioned dimension-history table (sinks/scd2.py)."""
    from ..sinks.scd2 import Scd2ParquetSink

    sink = Scd2ParquetSink(spec["path"], keep_versions=int(spec.get("keep.versions", 1)))
    return lambda df: sink.apply_batch(df)


@register_sink("noop")
def _k_noop(spec: dict):
    return lambda df: df.write.format("noop").mode("overwrite").save()


@register_sink("curated_corpus")
def _k_curated(spec: dict):
    """The curation family's OUTPUT stage as a pipeline sink: apply
    x278's freeze verdicts + x279's blocklist to the incoming documents
    DataFrame and emit the cleaned corpus (parquet + _MANIFEST.json) —
    see plans/curate.py. Spec keys: path (output dir), optional
    blocklist.df.floor / blocklist.top.k / block.tokens."""
    from .curate import curated_write_df

    def write(df: DataFrame) -> None:
        write.manifest = curated_write_df(
            df,
            spec["path"],
            df_floor=int(spec.get("blocklist.df.floor", 3)),
            top_k=int(spec.get("blocklist.top.k", 20)),
            block=int(spec.get("block.tokens", 20)),
        )

    return write


@register_sink("packed_corpus")
def _k_packed(spec: dict):
    """The packing family's OUTPUT stage as a pipeline sink: concat the
    incoming documents DataFrame in (lang, doc_id) order, chunk into
    fixed ctx-token training sequences, and emit parquet +
    _MANIFEST.json — see plans/pack.py. Chains after curated_corpus
    (curate -> pack: examples/task9_packed_corpus.json). Spec keys:
    path (output dir), optional ctx.tokens (default 512), optional
    pack.order ("sequential" | "curriculum") and pack.phases."""
    from .pack import packed_write_df

    def write(df: DataFrame) -> None:
        write.manifest = packed_write_df(
            df,
            spec["path"],
            ctx=int(spec.get("ctx.tokens", 512)),
            source_dir=spec.get("source.dir"),
            order=spec.get("pack.order", "sequential"),
            phases=int(spec.get("pack.phases", 4)),
        )

    return write


# -- streaming plugins --------------------------------------------------------

STREAM_SOURCES: dict[str, Callable] = {}
STREAM_SINKS: dict[str, Callable] = {}


def register_stream_source(name):
    def deco(fn):
        STREAM_SOURCES[name] = fn
        return fn
    return deco


def register_stream_sink(name):
    def deco(fn):
        STREAM_SINKS[name] = fn
        return fn
    return deco


@register_stream_source("file_stream")
def _ss_file(spec: dict) -> Callable[[SparkSession], DataFrame]:
    """S5 analog: new files in the directory are the increments; offsets
    (which files are consumed) live in the sink's checkpoint."""

    def read(spark: SparkSession) -> DataFrame:
        schema = spark.read.format(spec.get("format", "parquet")).load(spec["path"]).schema
        reader = spark.readStream.schema(schema)
        if "max.files.per.trigger" in spec:
            reader = reader.option("maxFilesPerTrigger", spec["max.files.per.trigger"])
        return reader.format(spec.get("format", "parquet")).load(spec["path"])

    return read


@register_stream_source("incremental_table")
def _ss_incremental(spec: dict) -> Callable[[SparkSession], DataFrame]:
    """S1/S2 as a native stream: offsets checkpoint with the sink epoch;
    data reads happen on executors (partition-per-file Arrow scans)."""

    def read(spark: SparkSession) -> DataFrame:
        from ..sources.incremental_stream import IncrementalTableDataSource

        spark.dataSource.register(IncrementalTableDataSource)
        reader = (
            spark.readStream.format("incremental_table")
            .option("path", spec["path"])
            .option("offset.column", spec["offset.column"])
        )
        if "batch.max.rows" in spec:
            reader = reader.option("batch.max.rows", str(spec["batch.max.rows"]))
        return reader.load()

    return read


@register_stream_source("tailing_file")
def _ss_tailing(spec: dict) -> Callable[[SparkSession], DataFrame]:
    """S5 with the reference's exact (file, byte-position) offsets: tail
    one growing text file, one record per appended line."""

    def read(spark: SparkSession) -> DataFrame:
        from ..sources.tailing import TailingFileDataSource

        spark.dataSource.register(TailingFileDataSource)
        reader = spark.readStream.format("tailing_file").option("path", spec["path"])
        if "batch.max.bytes" in spec:
            reader = reader.option("batch.max.bytes", str(spec["batch.max.bytes"]))
        return reader.load()

    return read


@register_stream_source("rate")
def _ss_rate(spec: dict) -> Callable[[SparkSession], DataFrame]:
    return lambda spark: (
        spark.readStream.format("rate")
        .option("rowsPerSecond", spec.get("rows.per.second", 10))
        .load()
    )


@register_stream_sink("parquet_stream")
def _sk_parquet_stream(spec: dict):
    def start(sdf: DataFrame):
        return (
            sdf.writeStream.format("parquet")
            .option("path", spec["path"])
            .option("checkpointLocation", spec["checkpoint"])
            .outputMode("append")
        )

    return start


@register_stream_sink("foreach_upsert")
def _sk_foreach_upsert(spec: dict):
    sink = UpsertParquetSink(
        spec["path"],
        spec["key.fields"],
        spec["order.column"],
        delete_col=spec.get("delete.column"),
    )

    def start(sdf: DataFrame):
        return sdf.writeStream.foreachBatch(sink.foreach_batch()).option(
            "checkpointLocation", spec["checkpoint"]
        )

    return start


@register_stream_sink("curated_stream")
def _sk_curated_stream(spec: dict):
    """curated_write's STREAMING form as a pipeline sink (plans/curate.py
    curated_stream_writer): per-microbatch quality gate + eval-gram
    decontamination + cross-batch exact-dup via the fingerprint index +
    published-blocklist segment strip. The blocklist and eval-gram
    inputs are ARTIFACT PATHS (``blocklist.source`` — publish_blocklist's
    parquet or a curated _MANIFEST.json; ``eval.grams.source`` —
    publish_eval_grams' parquet), re-read at every stream (re)start so a
    restarted crawl picks up a re-published freeze. Spec keys: path,
    checkpoint, index.dir, blocklist.source, eval.grams.source,
    optional block.tokens."""
    from .curate import curated_stream_writer

    def start(sdf: DataFrame):
        return curated_stream_writer(
            sdf,
            out_dir=spec["path"],
            checkpoint=spec["checkpoint"],
            index_dir=spec["index.dir"],
            blocklist_source=spec["blocklist.source"],
            eval_grams_source=spec["eval.grams.source"],
            block=int(spec.get("block.tokens", 20)),
        )

    return start


@register_stream_sink("packed_stream")
def _sk_packed_stream(spec: dict):
    """packed_write's STREAMING form as a pipeline sink (plans/pack.py
    packed_stream_writer): the no-drift concat-and-chunk fold per
    language with the open partial sequence held in checkpointed keyed
    state, completed sequences appended as parquet the microbatch they
    close. Restart continues numbering and the open partial exactly
    (state store). Spec keys: path, checkpoint, optional ctx.tokens."""
    from .pack import packed_stream_writer

    def start(sdf: DataFrame):
        return packed_stream_writer(
            sdf,
            out_dir=spec["path"],
            checkpoint=spec["checkpoint"],
            ctx=int(spec.get("ctx.tokens", 512)),
        )

    return start


@register_stream_sink("eval_dashboard")
def _sk_eval_dashboard(spec: dict):
    """The composed LIVE EVAL DASHBOARD (the streaming-eval family as one
    pipeline): the stream's scored events (columns y 0/1, p ppm-integer
    score) reduce to :func:`streaming.drift.score_label_counts` — ONE
    mergeable complete-mode count aggregation whose state is bounded by
    the score value domain, never the stream length — and every
    microbatch refresh re-derives all three monitoring curves from that
    count table alone: the x187 exact midrank AUC
    (``<path>/auc``), the x194 cumulative gains chart
    (``<path>/gain``), and the x263 Youden-J/F1 operating point
    (``<path>/operating_point``), each overwritten per refresh (a
    dashboard reads the latest, not a log). The stream is NEVER
    rescanned: the curves are closed-form arithmetic over the counts,
    so a refresh costs O(|score domain|) regardless of how much data
    the dashboard has absorbed — the brier_bins/hll_registers contract
    applied to the three curves a training-data pipeline watches. The
    per-curve batch/stream row-exactness is pinned by the twin tests
    (tests/test_streaming_r11_twins.py, tests/test_streaming_eval.py);
    the end-to-end spec is exercised by tests/test_examples.py."""

    def start(sdf: DataFrame):
        from ..streaming.drift import (
            auc_from_counts,
            gain_chart_from_counts,
            operating_point_from_counts,
            score_label_counts,
        )

        out = spec["path"]
        counts = score_label_counts(sdf)

        def render(cdf: DataFrame, _batch_id: int) -> None:
            cdf = cdf.persist()
            try:
                auc_from_counts(cdf).write.mode("overwrite").parquet(
                    f"{out}/auc"
                )
                gain_chart_from_counts(cdf).write.mode("overwrite").parquet(
                    f"{out}/gain"
                )
                operating_point_from_counts(cdf).write.mode(
                    "overwrite"
                ).parquet(f"{out}/operating_point")
            finally:
                cdf.unpersist()

        return (
            counts.writeStream.outputMode("complete")
            .foreachBatch(render)
            .option("checkpointLocation", spec["checkpoint"])
        )

    return start


# -- the pipeline itself ------------------------------------------------------


class Pipeline:
    """Compiled pipeline: source -> transform chain -> sink (+ optional DLQ)."""

    def __init__(self, spec: dict) -> None:
        spec = resolve_config_placeholders(spec)
        self.spec = spec
        self.name = spec.get("name", "pipeline")
        self.streaming = bool(spec.get("streaming", False))
        src_reg = STREAM_SOURCES if self.streaming else SOURCES
        self._read = src_reg[spec["source"]["type"]](spec["source"])
        self._transforms = [
            self._compile_transform(t) for t in spec.get("transforms", [])
        ]
        err = spec.get("errors", {})
        self.tolerance = err.get("tolerance", "none")
        self.validate_condition = err.get("validate.condition")
        self._dlq = SINKS[err["dlq"]["type"]](err["dlq"]) if "dlq" in err else None
        if self.streaming and self._dlq is not None:
            # Streaming DLQ: a second writeStream per query is not possible,
            # so the split happens INSIDE each microbatch via foreachBatch —
            # the main sink is therefore a BATCH sink type applied per
            # microbatch (Connect's errors.deadletterqueue does the same
            # per-record split inside the sink task).
            if not self.validate_condition or self.tolerance != "all":
                raise ValueError(
                    "streaming DLQ needs errors.tolerance=all + validate.condition"
                )
            self._sink = SINKS[spec["sink"]["type"]](spec["sink"])
            self._dlq_checkpoint = spec["sink"].get("checkpoint") or err["dlq"].get(
                "checkpoint"
            )
            if self._dlq_checkpoint is None:
                raise ValueError("streaming DLQ needs sink.checkpoint")
        else:
            sink_reg = STREAM_SINKS if self.streaming else SINKS
            self._sink = sink_reg[spec["sink"]["type"]](spec["sink"])

    @classmethod
    def from_json(cls, text: str) -> "Pipeline":
        return cls(json.loads(text))

    @staticmethod
    def _compile_transform(t: dict) -> Callable[[DataFrame], DataFrame]:
        """Compile one transform spec, honoring a spec-level ``predicate``
        (Connect's ``transforms.X.predicate`` + ``negate``,
        reference README.md:290,327): the transform applies only to rows
        matching the SQL condition. Row-dropping transform types
        (``ROW_DROPPING_TRANSFORMS``) take the filter/union plan; the rest
        use the single-pass when/otherwise rewrite."""
        fn = TRANSFORMS[t["type"]](t)
        cond = t.get("predicate")
        if cond is None:
            return fn
        from ..transforms import apply_when

        negate = str(t.get("negate", "false")).lower() == "true"
        preserving = t["type"] not in ROW_DROPPING_TRANSFORMS

        def predicated(df: DataFrame) -> DataFrame:
            pred = ~F.expr(cond) if negate else F.expr(cond)
            return apply_when(df, pred, fn, row_preserving=preserving)

        return predicated

    def _apply(self, df: DataFrame) -> DataFrame:
        if self.tolerance == "all" and self.validate_condition:
            bad = df.filter(~F.expr(self.validate_condition))
            if self._dlq is not None:
                self._dlq(bad)
            df = df.filter(F.expr(self.validate_condition))
        for t in self._transforms:
            df = t(df)
        return df

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """The logical plan: lazily composed, fully visible to Catalyst."""
        return self._apply(self._read(spark))

    def start_stream(self, spark: SparkSession, available_now: bool = True):
        """Compile to a running StreamingQuery (the herder's 'connector
        RUNNING' state, reference README.md:115-131). Transforms apply to
        the streaming DataFrame identically to batch; checkpointing and
        restart-from-offset come from the sink's checkpointLocation."""
        if not self.streaming:
            raise ValueError("spec is not marked streaming: true")
        if self._dlq is not None:
            # per-microbatch split: bad rows -> DLQ sink, good rows ->
            # transform chain -> main (batch) sink; offsets commit with the
            # epoch, so both routes replay together on restart
            cond = self.validate_condition
            transforms, dlq, sink = self._transforms, self._dlq, self._sink

            def split(df: DataFrame, _batch_id: int) -> None:
                # cache: the two routes are two actions — without it the
                # source is scanned twice AND the observed error counters
                # below would double-count (one increment per execution)
                df = df.persist()
                try:
                    dlq(df.filter(~F.expr(cond) | F.expr(cond).isNull()))
                    good = df.filter(F.expr(cond))
                    for t in transforms:
                        good = t(good)
                    sink(good)
                finally:
                    df.unpersist()

            # DLQ counters as OBSERVED metrics: they ride the existing
            # progress events (MetricsListener exports them as
            # errors_records_dlq / errors_records_read) with no extra job
            # or second pass — Connect's total-record-errors /
            # deadletterqueue-produce-requests analog.
            observed = self._read(spark).observe(
                "errors",
                F.count(
                    F.when(~F.expr(cond) | F.expr(cond).isNull(), 1)
                ).alias("records_dlq"),
                F.count(F.lit(1)).alias("records_read"),
            )
            writer = (
                observed.writeStream.foreachBatch(split)
                .option("checkpointLocation", self._dlq_checkpoint)
            )
        else:
            sdf = self._apply(self._read(spark))
            writer = self._sink(sdf)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.queryName(self.name).start()

    def run(self, spark: SparkSession) -> int:
        """Execute once (one poll for incremental sources). Returns rows sunk."""
        if self.streaming:
            q = self.start_stream(spark, available_now=True)
            q.awaitTermination()
            return -1  # row count not tracked for streaming drains
        base = self._read(spark)
        src = getattr(self._read, "source", None)
        cached = False
        if src is not None and src.batch_max_rows is not None:
            # Bounded poll: the increment is consumed three times (offset
            # snapshot, count, sink). It is a deterministic range filter, so
            # caching is a perf optimization, not a consistency requirement.
            base = base.cache()
            cached = True
        try:
            # Snapshot the increment's high-water mark BEFORE transforms (the
            # chain may drop or mask the offset column).
            off = src.max_offset_of(base) if src is not None else None
            df = self._apply(base)
            n = df.count()
            self._sink(df)
            if src is not None and off is not None:
                # commit AFTER the sink write => at-least-once, like the
                # reference
                src.commit(off)
        finally:
            if cached:
                base.unpersist()
        return n
