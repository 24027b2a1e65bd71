"""Herder lifecycle (SURVEY.md §3.1): config CRUD, restart-on-update,
status states, and the read-only REST facade."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from kafka_connect_spark.plans import Herder, serve_http


@pytest.fixture()
def herder(spark, tmp_path):
    h = Herder(spark, str(tmp_path / "configs"))
    yield h
    h.shutdown()


def _batch_spec(tmp_path, name):
    return {
        "source": {"type": "parquet", "path": str(tmp_path / "src")},
        "transforms": [{"type": "mask_field", "fields": ["v"]}],
        "sink": {"type": "parquet", "path": str(tmp_path / f"out-{name}")},
    }


def test_put_run_status_delete(spark, tmp_path, herder):
    spark.createDataFrame([(1, "s")], ["id", "v"]).write.parquet(str(tmp_path / "src"))
    st = herder.put("job1", _batch_spec(tmp_path, "job1"))
    assert st["state"] == "BATCH" and herder.list() == ["job1"]
    assert herder.run_once("job1") == 1
    out = spark.read.parquet(str(tmp_path / "out-job1")).collect()[0]
    assert out["v"] == "CENSORED"
    herder.delete("job1")
    assert herder.list() == [] and herder.status("job1")["state"] == "NOT_FOUND"


def test_invalid_spec_rejected_before_persist(herder, tmp_path):
    with pytest.raises(KeyError):
        herder.put("bad", {"source": {"type": "nope"}, "sink": {"type": "noop"}})
    assert herder.list() == []  # fail-fast validation, nothing persisted


def test_streaming_put_restarts_on_update(spark, tmp_path, herder):
    spark.createDataFrame([(1, "x")], ["id", "v"]).write.parquet(str(tmp_path / "s1"))
    spec = {
        "streaming": True,
        "source": {"type": "rate", "rows.per.second": 5},
        "sink": {
            "type": "parquet_stream",
            "path": str(tmp_path / "o1"),
            "checkpoint": str(tmp_path / "c1"),
        },
    }
    st = herder.put("stream1", spec)
    assert st["state"] == "RUNNING"
    first_q = herder._queries["stream1"]

    spec2 = dict(spec, sink=dict(spec["sink"], path=str(tmp_path / "o2"),
                                 checkpoint=str(tmp_path / "c2")))
    st2 = herder.put("stream1", spec2)
    assert st2["state"] == "RUNNING"
    assert herder._queries["stream1"] is not first_q  # old query replaced
    assert not first_q.isActive  # reconfigure stopped the old instance
    herder.stop("stream1")
    assert herder.status("stream1")["state"] == "STOPPED"


def test_rest_facade(spark, tmp_path, herder):
    spark.createDataFrame([(1, "s")], ["id", "v"]).write.parquet(str(tmp_path / "src"))
    herder.put("api-job", _batch_spec(tmp_path, "api"))
    httpd = serve_http(herder)
    port = httpd.server_address[1]
    try:
        def get(path):
            return json.loads(
                urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10).read()
            )

        assert get("/connectors") == ["api-job"]
        assert get("/connectors/api-job")["sink"]["type"] == "parquet"
        assert get("/connectors/api-job/status")["state"] == "BATCH"
        with pytest.raises(urllib.error.HTTPError):
            get("/connectors/nope")
    finally:
        httpd.shutdown()


def test_rest_facade_mutations(spark, tmp_path, herder):
    """Connect worker API parity: PUT /connectors/<name>/config creates or
    reconfigures, DELETE /connectors/<name> removes; invalid config -> 400."""
    spark.createDataFrame([(1, "s")], ["id", "v"]).write.parquet(str(tmp_path / "src"))
    httpd = serve_http(herder)
    port = httpd.server_address[1]

    def call(method, path, body=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        return json.loads(urllib.request.urlopen(req, timeout=10).read())

    try:
        st = call("PUT", "/connectors/rest-job/config", _batch_spec(tmp_path, "rest"))
        assert st["state"] == "BATCH"
        assert call("GET", "/connectors") == ["rest-job"]
        assert herder.run_once("rest-job") == 1  # the stored config runs

        with pytest.raises(urllib.error.HTTPError) as e:
            call("PUT", "/connectors/bad/config", {"source": {"type": "nope"}})
        assert e.value.code == 400
        assert "bad" not in herder.list()  # fail-fast: nothing persisted

        assert call("DELETE", "/connectors/rest-job") == {"deleted": "rest-job"}
        assert herder.list() == []
        with pytest.raises(urllib.error.HTTPError):
            call("DELETE", "/connectors/rest-job")
    finally:
        httpd.shutdown()


def test_pause_resume_restart_lifecycle(spark, tmp_path, herder):
    """Connect target-state parity: pause stops the query but keeps the
    config (PAUSED, surviving reconfigure), resume restarts it, restart
    bounces it in place — driven through the REST facade."""
    spec = {
        "streaming": True,
        "source": {"type": "rate", "rows.per.second": 5},
        "sink": {
            "type": "parquet_stream",
            "path": str(tmp_path / "o1"),
            "checkpoint": str(tmp_path / "c1"),
        },
    }
    assert herder.put("pr", spec)["state"] == "RUNNING"
    httpd = serve_http(herder)
    port = httpd.server_address[1]

    def call(method, path, body=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
        )
        return json.loads(urllib.request.urlopen(req, timeout=10).read())

    try:
        assert call("PUT", "/connectors/pr/pause")["state"] == "PAUSED"
        assert "pr" in herder.list()  # config kept
        # reconfigure while paused: stays paused, no query started
        herder.put("pr", dict(spec))
        assert herder.status("pr")["state"] == "PAUSED"
        assert call("PUT", "/connectors/pr/resume")["state"] == "RUNNING"
        q1 = herder._queries["pr"]
        assert call("POST", "/connectors/pr/restart")["state"] == "RUNNING"
        assert herder._queries["pr"] is not q1 and not q1.isActive
        assert call("PUT", "/connectors/nope/pause")["state"] == "NOT_FOUND"
    finally:
        httpd.shutdown()


def test_config_validate_endpoint(spark, tmp_path, herder):
    """PUT /connector-plugins/<type>/config/validate: Connect's dry-run
    shape — valid spec returns error_count 0; an invalid one returns 200
    with per-field errors naming the missing option; unknown plugin type
    is a 404. Nothing is persisted or started either way."""
    spark.createDataFrame([(1, "s")], ["id", "v"]).write.parquet(str(tmp_path / "src"))
    httpd = serve_http(herder)
    port = httpd.server_address[1]

    def call(method, path, body=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        return json.loads(urllib.request.urlopen(req, timeout=10).read())

    try:
        good = _batch_spec(tmp_path, "val")
        res = call("PUT", "/connector-plugins/parquet/config/validate", good)
        assert res["error_count"] == 0 and res["name"] == "parquet"

        bad = {
            "source": {"type": "parquet"},  # missing path
            "transforms": [{"type": "mask_field"}],  # missing fields
            "sink": {"type": "nope"},
        }
        res = call("PUT", "/connector-plugins/parquet/config/validate", bad)
        assert res["error_count"] == 3
        fields = {c["value"]["name"]: c["value"]["errors"] for c in res["configs"]}
        assert "source.path" in fields and "path" in fields["source.path"][0]
        assert "transforms.0.fields" in fields
        assert "sink.type" in fields
        assert herder.list() == []  # dry run: nothing persisted

        with pytest.raises(urllib.error.HTTPError) as e:
            call("PUT", "/connector-plugins/not-a-plugin/config/validate", {})
        assert e.value.code == 404
    finally:
        httpd.shutdown()


def test_tasks_and_plugin_endpoints(spark, tmp_path, herder):
    """GET /connectors/<n>/tasks + /tasks/0/status + /connector-plugins:
    a running pipeline reports one task whose state tracks the query."""
    spec = {
        "streaming": True,
        "source": {"type": "rate", "rows.per.second": 5},
        "sink": {
            "type": "parquet_stream",
            "path": str(tmp_path / "o1"),
            "checkpoint": str(tmp_path / "c1"),
        },
    }
    assert herder.put("tk", spec)["state"] == "RUNNING"
    httpd = serve_http(herder)
    port = httpd.server_address[1]

    def get(path):
        return json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10).read()
        )

    try:
        tasks = get("/connectors/tk/tasks")
        assert tasks == [
            {
                "id": {"connector": "tk", "task": 0},
                "config": {"type": "rate", "rows.per.second": 5, "task.class": "pipeline"},
            }
        ]
        st = get("/connectors/tk/tasks/0/status")
        assert st["state"] == "RUNNING" and st["id"] == 0
        plugins = get("/connector-plugins")
        classes = {(p["class"], p["type"]) for p in plugins}
        assert ("parquet", "source") in classes
        assert ("mask_field", "transformation") in classes
        assert ("parquet_stream", "sink") in classes
        with pytest.raises(urllib.error.HTTPError):
            get("/connectors/nope/tasks")
        with pytest.raises(urllib.error.HTTPError):
            get("/connectors/tk/tasks/5/status")
    finally:
        httpd.shutdown()


def _multi_table_spec(tmp_path, tables, tasks_max):
    return {
        "source": {
            "type": "incremental",
            "path": str(tmp_path / "{table}.parquet"),
            "tables": tables,
            "tasks.max": tasks_max,
            "offset.column": "id",
            "state.dir": str(tmp_path / "state"),
        },
        "sink": {"type": "parquet", "path": str(tmp_path / "out" / "{table}")},
    }


def test_tasks_max_splits_whitelist(spark, tmp_path, herder):
    """tasks.max > 1: a 3-table whitelist over 2 tasks round-robins into
    groups of 2 and 1 (Connect JDBC connector's taskConfigs split;
    reference README.md:92 tasks.max)."""
    for t in ("ta", "tb", "tc"):
        spark.createDataFrame([(1, t)], ["id", "v"]).write.parquet(
            str(tmp_path / f"{t}.parquet")
        )
    herder.put("multi", _multi_table_spec(tmp_path, ["ta", "tb", "tc"], 2))
    tasks = herder.tasks("multi")
    assert [t["id"]["task"] for t in tasks] == [0, 1]
    groups = [t["config"]["tables"] for t in tasks]
    assert groups == [["ta", "tc"], ["tb"]]
    # every table lands in exactly one task
    assert sorted(sum(groups, [])) == ["ta", "tb", "tc"]
    # tasks.max larger than the whitelist clamps to one task per table
    herder.put("wide", _multi_table_spec(tmp_path, ["ta", "tb"], 8))
    assert len(herder.tasks("wide")) == 2
    st = herder.task_status("multi", 1)
    assert st["id"] == 1 and st["state"] == "UNASSIGNED"  # batch spec


def test_tasks_max_independent_offsets_survive_restart(spark, tmp_path):
    """Per-table offsets: each table's poll commits its own offset file;
    a NEW herder instance (restart) resumes every table from its own
    committed position — only the table that grew re-emits rows."""
    for t, n in (("ta", 2), ("tb", 3)):
        spark.createDataFrame(
            [(i, t) for i in range(1, n + 1)], ["id", "v"]
        ).write.parquet(str(tmp_path / f"{t}.parquet"))
    h1 = Herder(spark, str(tmp_path / "configs"))
    try:
        h1.put("mt", _multi_table_spec(tmp_path, ["ta", "tb"], 2))
        assert h1.run_once("mt") == 5  # 2 + 3, both tables drained
        assert h1.run_once("mt") == 0  # caught up
        for t in ("ta", "tb"):
            assert (tmp_path / "state" / t / "offset.json").exists()
        assert json.loads((tmp_path / "state" / "ta" / "offset.json").read_text())[
            "offset"
        ] == 2
        assert json.loads((tmp_path / "state" / "tb" / "offset.json").read_text())[
            "offset"
        ] == 3
    finally:
        h1.shutdown()
    # grow only ta, restart the herder: only ta's increment is emitted
    spark.createDataFrame([(7, "ta"), (8, "ta")], ["id", "v"]).write.mode(
        "append"
    ).parquet(str(tmp_path / "ta.parquet"))
    h2 = Herder(spark, str(tmp_path / "configs"))
    try:
        assert h2.run_once("mt") == 2
        assert json.loads((tmp_path / "state" / "ta" / "offset.json").read_text())[
            "offset"
        ] == 8
        assert json.loads((tmp_path / "state" / "tb" / "offset.json").read_text())[
            "offset"
        ] == 3
        # sink paths resolved per table
        assert spark.read.parquet(str(tmp_path / "out" / "ta")).count() == 4
        assert spark.read.parquet(str(tmp_path / "out" / "tb")).count() == 3
    finally:
        h2.shutdown()


def test_tasks_max_streaming_rejected(spark, tmp_path, herder):
    spec = _multi_table_spec(tmp_path, ["ta"], 2)
    spec["streaming"] = True
    with pytest.raises(ValueError, match="tables/tasks.max"):
        herder.put("bad-mt", spec)
    assert "bad-mt" not in herder.list()
