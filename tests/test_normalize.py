"""Normalize-stage behavior pinned to the reference semantics
(/root/reference/filebeat-to-ck/main.go:86-112, 438-516)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from filebeat_to_clickhouse_spark.ingest import parse_single
from filebeat_to_clickhouse_spark.normalize import (
    format_timestamp_expr,
    normalize_events,
    parse_timestamp_expr,
    with_day_index,
    with_month_partition,
)
from filebeat_to_clickhouse_spark.schema import LOG_COLUMNS


def _parse_ts(spark, values, default_null=True):
    df = spark.createDataFrame([(v,) for v in values], "ts string")
    default = F.lit(None) if default_null else None
    out = df.select(parse_timestamp_expr(F.col("ts"), default=default).alias("p"))
    return [r.p for r in out.collect()]


def test_timestamp_formats_all_parse(spark):
    # the five format families of GetTimestamp (main.go:86-112)
    vals = [
        "2025-12-04T10:00:00Z",              # RFC3339 Z
        "2025-12-04T10:00:00+08:00",         # RFC3339 offset
        "2025-12-04T10:00:00.123456789Z",    # RFC3339Nano
        "2025-12-04T10:00:00.000Z",          # millis
        "2025-12-04 10:00:00",               # plain
    ]
    got = _parse_ts(spark, vals)
    assert got[0] == datetime.datetime(2025, 12, 4, 10, 0, 0)
    assert got[1] == datetime.datetime(2025, 12, 4, 2, 0, 0)  # +08:00 → UTC wall clock
    assert got[2] == datetime.datetime(2025, 12, 4, 10, 0, 0, 123456)
    assert got[3] == datetime.datetime(2025, 12, 4, 10, 0, 0)
    assert got[4] == datetime.datetime(2025, 12, 4, 10, 0, 0)


def test_timestamp_unparseable_falls_back(spark):
    # unparseable/missing → NULL with deterministic default, now() otherwise
    got = _parse_ts(spark, ["not a time", None])
    assert got == [None, None]
    got_now = _parse_ts(spark, ["not a time"], default_null=False)
    assert got_now[0] is not None  # ingest-time now(), like main.go:106-110


def test_timestamp_render_format(spark):
    df = spark.createDataFrame([("2025-12-04T10:02:03.456Z",)], "ts string")
    out = df.select(
        format_timestamp_expr(parse_timestamp_expr(F.col("ts"))).alias("s")
    ).collect()
    assert out[0].s == "2025-12-04 10:02:03"  # Go layout 2006-01-02 15:04:05


def test_flatten_full_event(spark):
    line = (
        '{"@timestamp":"2025-12-04T10:00:00Z","message":"m1",'
        '"container":{"name":"app","id":"cid"},"host":{"name":"server1"},'
        '"docker":{"container":{"id":"dcid","name":"dcname"}},'
        '"agent":{"name":"filebeat","version":"8.11.0"},'
        '"log":{"file":{"path":"/var/log/app.log"}},"custom_key":{"x":1}}'
    )
    df = spark.createDataFrame([(line,)], "value string")
    row = normalize_events(parse_single(df), raw_col="raw_json").collect()[0]
    assert list(row.asDict().keys()) == list(LOG_COLUMNS)
    assert row.timestamp == datetime.datetime(2025, 12, 4, 10, 0, 0)
    assert row.message == "m1"
    assert row.container == "app"          # name preferred (main.go:462-468)
    assert row.host_name == "server1"
    assert row.docker_container_id == "dcid"
    assert row.docker_container_name == "dcname"
    assert row.agent_name == "filebeat"
    assert row.agent_version == "8.11.0"
    assert row.log_file_path == "/var/log/app.log"
    assert '"custom_key"' in row.raw_json  # Extra catch-all preserved (main.go:82)


def test_flatten_defaults_and_container_fallback(spark):
    df = spark.createDataFrame(
        [('{"message":"only id","container":{"id":"cid9"}}',)], "value string"
    )
    row = normalize_events(parse_single(df), raw_col="raw_json").collect()[0]
    assert row.container == "cid9"        # id fallback (main.go:465-467)
    assert row.timestamp is not None      # missing @timestamp → ingest now()
    # every other string column defaults to '' (init.sql:9-18)
    for c in ("host_name", "docker_container_id", "docker_container_name",
              "agent_name", "agent_version", "log_file_path"):
        assert row[c] == ""


def test_partition_columns(spark):
    df = spark.createDataFrame([('{"@timestamp":"2025-12-04T10:00:00Z"}',)], "value string")
    out = with_day_index(with_month_partition(normalize_events(parse_single(df)))).collect()[0]
    assert out.ym == "202512"                       # toYYYYMM analog (init.sql:21)
    assert out.day_index == "filebeat-2025.12.04"   # filebeat.yml:35 analog
