"""Event normalization: dynamic JSON event → fixed 10-column log row.

Pure DataFrame→DataFrame column transforms, shared verbatim between batch
and Structured Streaming (the core Spark win over the reference's per-request
Go loop, /root/reference/filebeat-to-ck/main.go:438-516). Everything here is
built-in Catalyst expressions — no Python UDFs — so the whole normalize stage
stays inside WholeStageCodegen at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .schema import CLICKHOUSE_DATETIME_FORMAT, TIMESTAMP_FORMATS


def parse_timestamp_expr(ts: Column, default: Column | None = None) -> Column:
    """Multi-format timestamp parse with ingest-time-now fallback.

    Mirrors GetTimestamp (main.go:86-112): try RFC3339, RFC3339Nano,
    millis-Z, plain ``yyyy-MM-dd HH:mm:ss``; missing/unparseable → now().
    ``try_to_timestamp`` yields NULL on mismatch (never throws, even under
    ANSI mode), so the coalesce chain IS the try-next-format loop.

    Pass ``default=F.lit(None)`` for a deterministic NULL fallback instead
    of ingest-time now (useful for oracle-checked batch queries).

    Two INTENTIONAL divergences from GetTimestamp:
    - offset-bearing inputs ('...T12:00:00+08:00') are normalized to the
      UTC instant (session tz is pinned UTC), where Go re-renders the
      event's own wall clock ('12:00:00'). Storing one canonical instant
      is what makes cross-timezone range predicates and time-partitioning
      correct at scale; the wall-clock form is derivable, the instant from
      a wall clock is not.
    - offset-less 'yyyy-MM-ddTHH:mm:ss' parses here (as UTC) while every Go
      format would reject it and fall back to now(); accepting the literal
      timestamp is strictly less lossy than replacing it with ingest time.
    """
    attempts = [F.try_to_timestamp(ts)]  # ISO-8601 family, fractional seconds, offsets
    attempts += [F.try_to_timestamp(ts, F.lit(fmt)) for fmt in TIMESTAMP_FORMATS]
    attempts = [a.cast("timestamp_ntz") for a in attempts]
    # Every Go format requires a full "date T/space time" prefix; Spark's
    # format-less parse is far more lenient (it accepts "12345" as a year),
    # so gate the chain on the shared shape of the reference's formats.
    shape = ts.rlike(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}")
    parsed = F.when(shape, F.coalesce(*attempts))
    if default is None:
        default = F.localtimestamp()  # TIMESTAMP_NTZ now(), like time.Now() at main.go:95,106
    return F.coalesce(parsed, default.cast("timestamp_ntz"))


def format_timestamp_expr(ts: Column) -> Column:
    """Render to the ClickHouse DateTime string form (main.go:455-456)."""
    return F.date_format(ts, CLICKHOUSE_DATETIME_FORMAT)


def _str_or_empty(c: Column) -> Column:
    """String column with the reference's DEFAULT '' (init.sql:9-18)."""
    return F.coalesce(c.cast("string"), F.lit(""))


def flatten_event(
    df: DataFrame,
    raw_col: str | None = None,
    ts_default: Column | None = None,
) -> DataFrame:
    """Project a parsed-event DataFrame to the 10-column log row.

    Expects the EVENT_SCHEMA columns at the top level (``@timestamp``,
    ``message``, ``container``, ``host``, ``docker``, ``agent``, ``log``;
    missing ones are treated as all-NULL). Reproduces the field mapping of
    writeToClickHouse (main.go:452-511):

    - ``container``: name, falling back to id (main.go:462-468)
    - ``raw_json``: the whole original event preserved losslessly
      (main.go:508-511) — the original wire line when ``raw_col`` is given,
      else ``to_json`` of all event columns.
    - every String column defaults to '' (init.sql:9-18)
    """
    cols = set(df.columns)

    def opt(path: str) -> Column:
        head, _, rest = path.partition(".")
        if head not in cols:
            return F.lit(None).cast("string")
        c = df[head]
        for field in rest.split(".") if rest else ():
            c = c[field]
        return c

    raw = F.col(raw_col) if raw_col else F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(
        parse_timestamp_expr(opt("@timestamp"), default=ts_default).alias("timestamp"),
        _str_or_empty(opt("message")).alias("message"),
        _str_or_empty(F.coalesce(opt("container.name"), opt("container.id"))).alias("container"),
        _str_or_empty(opt("host.name")).alias("host_name"),
        _str_or_empty(opt("docker.container.id")).alias("docker_container_id"),
        _str_or_empty(opt("docker.container.name")).alias("docker_container_name"),
        _str_or_empty(opt("agent.name")).alias("agent_name"),
        _str_or_empty(opt("agent.version")).alias("agent_version"),
        _str_or_empty(opt("log.file.path")).alias("log_file_path"),
        _str_or_empty(raw).alias("raw_json"),
    )


def normalize_events(df: DataFrame, raw_col: str | None = None, ts_default: Column | None = None) -> DataFrame:
    """Full normalize stage: parsed events → 10-column log rows.

    Batch and streaming share this function unchanged; in streaming it runs
    per micro-batch inside the same codegen'd stage as the JSON parse.
    """
    return flatten_event(df, raw_col=raw_col, ts_default=ts_default)


def with_month_partition(df: DataFrame, ts_col: str = "timestamp", out: str = "ym") -> DataFrame:
    """Monthly partition column, the Spark analog of MergeTree
    ``PARTITION BY toYYYYMM(timestamp)`` (init.sql:21). Writing
    ``partitionBy(out)`` gives Catalyst partition pruning on read."""
    return df.withColumn(out, F.date_format(F.col(ts_col), "yyyyMM"))


def with_day_index(df: DataFrame, ts_col: str = "timestamp", out: str = "day_index") -> DataFrame:
    """Daily index-name bucket, the analog of Filebeat's
    ``index: "filebeat-%{+yyyy.MM.dd}"`` (filebeat.yml:35)."""
    return df.withColumn(out, F.concat(F.lit("filebeat-"), F.date_format(F.col(ts_col), "yyyy.MM.dd")))
