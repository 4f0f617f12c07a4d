"""Schemas for the Filebeat event (input) and the normalized log row (output).

Input: the reference's ``FilebeatEvent`` struct
(/root/reference/filebeat-to-ck/main.go:72-83) — a permissive JSON document
with a few well-known keys. Unknown keys ("Extra", main.go:82) survive via
the preserved raw JSON string rather than a dynamic map (schema-on-read).

Output: the fixed 10-column ClickHouse table
(/root/reference/clickhouse-init/init.sql:7-23).
"""

from __future__ import annotations

from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# ---------------------------------------------------------------------------
# Input event schema (main.go:72-83; filebeat.yml:8-27)
# ---------------------------------------------------------------------------
EVENT_SCHEMA = StructType(
    [
        StructField("@timestamp", StringType()),
        StructField("message", StringType()),
        StructField("fields", MapType(StringType(), StringType())),
        StructField(
            "container",
            StructType([StructField("name", StringType()), StructField("id", StringType())]),
        ),
        StructField("host", StructType([StructField("name", StringType())])),
        StructField(
            "docker",
            StructType(
                [
                    StructField(
                        "container",
                        StructType([StructField("id", StringType()), StructField("name", StringType())]),
                    )
                ]
            ),
        ),
        StructField(
            "agent",
            StructType([StructField("name", StringType()), StructField("version", StringType())]),
        ),
        StructField(
            "log",
            StructType([StructField("file", StructType([StructField("path", StringType())]))]),
        ),
    ]
)

# ---------------------------------------------------------------------------
# Output log-row schema (init.sql:7-23) — DateTime + 9 × String
# ---------------------------------------------------------------------------
LOG_COLUMNS = (
    "timestamp",
    "message",
    "container",
    "host_name",
    "docker_container_id",
    "docker_container_name",
    "agent_name",
    "agent_version",
    "log_file_path",
    "raw_json",
)

LOG_ROW_SCHEMA = StructType(
    [StructField("timestamp", TimestampNTZType())]
    + [StructField(c, StringType()) for c in LOG_COLUMNS[1:]]
)

# Timestamp formats tried in order by the reference's GetTimestamp
# (main.go:86-112): RFC3339, RFC3339Nano, "…T….000Z", "…T…Z",
# "yyyy-MM-dd HH:mm:ss". Spark's try_to_timestamp returns NULL on mismatch,
# so a coalesce chain reproduces try-next-format semantics exactly.
TIMESTAMP_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",            # RFC3339 with offset / Z
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX",  # RFC3339Nano (nanos)
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",     # micros
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",        # millis ("….000Z")
    "yyyy-MM-dd HH:mm:ss",                 # plain datetime
)

# Rendered form for the ClickHouse DateTime column (main.go:455-456,
# Go layout "2006-01-02 15:04:05").
CLICKHOUSE_DATETIME_FORMAT = "yyyy-MM-dd HH:mm:ss"

# Bulk action keys recognized by the NDJSON classifier (main.go:284-288);
# all are treated as plain appends — the reference has no update/delete
# semantics.
BULK_ACTION_KEYS = ("index", "create", "update", "delete")
