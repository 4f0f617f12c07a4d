from .formats import (  # noqa: F401
    parse_bulk_ndjson,
    parse_json_array,
    parse_logstash,
    parse_single,
)
