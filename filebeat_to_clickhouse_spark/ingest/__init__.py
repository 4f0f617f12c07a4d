from .formats import (  # noqa: F401
    classify_lines,
    parse_bulk_actions,
    parse_bulk_ndjson,
    parse_json_array,
    parse_logstash,
    parse_single,
    replay_bulk_actions,
)
