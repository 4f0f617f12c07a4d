"""Wire-format parser behavior pinned to the reference handlers
(main.go:257-345 bulk, 348-380 direct JSON, 562-609 logstash) and the
fixture plan in FIXTURES.md §2/§5."""

from __future__ import annotations

from filebeat_to_clickhouse_spark.ingest import (
    parse_bulk_ndjson,
    parse_json_array,
    parse_logstash,
    parse_single,
)

BULK_BASIC = (
    '{"index":{}}\n'
    '{"@timestamp":"2025-12-04T10:00:00Z","message":"m1","container":{"name":"app"},"host":{"name":"server1"}}\n'
    '{"index":{}}\n'
    '{"@timestamp":"2025-12-04T10:01:00Z","message":"m2","container":{"name":"app"},"host":{"name":"server1"}}\n'
)

BULK_EDGE = (
    '{"index":{"_index":"filebeat-2025.12.04","_type":"_doc","_id":"abc"}}\n'
    '{"message":"after action"}\n'
    "\n"
    "this is junk, not json\n"
    '{"message":"bare document, no action line"}\n'
    '{"create":{}}\n'
    '{"message":"after create"}\n'
    '{"delete":{"_id":"x"}}\n'
    '{"update":{"_id":"y"}}\n'
    '{"@timestamp":12345,"message":"non-string ts"}\n'
)


def _df(spark, body: str):
    return spark.createDataFrame([(body,)], "value string")


def test_bulk_basic_pairs(spark):
    out = parse_bulk_ndjson(_df(spark, BULK_BASIC)).collect()
    assert [r.message for r in out] == ["m1", "m2"]
    assert out[0]["container"]["name"] == "app"


def test_bulk_edge_cases(spark):
    out = parse_bulk_ndjson(_df(spark, BULK_EDGE)).collect()
    # junk + blank skipped; action lines (all 4 verbs) skipped; bare docs kept
    assert [r.message for r in out] == [
        "after action",
        "bare document, no action line",
        "after create",
        "non-string ts",
    ]
    # non-string @timestamp: permissive schema coerces to the string "12345",
    # which no timestamp format matches → now() fallback downstream, matching
    # the reference's non-string-→-now() behavior (main.go:106-110)
    assert out[3]["@timestamp"] == "12345"
    assert '"@timestamp":12345' in out[3].raw_json.replace(" ", "")


def test_bulk_non_string_timestamp_gets_now_fallback(spark):
    from filebeat_to_clickhouse_spark.normalize import normalize_events

    rows = normalize_events(
        parse_bulk_ndjson(_df(spark, '{"@timestamp":12345,"message":"x"}\n')),
        raw_col="raw_json",
    ).collect()
    assert rows[0].timestamp is not None  # ingest-time now(), not a parse of 12345


def test_events_array(spark):
    body = '[{"message":"a"},{"message":"b","host":{"name":"h1"}}]'
    out = parse_json_array(_df(spark, body)).collect()
    assert [r.message for r in out] == ["a", "b"]
    assert out[1]["host"]["name"] == "h1"


def test_single_event(spark):
    body = '{"@timestamp": "2025-12-04T10:00:00Z", "message": "test log"}'
    out = parse_single(_df(spark, body)).collect()
    assert len(out) == 1 and out[0].message == "test log"
    assert out[0].raw_json == body


def test_single_rejects_non_object(spark):
    assert parse_single(_df(spark, "[1,2,3]")).count() == 0
    assert parse_single(_df(spark, "junk")).count() == 0


def test_logstash_three_way(spark):
    # array body
    arr = parse_logstash(_df(spark, '[{"message":"a1"},{"message":"a2"}]')).collect()
    assert [r.message for r in arr] == ["a1", "a2"]
    # typed single event
    one = parse_logstash(_df(spark, '{"message":"solo"}')).collect()
    assert [r.message for r in one] == ["solo"]
    # arbitrary JSON object (generic fallback → Extra only, main.go:588-597)
    gen = parse_logstash(_df(spark, '{"weird":"payload","n":3}')).collect()
    assert len(gen) == 1 and gen[0].message is None
    assert "weird" in gen[0].raw_json
    # junk skipped
    assert parse_logstash(_df(spark, "not json at all")).count() == 0


def test_consecutive_action_lines_both_classified_as_actions(spark):
    """GOLDEN pin of the documented stateless divergence (formats.py
    _is_action_line): the reference consumes the line AFTER an action
    unconditionally as the document (main.go:308+), so two adjacent
    action-shaped lines would feed the second to the document parser
    there; HERE both classify as actions and neither becomes an event.
    This test makes the choice permanent — a refactor that silently
    flips it must fail here and re-justify."""
    from filebeat_to_clickhouse_spark.ingest import parse_bulk_ndjson
    from filebeat_to_clickhouse_spark.ingest.formats import classify_lines

    body = (
        '{"index":{}}\n'
        '{"index":{"_index":"logs"}}\n'  # the ambiguous second action line
        '{"@timestamp":"2024-01-15T10:30:00Z","message":"real doc"}'
    )
    df = spark.createDataFrame([(body,)], "value string")
    out = parse_bulk_ndjson(df).collect()
    # only the real document parses; the second action line is NOT an event
    assert [r["message"] for r in out] == ["real doc"]
    classes = [
        (r["line"], r["line_class"]) for r in classify_lines(df).collect()
    ]
    assert [c for _, c in classes] == ["action", "action", "document"]


def test_document_with_action_named_field_is_a_document(spark):
    """A document whose JSON carries a top-level index/create/update/delete
    key must not be swallowed as an action line — only the exact ES bulk
    action shape (a single action-verb key) classifies as action."""
    from filebeat_to_clickhouse_spark.ingest import parse_bulk_ndjson
    from filebeat_to_clickhouse_spark.ingest.formats import classify_lines

    body = "\n".join([
        '{"index":{"_index":"filebeat-x"}}',
        '{"@timestamp":"2024-01-15T10:30:00Z","message":"doc with index field","index":5}',
        '{"delete":{"_id":"1"}}',
        '{"message":"doc whose only key is an action verb is the ambiguous case"}',
    ])
    df = spark.createDataFrame([(body,)], "value string")
    msgs = {r["message"] for r in parse_bulk_ndjson(df).collect()}
    assert "doc with index field" in msgs
    classes = [r["line_class"] for r in classify_lines(df).collect()]
    assert classes == ["action", "document", "action", "document"]


class TestBulkActionReplay:
    def _paired(self, spark, body, seq=1):
        from filebeat_to_clickhouse_spark.ingest.formats import parse_bulk_actions

        df = spark.createDataFrame([(body, seq)], "value string, body_seq bigint")
        return parse_bulk_actions(df)

    def test_pairing_and_delete_consumes_no_line(self, spark):
        body = (
            '{"index":{"_id":"a"}}\n{"message":"m1"}\n'
            '{"delete":{"_id":"a"}}\n'
            '{"create":{"_id":"b"}}\n{"message":"m2"}'
        )
        rows = sorted(self._paired(spark, body).collect(), key=lambda r: r["seq"])
        assert [(r["verb"], r["action_id"]) for r in rows] == [
            ("index", "a"), ("delete", "a"), ("create", "b")
        ]
        assert rows[0]["doc_line"] == '{"message":"m1"}'
        assert rows[1]["doc_line"] is None  # delete pairs with the NEXT action, i.e. nothing
        assert rows[2]["doc_line"] == '{"message":"m2"}'

    def test_last_writer_wins_and_delete_absents(self, spark):
        from filebeat_to_clickhouse_spark.ingest.formats import replay_bulk_actions

        body = (
            '{"index":{"_id":"a"}}\n{"message":"v1"}\n'
            '{"update":{"_id":"a"}}\n{"message":"v2"}\n'
            '{"index":{"_id":"b"}}\n{"message":"w1"}\n'
            '{"delete":{"_id":"b"}}'
        )
        out = {r["action_id"]: r for r in replay_bulk_actions(self._paired(spark, body)).collect()}
        assert out["a"]["present"] and out["a"]["last_message"] == "v2"
        assert out["a"]["n_ops"] == 2 and out["a"]["last_verb"] == "update"
        assert not out["b"]["present"] and out["b"]["last_message"] is None
        assert out["b"]["last_verb"] == "delete"


class TestBulkActionPartialUpdate:
    def _replay(self, spark, body):
        from filebeat_to_clickhouse_spark.ingest.formats import (
            parse_bulk_actions,
            replay_bulk_actions_partial,
        )

        df = spark.createDataFrame([(body, 1)], "value string, body_seq bigint")
        out = replay_bulk_actions_partial(parse_bulk_actions(df)).collect()
        state = {}
        for r in out:
            state.setdefault(r["action_id"], {})[r["field"]] = r["value"]
        return state

    def test_update_merges_fields_shallowly(self, spark):
        body = (
            '{"index":{"_id":"a"}}\n{"message":"m1","host":"h1"}\n'
            '{"update":{"_id":"a"}}\n{"doc":{"message":"m2"}}\n'
            '{"update":{"_id":"a"}}\n{"doc":{"note":"n1"}}'
        )
        # message overlaid, host untouched, note added — the ES partial form
        assert self._replay(spark, body) == {
            "a": {"message": "m2", "host": "h1", "note": "n1"}
        }

    def test_index_after_update_replaces_wholesale(self, spark):
        body = (
            '{"index":{"_id":"a"}}\n{"message":"m1"}\n'
            '{"update":{"_id":"a"}}\n{"doc":{"note":"n1"}}\n'
            '{"index":{"_id":"a"}}\n{"message":"m3"}'
        )
        # the re-index wipes the merged note: full replacement semantics
        assert self._replay(spark, body) == {"a": {"message": "m3"}}

    def test_update_after_delete_upserts_from_partial(self, spark):
        body = (
            '{"index":{"_id":"a"}}\n{"message":"m1","host":"h1"}\n'
            '{"delete":{"_id":"a"}}\n'
            '{"update":{"_id":"a"}}\n{"doc":{"note":"n1"}}\n'
            '{"delete":{"_id":"b"}}\n'
            '{"index":{"_id":"c"}}\n{"message":"mc"}\n'
            '{"delete":{"_id":"c"}}'
        )
        got = self._replay(spark, body)
        # a: doc_as_upsert from the partial alone (pre-delete fields gone);
        # b, c: deleted ids emit no rows at all
        assert got == {"a": {"note": "n1"}}

    def test_update_only_id_upserts(self, spark):
        body = '{"update":{"_id":"x"}}\n{"doc":{"message":"m"}}'
        assert self._replay(spark, body) == {"x": {"message": "m"}}

    def test_auto_id_docs_each_survive(self, spark):
        """'{"index":{}}' — the id-less form Filebeat itself sends —
        creates a NEW document per action (ES auto-generates the id), so
        none of them may collapse together or vanish through the NULL-key
        join; an id-less delete is invalid in ES and is dropped."""
        body = (
            '{"index":{}}\n{"message":"auto1"}\n'
            '{"index":{}}\n{"message":"auto2"}\n'
            '{"create":{}}\n{"message":"auto3"}\n'
            '{"delete":{}}'
        )
        got = self._replay(spark, body)
        assert sorted(v["message"] for v in got.values()) == ["auto1", "auto2", "auto3"]
        assert len(got) == 3 and None not in got

    def test_auto_id_docs_each_survive_full_replacement(self, spark):
        from filebeat_to_clickhouse_spark.ingest.formats import replay_bulk_actions

        body = (
            '{"index":{}}\n{"message":"auto1"}\n'
            '{"index":{}}\n{"message":"auto2"}\n'
            '{"index":{"_id":"a"}}\n{"message":"named"}'
        )
        df = spark.createDataFrame([(body, 1)], "value string, body_seq bigint")
        from filebeat_to_clickhouse_spark.ingest.formats import parse_bulk_actions

        out = replay_bulk_actions(parse_bulk_actions(df)).collect()
        assert sorted(r["last_message"] for r in out) == ["auto1", "auto2", "named"]
        assert all(r["action_id"] is not None for r in out)
