"""Streaming layer: receiver wire-compat, spool→parquet end-to-end,
windowed rates, streaming dedup, ClickHouse sink encoding."""

from __future__ import annotations

import json
import os
import urllib.request

import pyspark.sql.functions as F
import pytest

BULK_BODY = "\n".join(
    [
        '{"index":{"_index":"filebeat-2025.12.04"}}',
        '{"@timestamp":"2025-12-04T10:30:00.000Z","message":"m1","container":{"name":"app","id":"c1"},"host":{"name":"h1"}}',
        '{"index":{}}',
        '{"@timestamp":"2025-12-04T10:31:00Z","message":"m2","container":{"id":"c2"}}',
        "junk line",
        '{"@timestamp":"2025-12-04 10:32:00","message":"m3"}',
    ]
)


def _post(url: str, body: str) -> dict:
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


@pytest.fixture()
def receiver(tmp_path):
    from filebeat_to_clickhouse_spark.streaming import SpoolReceiver

    with SpoolReceiver(str(tmp_path / "spool")) as rx:
        yield rx


class TestReceiver:
    def test_health(self, receiver):
        with urllib.request.urlopen(f"http://127.0.0.1:{receiver.port}/health") as r:
            payload = json.loads(r.read())
        assert payload["status"] == "ok"

    def test_bulk_routes_and_ack(self, receiver):
        base = f"http://127.0.0.1:{receiver.port}"
        for route in ("/_bulk", "/filebeat-2025.12.04/_bulk", "/idx/_doc/_bulk"):
            ack = _post(base + route, BULK_BODY)
            assert ack["errors"] is False
        files = os.listdir(os.path.join(receiver.spool_dir, "bulk"))
        assert len(files) == 3 and all(f.endswith(".body") for f in files)

    def test_bulk_ack_items_array_es_conformant(self):
        from filebeat_to_clickhouse_spark.streaming.receiver import bulk_ack

        body = (
            '{"index":{"_index":"logs","_id":"a1"}}\n'
            '{"message":"m1"}\n'
            '{"delete":{"_id":"a1"}}\n'
            '{"update":{"_id":"a2"}}\n'
            '{"message":"m2"}\n'
            "not json\n"
            '{"message":"bare doc"}'
        ).encode()
        ack = bulk_ack(body)
        # took counts document lines (reference semantics); items is a REAL
        # per-action array (ES semantics), statuses 201 create / 200 mutate
        assert ack["took"] == 3 and ack["errors"] is False
        assert ack["items"] == [
            {"index": {"status": 201, "_id": "a1", "_index": "logs"}},
            {"delete": {"status": 200, "_id": "a1"}},
            {"update": {"status": 200, "_id": "a2"}},
        ]

    def test_format_routing(self, receiver):
        base = f"http://127.0.0.1:{receiver.port}"
        _post(base + "/logstash", '{"message":"ls"}')
        _post(base + "/", '[{"message":"arr"}]')
        _post(base + "/events", '[{"message":"ev"}]')
        _post(base + "/ingest", '{"message":"one"}')
        counts = {
            fmt: len(os.listdir(os.path.join(receiver.spool_dir, fmt)))
            for fmt in ("bulk", "logstash", "events", "single")
        }
        assert counts == {"bulk": 0, "logstash": 2, "events": 1, "single": 1}

    def test_malformed_content_length_replies_400(self, receiver):
        """A garbage Content-Length must get an HTTP 400 reply, not a
        dropped connection: socketserver would contain the ValueError
        (server survives either way), but the client deserves the status
        code the reference's handlers answer with."""
        import socket as _socket

        for bad in (b"nonsense", b"-1"):
            with _socket.create_connection(("127.0.0.1", receiver.port), timeout=5) as s:
                s.sendall(
                    b"POST /_bulk HTTP/1.1\r\nHost: x\r\n"
                    b"Content-Length: " + bad + b"\r\n\r\n"
                )
                reply = s.recv(4096)
            assert b" 400 " in reply.split(b"\r\n", 1)[0], bad
        # and the server is still serving
        with urllib.request.urlopen(f"http://127.0.0.1:{receiver.port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"


class TestSpoolPipeline:
    def test_spool_to_parquet_end_to_end(self, spark, tmp_path, receiver):
        from filebeat_to_clickhouse_spark.streaming import run_spool_to_parquet

        base = f"http://127.0.0.1:{receiver.port}"
        _post(base + "/_bulk", BULK_BODY)
        _post(base + "/_bulk", BULK_BODY.replace("10:3", "11:3"))

        out = str(tmp_path / "out")
        q = run_spool_to_parquet(
            spark, receiver.spool_dir, out, str(tmp_path / "ckpt"), fmt="bulk"
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == 6  # 3 docs per body, junk+actions skipped
        assert set(got.columns) >= {"timestamp", "message", "container", "raw_json", "ym"}
        assert got.filter(F.col("container") == "app").count() == 2  # name over id
        assert got.filter(F.col("container") == "c2").count() == 2  # id fallback
        # restart with same checkpoint: no new input → no duplicate rows
        q2 = run_spool_to_parquet(
            spark, receiver.spool_dir, out, str(tmp_path / "ckpt"), fmt="bulk"
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(out).count() == 6

    def test_windowed_rate(self, spark, tmp_path, receiver):
        from filebeat_to_clickhouse_spark.streaming import (
            log_rate_per_window,
            spooled_log_stream,
        )

        _post(f"http://127.0.0.1:{receiver.port}/_bulk", BULK_BODY)
        rates = log_rate_per_window(
            spooled_log_stream(spark, receiver.spool_dir, "bulk"), window="1 minute"
        )
        # complete mode: append would hold back windows the watermark hasn't
        # passed, and a drained availableNow run never passes the last one.
        q = (
            rates.writeStream.format("memory")
            .queryName("rates_t")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"].minute, r["container"]): r["n_events"]
            for r in spark.sql("SELECT * FROM rates_t").collect()
        }
        assert got == {(30, "app"): 1, (31, "c2"): 1, (32, ""): 1}

    def test_streaming_dedup(self, spark, tmp_path, receiver):
        from filebeat_to_clickhouse_spark.streaming import (
            spooled_log_stream,
            streaming_dedup,
        )

        base = f"http://127.0.0.1:{receiver.port}"
        _post(base + "/_bulk", BULK_BODY)
        _post(base + "/_bulk", BULK_BODY)  # exact replay
        deduped = streaming_dedup(spooled_log_stream(spark, receiver.spool_dir, "bulk"))
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .start()
        )
        q.awaitTermination(120)
        assert spark.sql("SELECT count(*) n FROM dedup_t").collect()[0]["n"] == 3


class TestClickHouseSink:
    def test_insert_url_and_body(self):
        from filebeat_to_clickhouse_spark.streaming import (
            clickhouse_insert_url,
            rows_to_jsoneachrow,
        )

        url = clickhouse_insert_url("ch-host", 8123, "logs", "logs_table")
        assert url == (
            "http://ch-host:8123/?query="
            "INSERT%20INTO%20logs.logs_table%20FORMAT%20JSONEachRow"
        )
        body = rows_to_jsoneachrow(
            [{"timestamp": "2025-12-04 10:30:00", "message": "m1"}, {"message": "m²"}]
        )
        lines = body.decode().split("\n")
        assert len(lines) == 2
        assert json.loads(lines[0])["timestamp"] == "2025-12-04 10:30:00"
        assert json.loads(lines[1])["message"] == "m²"

    def test_foreach_batch_posts_from_executors(self, spark):
        """End-to-end against a local capture server standing in for the
        ClickHouse HTTP interface (the POST happens in executor-side Python
        workers — a real socket is the only seam that crosses processes)."""
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        hits: list[tuple[str, bytes, str]] = []

        class Capture(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                hits.append(
                    (self.path, self.rfile.read(n), self.headers.get("Authorization", ""))
                )
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Capture)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            batch = spark.createDataFrame([("2025-12-04T10:30:00",)], "ts string").select(
                F.col("ts").cast("timestamp_ntz").alias("timestamp"),
                F.lit("m").alias("message"),
            )
            fn = sink_mod.foreach_batch_clickhouse_http(
                host="127.0.0.1", port=srv.server_address[1]
            )
            fn(batch.coalesce(1), 0)
        finally:
            srv.shutdown()
            srv.server_close()
        (path, body, auth), = hits
        assert "INSERT%20INTO%20logs.logs_table%20FORMAT%20JSONEachRow" in path
        assert auth.startswith("Basic ")
        assert json.loads(body.decode()) == {
            "timestamp": "2025-12-04 10:30:00",
            "message": "m",
        }


class TestClickHouseIdempotentSink:
    def test_replayed_batch_deduplicated_by_token(self, spark):
        """at-least-once replay safety (SURVEY §7.4 delta): the same
        micro-batch delivered twice must store once. The capture server
        honors insert_deduplication_token exactly like ClickHouse's
        non-replicated dedup window: an already-seen token's insert is
        acknowledged but not stored."""
        import threading
        import urllib.parse as up
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        stored: list[str] = []
        seen_tokens: set[str] = set()
        all_tokens: list[str] = []
        lock = threading.Lock()

        class DedupCapture(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode()
                q = up.parse_qs(up.urlparse(self.path).query)
                token = q.get("insert_deduplication_token", [None])[0]
                with lock:
                    if token is not None:
                        all_tokens.append(token)
                    if token is None or token not in seen_tokens:
                        if token is not None:
                            seen_tokens.add(token)
                        stored.extend(line for line in body.splitlines() if line)
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        srv = ThreadingHTTPServer(("127.0.0.1", 0), DedupCapture)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            batch = spark.createDataFrame(
                [(i, f"m{i}") for i in range(8)], "event_id long, message string"
            ).repartition(2)
            fn = sink_mod.foreach_batch_clickhouse_http(
                host="127.0.0.1",
                port=srv.server_address[1],
                idempotent=True,
                batch_id_col="_batch_id",
            )
            fn(batch, 7)
            fn(batch, 7)  # the replay: same epoch, same data
        finally:
            srv.shutdown()
            srv.server_close()

        rows = [json.loads(line) for line in stored]
        assert len(rows) == 8, f"replay duplicated rows: {len(rows)}"
        assert {r["message"] for r in rows} == {f"m{i}" for i in range(8)}
        # every row carries the ReplacingMergeTree fallback key
        assert all(r["_batch_id"] == 7 for r in rows)
        # tokens are deterministic across the replay: second delivery
        # presented the SAME token set, which is what made dedup possible
        n = len(all_tokens)
        assert n % 2 == 0 and sorted(all_tokens[: n // 2]) == sorted(all_tokens[n // 2 :])
        assert all(t.startswith("fbck-7-") for t in all_tokens)

    def test_distinct_epochs_not_deduplicated(self, spark):
        """Token scope is (epoch, partition): a genuinely new micro-batch
        must never collide with a previous epoch's tokens."""
        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        tokens: list[str] = []
        import threading
        import urllib.parse as up
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        class Capture(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                self.rfile.read(n)
                q = up.parse_qs(up.urlparse(self.path).query)
                tokens.append(q["insert_deduplication_token"][0])
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Capture)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            batch = spark.createDataFrame([(1, "a")], "event_id long, message string").coalesce(1)
            fn = sink_mod.foreach_batch_clickhouse_http(
                host="127.0.0.1", port=srv.server_address[1], idempotent=True
            )
            fn(batch, 1)
            fn(batch, 2)
        finally:
            srv.shutdown()
            srv.server_close()
        assert len(tokens) == 2 and tokens[0] != tokens[1]


class TestParquetIdempotentSink:
    """Exactly-once parquet delivery (the last delivery-semantics gap from
    the r3 verdict): epoch staging + epoch-tagged install + commit marker
    makes a replayed micro-batch a no-op, mirroring the ClickHouse sink's
    token dedup test above."""

    @staticmethod
    def _batch(spark, n=6, month="2025-12"):
        return spark.createDataFrame(
            [(f"{month}-04T10:{i:02d}:00", f"m{i}") for i in range(n)],
            "ts string, message string",
        ).select(
            F.col("ts").cast("timestamp_ntz").alias("timestamp"),
            "message",
        ).repartition(2)

    def test_replayed_epoch_writes_once(self, spark, tmp_path):
        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        out = str(tmp_path / "logs")
        fn = sink_mod.foreach_batch_parquet(out, idempotent=True)
        batch = self._batch(spark)
        fn(batch, 0)
        fn(batch, 0)  # the replay: same epoch, same data
        got = spark.read.parquet(out)
        assert got.count() == 6
        assert {r.message for r in got.collect()} == {f"m{i}" for i in range(6)}
        # a genuinely new epoch still appends
        fn(self._batch(spark, n=3, month="2026-01"), 1)
        assert spark.read.parquet(out).count() == 9
        # and both months landed as prunable ym= partitions
        assert {str(r.ym) for r in spark.read.parquet(out).select("ym").distinct().collect()} == {
            "202512", "202601",
        }

    def test_crash_mid_install_replay_heals(self, spark, tmp_path):
        """Crash after installing files but BEFORE the commit marker: the
        replay must delete the partial epoch files and reinstall — exactly
        once, no duplicates, no loss."""
        import os

        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        out = str(tmp_path / "logs")
        fn = sink_mod.foreach_batch_parquet(out, idempotent=True)
        batch = self._batch(spark)
        fn(batch, 5)
        os.remove(os.path.join(out, "_epochs", "5"))  # simulate the crash
        fn(batch, 5)  # replay re-installs over the partial
        got = spark.read.parquet(out)
        assert got.count() == 6
        assert {r.message for r in got.collect()} == {f"m{i}" for i in range(6)}

    def test_epoch_id_prefix_no_collision(self, spark, tmp_path):
        """Epoch 1's cleanup glob must not eat epoch 10's files."""
        import os

        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        out = str(tmp_path / "logs")
        fn = sink_mod.foreach_batch_parquet(out, idempotent=True)
        fn(self._batch(spark, n=2), 10)
        fn(self._batch(spark, n=2), 1)
        os.remove(os.path.join(out, "_epochs", "1"))
        fn(self._batch(spark, n=2), 1)  # replay of 1 must leave 10 intact
        assert spark.read.parquet(out).count() == 4

    def test_default_append_documents_at_least_once(self, spark, tmp_path):
        """The non-idempotent default really is at-least-once: a replay
        duplicates — which is why the ladder exists."""
        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        out = str(tmp_path / "logs")
        fn = sink_mod.foreach_batch_parquet(out)
        batch = self._batch(spark, n=2)
        fn(batch, 0)
        fn(batch, 0)
        assert spark.read.parquet(out).count() == 4

    def test_sink_id_namespaces_shared_table_epochs(self, spark, tmp_path):
        """Two queries sharing one output table each number their own
        epochs from 0: without sink_id namespacing, query B's epoch 0
        would see query A's ``_epochs/0`` marker and silently drop its
        whole micro-batch."""
        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        out = str(tmp_path / "logs")
        fn_a = sink_mod.foreach_batch_parquet(out, idempotent=True, sink_id="bulk")
        fn_b = sink_mod.foreach_batch_parquet(out, idempotent=True, sink_id="single")
        fn_a(self._batch(spark, n=2), 0)
        fn_b(self._batch(spark, n=3, month="2026-01"), 0)  # same epoch id
        assert spark.read.parquet(out).count() == 5
        # replays still dedup within each query's own namespace
        fn_a(self._batch(spark, n=2), 0)
        fn_b(self._batch(spark, n=3, month="2026-01"), 0)
        assert spark.read.parquet(out).count() == 5

    def test_concurrent_appends_one_path_serialized(self, spark, tmp_path):
        """build_service's shape: several queries foreachBatch-appending to
        ONE parquet path. Unserialized, concurrent jobs race on the shared
        ``<path>/_temporary/0`` staging (one job's commit deletes the
        other's in-flight files). The per-path driver lock must make this
        reliable."""
        import threading

        from filebeat_to_clickhouse_spark.streaming import sink as sink_mod

        out = str(tmp_path / "logs")
        fns = [sink_mod.foreach_batch_parquet(out, sink_id=s) for s in ("a", "b", "c")]
        errs = []

        def run(fn, epoch):
            try:
                fn(self._batch(spark, n=4), epoch)
            except Exception as e:  # noqa: BLE001 — recorded for the assert
                errs.append(e)

        threads = [
            threading.Thread(target=run, args=(fn, e))
            for e in range(3)
            for fn in fns
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs[:1]
        assert spark.read.parquet(out).count() == 4 * 9


class TestStatefulSessions:
    def test_sessionize_stream(self, spark, tmp_path):
        """Three micro-batches (maxFilesPerTrigger=1): sessions close both
        in-stream (gap exceeded by a newer event) and by event-time timeout
        (watermark passes end + gap)."""
        import os
        import time

        from filebeat_to_clickhouse_spark.streaming.sessions import sessionize_stream

        src = tmp_path / "src"
        src.mkdir()
        files = [
            # user 1: two events 5 min apart; user 2: one event
            '{"user_id":1,"ts":"2024-01-01T10:00:00"}\n'
            '{"user_id":1,"ts":"2024-01-01T10:05:00"}\n'
            '{"user_id":2,"ts":"2024-01-01T10:00:00"}\n',
            # user 1 again after >30 min -> closes session in-stream
            '{"user_id":1,"ts":"2024-01-01T12:00:00"}\n',
            # unrelated user far later -> watermark passes user 2's timeout
            '{"user_id":9,"ts":"2024-01-01T13:00:00"}\n',
        ]
        for i, content in enumerate(files):
            p = src / f"f{i}.json"
            p.write_text(content)
            os.utime(p, (time.time() + i, time.time() + i))

        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("memory")
            .queryName("sessions_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["session_start"].isoformat(), r["session_end"].isoformat(), r["n_events"])
            for r in spark.sql("SELECT * FROM sessions_t").collect()
        }
        # closed in-stream: user 1's first session (12:00 event exceeds gap)
        assert (1, "2024-01-01T10:00:00", "2024-01-01T10:05:00", 2) in got
        # closed by event-time timeout once the watermark passed end + gap
        assert (2, "2024-01-01T10:00:00", "2024-01-01T10:00:00", 1) in got
        assert (1, "2024-01-01T12:00:00", "2024-01-01T12:00:00", 1) in got
        # user 9's session (timeout 13:30 > final watermark 13:00) stays open
        assert all(u != 9 for u, *_ in got)
        assert len(got) == 3


class TestDeadLetter:
    def test_junk_lines_routed_not_dropped(self, spark, tmp_path, receiver):
        from filebeat_to_clickhouse_spark.streaming import run_spool_to_parquet

        _post(f"http://127.0.0.1:{receiver.port}/_bulk", BULK_BODY)  # 1 junk line
        out, dl = str(tmp_path / "out"), str(tmp_path / "dl")
        q = run_spool_to_parquet(
            spark, receiver.spool_dir, out, str(tmp_path / "ck_dl"),
            fmt="bulk", dead_letter_path=dl,
        )
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == 3  # documents still land
        dead = spark.read.parquet(dl).collect()
        assert len(dead) == 1 and dead[0]["line"] == "junk line"


class TestStreamStaticEnrichment:
    def test_broadcast_dim_join_in_flight(self, spark, tmp_path, receiver):
        from filebeat_to_clickhouse_spark.streaming import enrich_stream, spooled_log_stream

        _post(f"http://127.0.0.1:{receiver.port}/_bulk", BULK_BODY)
        dim = spark.createDataFrame(
            [("h1", "prod", "us-east")], "host_name string, env string, region string"
        )
        enriched = enrich_stream(spooled_log_stream(spark, receiver.spool_dir, "bulk"), dim)
        q = (
            enriched.writeStream.format("memory")
            .queryName("enrich_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck_e"))
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["host_name"], r["env"]) for r in spark.sql("SELECT host_name, env FROM enrich_t").collect()
        }
        assert ("h1", "prod") in got          # matched row enriched
        assert ("", None) in got              # unmatched rows keep NULL dims


class TestServiceAssembly:
    def test_build_service_end_to_end(self, spark, tmp_path):
        """The __main__ service shape: config → receiver + per-format
        streams → parquet sink, drained with --once semantics."""
        from filebeat_to_clickhouse_spark.__main__ import build_service
        from filebeat_to_clickhouse_spark.config import PipelineConfig

        cfg = PipelineConfig()
        cfg.server.host, cfg.server.port = "127.0.0.1", 0
        cfg.spool_dir = str(tmp_path / "spool")
        cfg.checkpoint_dir = str(tmp_path / "ck")
        out = str(tmp_path / "logs_table")

        receiver, queries = build_service(cfg, "parquet", out, once=True, spark=spark)
        try:
            base = f"http://127.0.0.1:{receiver.port}"
            _post(base + "/_bulk", BULK_BODY)           # 3 docs
            _post(base + "/ingest", '{"message":"single one"}')
            _post(base + "/events", '[{"message":"arr1"},{"message":"arr2"}]')
            # restart the availableNow streams so the post-start files drain
            for q in queries:
                q.awaitTermination(120)
            receiver2, queries2 = build_service(cfg, "parquet", out, once=True, spark=spark)
            try:
                for q in queries2:
                    q.awaitTermination(120)
            finally:
                receiver2.stop()
        finally:
            receiver.stop()
        got = spark.read.parquet(out)
        assert got.count() == 6
        msgs = {r["message"] for r in got.select("message").collect()}
        assert {"single one", "arr1", "arr2"} <= msgs

    def test_build_service_clickhouse_sink(self, spark, tmp_path):
        """Service with the ClickHouse sink: receiver → stream → executor
        POSTs, captured by a local stand-in server."""
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from filebeat_to_clickhouse_spark.__main__ import build_service
        from filebeat_to_clickhouse_spark.config import PipelineConfig

        hits: list[bytes] = []

        class Capture(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                hits.append(self.rfile.read(int(self.headers.get("Content-Length", 0))))
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Capture)
        threading.Thread(target=srv.serve_forever, daemon=True).start()

        cfg = PipelineConfig()
        cfg.server.host, cfg.server.port = "127.0.0.1", 0
        cfg.spool_dir = str(tmp_path / "spool")
        cfg.checkpoint_dir = str(tmp_path / "ck")
        cfg.clickhouse.host, cfg.clickhouse.port = "127.0.0.1", srv.server_address[1]

        receiver, queries = build_service(cfg, "clickhouse", "", once=True, spark=spark)
        try:
            _post(f"http://127.0.0.1:{receiver.port}/ingest",
                  '{"@timestamp":"2025-12-04T10:30:00Z","message":"to-ch"}')
            r2, q2 = build_service(cfg, "clickhouse", "", once=True, spark=spark)
            try:
                for q in queries + q2:
                    q.awaitTermination(120)
            finally:
                r2.stop()
        finally:
            receiver.stop()
            srv.shutdown()
            srv.server_close()
        lines = [json.loads(l) for b in hits for l in b.decode().splitlines()]
        assert any(l.get("message") == "to-ch" and l.get("timestamp") == "2025-12-04 10:30:00"
                   for l in lines)


class TestKafkaSource:
    """C2: no spark-sql-kafka package and no broker in this sandbox, so the
    source itself cannot run here. What CAN be pinned: (a) the projection
    that turns Kafka records into parser input, exercised on records with
    the exact Kafka source schema, through the full bulk-parse + normalize
    pipeline; (b) the failure mode when the package is absent."""

    def test_kafka_shaped_records_flow_through_ingest(self, spark):
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.ingest import parse_bulk_ndjson
        from filebeat_to_clickhouse_spark.normalize import normalize_events
        from filebeat_to_clickhouse_spark.streaming.sources import (
            KAFKA_RECORD_SCHEMA,
            kafka_value_strings,
        )

        body = (
            '{"index":{}}\n'
            '{"@timestamp":"2024-01-15T10:30:00Z","message":"from kafka","host":{"name":"k1"}}'
        )
        import datetime

        rows = [
            (b"k0", body.encode(), "logs", 0, 42, datetime.datetime(2024, 1, 15), 0),
            (None, b"not json at all", "logs", 1, 43, datetime.datetime(2024, 1, 15), 0),
        ]
        raw = spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)
        out = normalize_events(
            parse_bulk_ndjson(kafka_value_strings(raw)), raw_col="raw_json"
        ).collect()
        assert [r["message"] for r in out] == ["from kafka"]
        assert out[0]["host_name"] == "k1"

    def test_missing_package_fails_at_plan_build_with_clear_error(self, spark):
        import pytest
        from pyspark.errors.exceptions.captured import AnalysisException

        from filebeat_to_clickhouse_spark.streaming.sources import stream_kafka

        with pytest.raises(AnalysisException, match="kafka"):
            stream_kafka(spark, "localhost:9092", "logs")

    def test_kafka_end_to_end_when_broker_available(self, spark, tmp_path):
        """REAL e2e: produce → stream_kafka → bulk-parse → normalize →
        parquet. Gated on an actual broker (SPARK_GRAFT_KAFKA_BOOTSTRAP) +
        the spark-sql-kafka package: it SKIPS visibly when either is
        absent — never silently passes (r2 verdict item 6)."""
        import os
        import uuid

        import pytest

        from filebeat_to_clickhouse_spark.ingest import parse_bulk_ndjson
        from filebeat_to_clickhouse_spark.normalize import normalize_events
        from filebeat_to_clickhouse_spark.streaming.sources import stream_kafka

        servers = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
        if not servers:
            pytest.skip(
                "no Kafka broker (set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port "
                "and provide spark-sql-kafka on the classpath)"
            )
        topic = f"fbck-e2e-{uuid.uuid4().hex[:8]}"
        body = (
            '{"index":{}}\n'
            '{"@timestamp":"2024-01-15T10:30:00Z","message":"kafka e2e","host":{"name":"k1"}}'
        )
        try:
            (
                spark.createDataFrame([(body,)], "value string")
                .selectExpr("CAST(value AS BINARY) AS value")
                .write.format("kafka")
                .option("kafka.bootstrap.servers", servers)
                .option("topic", topic)
                .save()
            )
        except Exception as e:  # package missing despite env var → still a skip, loudly
            pytest.skip(f"Kafka produce failed ({e}); is spark-sql-kafka on the classpath?")

        out_dir = str(tmp_path / "kafka_out")
        stream = stream_kafka(spark, servers, topic, starting_offsets="earliest")
        q = (
            normalize_events(parse_bulk_ndjson(stream), raw_col="raw_json")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "kafka_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        assert [r["message"] for r in rows] == ["kafka e2e"]
        assert rows[0]["host_name"] == "k1"


class TestIncrementalDedupStream:
    def test_store_and_instream_dups_both_dropped(self, spark, tmp_path, receiver):
        """m1 is already in the fingerprint store → dropped by the
        stream-static anti-join; the replayed delivery duplicates m2/m3
        in-stream → dropped by watermark dedup. Survivors: one m2, one m3."""
        from filebeat_to_clickhouse_spark.streaming import (
            incremental_dedup_stream,
            spooled_log_stream,
        )

        base = f"http://127.0.0.1:{receiver.port}"
        _post(base + "/_bulk", BULK_BODY)
        _post(base + "/_bulk", BULK_BODY)  # replayed delivery
        store = spark.createDataFrame([("m1",)], "t string").selectExpr("md5(t) AS digest")
        out = incremental_dedup_stream(
            spooled_log_stream(spark, receiver.spool_dir, "bulk"), store
        )
        q = (
            out.writeStream.format("memory")
            .queryName("incdedup_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck_incd"))
            .start()
        )
        q.awaitTermination(120)
        got = sorted(r["message"] for r in spark.sql("SELECT message FROM incdedup_t").collect())
        assert got == ["m2", "m3"]

    def test_oversized_store_degrades_to_sort_merge(self, spark, tmp_path, receiver):
        """The digest store grows with the TOTAL ingested corpus, so its
        broadcast is size-gated (r10): forcing the past-cap path
        (broadcast_store=False → sort-merge anti-join per micro-batch)
        must produce the identical survivor set — slower, bounded, never
        an OOM. Same fixture as above, opposite join strategy."""
        from filebeat_to_clickhouse_spark.streaming import (
            incremental_dedup_stream,
            spooled_log_stream,
        )

        base = f"http://127.0.0.1:{receiver.port}"
        _post(base + "/_bulk", BULK_BODY)
        store = spark.createDataFrame([("m1",)], "t string").selectExpr("md5(t) AS digest")
        out = incremental_dedup_stream(
            spooled_log_stream(spark, receiver.spool_dir, "bulk"),
            store,
            broadcast_store=False,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("incdedup_smj_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck_incd_smj"))
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            r["message"] for r in spark.sql("SELECT message FROM incdedup_smj_t").collect()
        )
        assert got == ["m2", "m3"]


class TestFlagNeardupsStream:
    def test_near_dup_flagged_novel_not(self, spark, tmp_path, receiver):
        """One in-flight message near-duplicates a stored corpus document
        (one word changed in ten) and must be flagged against it; a novel
        message and a too-short one must pass silently. The store holds
        only K×8-byte signatures — no text crosses into the stream job."""
        from filebeat_to_clickhouse_spark.extensions.dedup import minhash_signature_store
        from filebeat_to_clickhouse_spark.streaming import (
            flag_neardups_stream,
            spooled_log_stream,
        )

        stored = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        near = "alpha beta gamma delta epsilon zeta eta theta iota OMEGA"
        body = "\n".join(
            [
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:30:00Z","message":"%s"}' % near,
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:31:00Z","message":"totally different words with no overlap at all whatsoever"}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:32:00Z","message":"shorty"}',
            ]
        )
        base = f"http://127.0.0.1:{receiver.port}"
        _post(base + "/_bulk", body)
        store = minhash_signature_store(
            spark.createDataFrame([(1, stored), (2, "unrelated stored corpus text here nothing shared")],
                                  "doc_id long, text string")
        )
        out = flag_neardups_stream(
            spooled_log_stream(spark, receiver.spool_dir, "bulk"), store
        )
        q = (
            out.writeStream.format("memory")
            .queryName("neardup_flags_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck_fnd"))
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM neardup_flags_t").collect()
        assert [(r["message"], r["store_doc"]) for r in got] == [(near, 1)]
        assert got[0]["n_agree"] >= 6 and got[0]["est_jaccard"] >= 0.5


class TestStreamStreamJoin:
    def test_interval_join_attributes_within_horizon(self, spark, tmp_path, receiver):
        """purchase@10:31 matches clicks at 10:25/10:30 (inside the 10-min
        horizon) but not 10:05 (outside) and not 10:32 (after purchase);
        the second host's purchase sees no clicks at all."""
        body = "\n".join(
            [
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:05:00Z","message":"click early","host":{"name":"h1"}}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:25:00Z","message":"click a","host":{"name":"h1"}}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:30:00Z","message":"click b","host":{"name":"h1"}}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:32:00Z","message":"click late","host":{"name":"h1"}}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:31:00Z","message":"purchase p1","host":{"name":"h1"}}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:31:00Z","message":"purchase p2","host":{"name":"h2"}}',
            ]
        )
        from filebeat_to_clickhouse_spark.streaming import (
            attribute_purchases_stream,
            spooled_log_stream,
        )

        _post(f"http://127.0.0.1:{receiver.port}/_bulk", body)
        out = attribute_purchases_stream(
            spooled_log_stream(spark, receiver.spool_dir, "bulk")
        )
        q = (
            out.writeStream.format("memory")
            .queryName("ssj_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck_ssj"))
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["purchase_message"], r["click_message"])
            for r in spark.sql("SELECT purchase_message, click_message FROM ssj_t").collect()
        }
        assert got == {("purchase p1", "click a"), ("purchase p1", "click b")}


class TestCurateStream:
    def test_stream_matches_batch_battery(self, spark, tmp_path, receiver):
        """Batch gate: the streaming curation pass over a spooled stream
        must equal the batch redact+flag operators row for row."""
        from filebeat_to_clickhouse_spark.streaming import spooled_log_stream
        from filebeat_to_clickhouse_spark.streaming.pipeline import curate_stream

        body = "\n".join(
            [
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:30:00Z","message":"contact bob@x.io or 10.0.0.1 now"}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:31:00Z","message":"ok"}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:32:00Z","message":"clean text with enough words here"}',
            ]
        )
        _post(f"http://127.0.0.1:{receiver.port}/_bulk", body)
        out = curate_stream(
            spooled_log_stream(spark, receiver.spool_dir, "bulk"), min_words=3
        )
        q = (
            out.writeStream.format("memory")
            .queryName("curate_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckc"))
            .start()
        )
        q.awaitTermination(120)
        got = {r["message"]: r for r in spark.sql("SELECT * FROM curate_t").collect()}
        pii = got["contact bob@x.io or 10.0.0.1 now"]
        assert pii["message_redacted"] == "contact <EMAIL> or <IPV4> now"
        assert pii["n_email"] == 1 and pii["n_ipv4"] == 1
        assert pii["keep"]  # 6 words, clean after redaction
        short = got["ok"]
        assert short["f_too_short"] and not short["keep"]
        assert got["clean text with enough words here"]["keep"]


class TestScoreStream:
    def test_per_row_scores_match_batch_scorer_bit_exactly(self, spark):
        """The map-literal per-row formula must reproduce
        score_token_linear's (score, pred) for every document."""
        from filebeat_to_clickhouse_spark.extensions.text import (
            hashed_token_features,
            score_token_linear,
            stopword_ratio_label,
            train_token_centroid,
        )
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.streaming.pipeline import score_stream

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        feats = hashed_token_features(docs)
        w = train_token_centroid(feats, stopword_ratio_label(docs))
        batch = {
            r["doc_id"]: (r["score"], r["pred"])
            for r in score_token_linear(feats, w).collect()
        }
        stream_shaped = {
            r["doc_id"]: (r["quality_score"], r["quality_pred"])
            for r in score_stream(docs, w, text_col="text").collect()
        }
        assert stream_shaped == batch

    def test_empty_model_scores_zero(self, spark):
        from filebeat_to_clickhouse_spark.streaming.pipeline import score_stream

        rows = spark.createDataFrame([("hello world",)], "message string")
        w = spark.createDataFrame([], "bucket bigint, w bigint")
        [r] = score_stream(rows, w).collect()
        assert r["quality_score"] == 0 and r["quality_pred"] == -1

    def test_scores_flow_through_a_live_stream(self, spark, tmp_path, receiver):
        """E2E through the spool: scores must arrive on streamed rows and
        be stateless-computable (append mode, availableNow drain)."""
        from filebeat_to_clickhouse_spark.extensions.text import (
            hashed_token_features,
            stopword_ratio_label,
            train_token_centroid,
        )
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.streaming import spooled_log_stream
        from filebeat_to_clickhouse_spark.streaming.pipeline import score_stream

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        w = train_token_centroid(hashed_token_features(docs), stopword_ratio_label(docs))
        body = "\n".join(
            [
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:30:00Z","message":"the of and to in a the of"}',
                '{"index":{}}',
                '{"@timestamp":"2025-12-04T10:31:00Z","message":"alpha beta gamma delta"}',
            ]
        )
        _post(f"http://127.0.0.1:{receiver.port}/_bulk", body)
        out = score_stream(spooled_log_stream(spark, receiver.spool_dir, "bulk"), w)
        q = (
            out.writeStream.format("memory")
            .queryName("score_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "cks"))
            .start()
        )
        q.awaitTermination(120)
        got = {r["message"]: r for r in spark.sql("SELECT * FROM score_t").collect()}
        assert len(got) == 2
        # stopword-stuffed line scores strictly above the stopword-free one
        assert (
            got["the of and to in a the of"]["quality_score"]
            > got["alpha beta gamma delta"]["quality_score"]
        )


class _FakeRedis:
    """Minimal RESP2 server: serves a fixed LIST via LPOP (optionally
    rejecting the COUNT form like a pre-6.2 server) or pushes PUBSUB
    messages after SUBSCRIBE."""

    def __init__(self, items, count_ok=True, pubsub=False, port=0):
        import socket as _socket
        import threading as _threading

        self.items = list(items)
        self.count_ok = count_ok
        self.pubsub = pubsub
        self._srv = _socket.socket()
        self._srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", port))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = _threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _read_command(self, f):
        head = f.readline()
        if not head or not head.startswith(b"*"):
            return None
        n = int(head[1:-2])
        args = []
        for _ in range(n):
            ln = int(f.readline()[1:-2])
            args.append(f.read(ln + 2)[:-2])
        return args

    def _serve(self):
        conn, _ = self._srv.accept()
        self._conn = conn  # so close() can kill the live connection too
        f = conn.makefile("rb")
        try:
            while True:
                cmd = self._read_command(f)
                if cmd is None:
                    return
                name = cmd[0].upper()
                if name == b"SUBSCRIBE" and self.pubsub:
                    ch = cmd[1]
                    conn.sendall(b"*3\r\n$9\r\nsubscribe\r\n$%d\r\n%s\r\n:1\r\n" % (len(ch), ch))
                    for it in self.items:
                        conn.sendall(
                            b"*3\r\n$7\r\nmessage\r\n$%d\r\n%s\r\n$%d\r\n%s\r\n"
                            % (len(ch), ch, len(it), it)
                        )
                    return  # close: source drain ends
                if name == b"LPOP":
                    if len(cmd) == 3 and not self.count_ok:
                        conn.sendall(b"-ERR wrong number of arguments for 'lpop' command\r\n")
                        continue
                    n = int(cmd[2]) if len(cmd) == 3 else 1
                    batch, self.items = self.items[:n], self.items[n:]
                    if not batch:
                        conn.sendall(b"*-1\r\n" if len(cmd) == 3 else b"$-1\r\n")
                    elif len(cmd) == 3:
                        out = b"*%d\r\n" % len(batch) + b"".join(
                            b"$%d\r\n%s\r\n" % (len(b), b) for b in batch
                        )
                        conn.sendall(out)
                    else:
                        conn.sendall(b"$%d\r\n%s\r\n" % (len(batch[0]), batch[0]))
                    continue
                conn.sendall(b"+OK\r\n")
        except OSError:
            return

    def close(self):
        import socket as _socket

        self._srv.close()
        conn = getattr(self, "_conn", None)
        if conn is not None:
            # shutdown, not just close: the serve loop's makefile holds a
            # dup of the fd, so close() alone leaves the TCP stream open
            try:
                conn.shutdown(_socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                conn.close()
            except OSError:
                pass


class TestRedisSpoolSource:
    ITEMS = [b'{"message":"r1"}', b'{"message":"r2"}', b'{"message":"r3"}']

    def _drain(self, tmp_path, server, mode="list"):
        import glob
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.redis_source import RedisSpoolSource

        spool = str(tmp_path / "spool")
        src = RedisSpoolSource(
            spool, port=server.port, mode=mode, poll_interval=0.05
        ).start()
        deadline = _time.time() + 10
        want = b"\n".join(self.ITEMS).decode().count("message")
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "redis", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if text.count("message") >= want:
                break
            _time.sleep(0.05)
        src.stop()
        server.close()
        return text

    def test_list_mode_drains_and_spools(self, tmp_path):
        text = self._drain(tmp_path, _FakeRedis(self.ITEMS))
        assert [f'"r{i}"' in text for i in (1, 2, 3)] == [True] * 3

    def test_pre62_lpop_fallback(self, tmp_path):
        text = self._drain(tmp_path, _FakeRedis(self.ITEMS, count_ok=False))
        assert all(f'"r{i}"' in text for i in (1, 2, 3))

    def test_pubsub_mode(self, tmp_path):
        text = self._drain(tmp_path, _FakeRedis(self.ITEMS, pubsub=True), mode="pubsub")
        assert all(f'"r{i}"' in text for i in (1, 2, 3))

    def test_spooled_bodies_parse_as_events(self, spark, tmp_path):
        from filebeat_to_clickhouse_spark.ingest.formats import parse_bulk_ndjson

        text = self._drain(tmp_path, _FakeRedis(self.ITEMS))
        df = spark.createDataFrame([(text,)], "value string")
        msgs = {r["message"] for r in parse_bulk_ndjson(df).select("message").collect()}
        assert msgs == {"r1", "r2", "r3"}

    def test_reconnects_after_server_restart(self, tmp_path):
        """A Redis restart must not kill ingestion: the pre-fix loop
        returned on the first EOFError/OSError, permanently — now it
        records the error, backs off, reconnects, and drains whatever
        the reborn server holds."""
        import glob
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.redis_source import RedisSpoolSource

        first = _FakeRedis([b'{"message":"r1"}'])
        port = first.port
        spool = str(tmp_path / "spool")
        src = RedisSpoolSource(
            spool, port=port, poll_interval=0.05, socket_timeout=0.5
        ).start()
        deadline = _time.time() + 10
        text = ""
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "redis", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if '"r1"' in text:
                break
            _time.sleep(0.05)
        assert '"r1"' in text
        first.close()  # server dies mid-flight
        _time.sleep(0.3)
        second = _FakeRedis([b'{"message":"r2"}'], port=port)  # reborn
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "redis", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if '"r2"' in text:
                break
            _time.sleep(0.05)
        alive = src._thread.is_alive()
        src.stop()
        second.close()
        assert alive
        assert '"r1"' in text and '"r2"' in text

    def test_pubsub_survives_idle_gap(self, tmp_path):
        """An idle PUBSUB channel must not kill the drain: the blocking
        read times out at socket_timeout and the pre-fix loop treated
        that OSError as end-of-drain — a quiet channel silently stopped
        ingestion forever. Now a timeout is just an idle poll."""
        import glob
        import socket as _socket
        import threading as _threading
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.redis_source import RedisSpoolSource

        srv = _socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        ch = b"filebeat:logs"

        def serve():
            conn, _ = srv.accept()
            f = conn.makefile("rb")
            n = int(f.readline()[1:-2])  # SUBSCRIBE command
            for _ in range(n):
                ln = int(f.readline()[1:-2])
                f.read(ln + 2)
            conn.sendall(b"*3\r\n$9\r\nsubscribe\r\n$%d\r\n%s\r\n:1\r\n" % (len(ch), ch))

            def push(it):
                conn.sendall(
                    b"*3\r\n$7\r\nmessage\r\n$%d\r\n%s\r\n$%d\r\n%s\r\n"
                    % (len(ch), ch, len(it), it)
                )

            push(b'{"message":"p1"}')
            _time.sleep(0.7)  # idle gap LONGER than the socket timeout
            push(b'{"message":"p2"}')
            _time.sleep(2.0)  # hold the connection while the test asserts

        t = _threading.Thread(target=serve, daemon=True)
        t.start()
        spool = str(tmp_path / "spool")
        src = RedisSpoolSource(
            spool, port=srv.getsockname()[1], mode="pubsub",
            poll_interval=0.05, socket_timeout=0.2,
        ).start()
        deadline = _time.time() + 10
        text = ""
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "redis", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if '"p2"' in text:
                break
            _time.sleep(0.05)
        alive = src._thread.is_alive()
        src.stop()
        srv.close()
        assert alive
        assert '"p1"' in text and '"p2"' in text


class TestLumberjackSource:
    def _frames(self):
        import struct as _s
        import zlib as _z

        j1 = b'{"message":"lj1","@timestamp":"2025-12-04T10:30:00Z"}'
        j2 = b'{"message":"lj2"}'
        batch = (
            b"2J" + _s.pack(">II", 1, len(j1)) + j1
            + b"2J" + _s.pack(">II", 2, len(j2)) + j2
            # a D (key/value) frame: beats' non-JSON event form
            + b"2D" + _s.pack(">II", 3, 2)
            + _s.pack(">I", 7) + b"message" + _s.pack(">I", 3) + b"lj3"
            + _s.pack(">I", 4) + b"host" + _s.pack(">I", 2) + b"h9"
        )
        comp = _z.compress(batch)
        return (
            b"2W" + _s.pack(">I", 3)
            + b"2C" + _s.pack(">I", len(comp)) + comp
        )

    def test_window_compressed_json_and_data_frames(self, spark, tmp_path):
        import glob
        import socket as _socket
        import struct as _s
        import time as _time

        from filebeat_to_clickhouse_spark.ingest.formats import parse_bulk_ndjson
        from filebeat_to_clickhouse_spark.streaming.lumberjack import LumberjackSpoolSource

        spool = str(tmp_path / "spool")
        with LumberjackSpoolSource(spool) as src:
            with _socket.create_connection(("127.0.0.1", src.port), timeout=5) as c:
                c.sendall(self._frames())
                ack = c.recv(6)
                # server acks the highest sequence after the window fills
                assert ack[:2] == b"2A" and _s.unpack(">I", ack[2:])[0] == 3

            deadline = _time.time() + 5
            while _time.time() < deadline:
                bodies = glob.glob(os.path.join(spool, "lumberjack", "*.body"))
                if bodies:
                    break
                _time.sleep(0.05)
        text = "\n".join(open(b).read() for b in bodies)
        df = spark.createDataFrame([(text,)], "value string")
        got = {r["message"] for r in parse_bulk_ndjson(df).select("message").collect()}
        assert got == {"lj1", "lj2", "lj3"}
        # the D frame became a flat JSON object with its host field intact
        assert '"host": "h9"' in text

    def test_unacked_tail_spooled_on_disconnect(self, tmp_path):
        import glob
        import socket as _socket
        import struct as _s
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.lumberjack import LumberjackSpoolSource

        j = b'{"message":"tail"}'
        frames = b"2W" + _s.pack(">I", 10) + b"2J" + _s.pack(">II", 1, len(j)) + j
        spool = str(tmp_path / "spool")
        with LumberjackSpoolSource(spool) as src:
            with _socket.create_connection(("127.0.0.1", src.port), timeout=5) as c:
                c.sendall(frames)
            # window never fills; disconnect must flush the partial batch
            deadline = _time.time() + 5
            bodies = []
            while _time.time() < deadline and not bodies:
                bodies = glob.glob(os.path.join(spool, "lumberjack", "*.body"))
                _time.sleep(0.05)
        assert bodies and "tail" in open(bodies[0]).read()


class _FakeKafkaBroker:
    """Minimal single-node Kafka broker speaking the legacy protocol the
    sidecar pins: Metadata v0, ListOffsets v0, Fetch v0 over one topic.
    Partitions hold raw values; message sets are encoded with the
    module's own ``encode_message_set`` so encode/decode stay honest
    against each other. ``gzip_batches`` serves each fetch as one
    gzip-wrapper message (attrs=1) holding the nested set."""

    def __init__(
        self, partitions, topic="filebeat", gzip_batches=False, fail_fetches=0,
        bad_leader_metas=0, drop_conns=0,
    ):
        import socket as _socket
        import threading as _threading

        self.partitions = {p: list(v) for p, v in partitions.items()}
        self.topic, self.gzip_batches = topic, gzip_batches
        self.fail_fetches = fail_fetches  # first N fetches answer error code 1
        self.drop_conns = drop_conns  # first N fetches close the connection
        # first N metadata responses advertise a leader node id that is
        # absent from the broker list (a stale leader during failover)
        self.bad_leader_metas = bad_leader_metas
        self._srv = _socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(2)
        self.port = self._srv.getsockname()[1]
        self._thread = _threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _message_set(self, part, offset):
        import gzip as _gz
        import struct as _s
        import zlib as _z

        from filebeat_to_clickhouse_spark.streaming.kafka_source import encode_message_set

        values = self.partitions[part][offset:]
        if not values:
            return b""
        if not self.gzip_batches:
            return encode_message_set(values, base_offset=offset)
        inner = encode_message_set(values, base_offset=offset)  # absolute offsets (magic 0)
        payload = _gz.compress(inner)
        body = _s.pack(">BB", 0, 1) + _s.pack(">i", -1) + _s.pack(">i", len(payload)) + payload
        crc = _s.unpack(">i", _s.pack(">I", _z.crc32(body) & 0xFFFFFFFF))[0]
        msg = _s.pack(">i", crc) + body
        return _s.pack(">qi", offset + len(values) - 1, len(msg)) + msg

    def _serve(self):
        import struct as _s

        from filebeat_to_clickhouse_spark.streaming.kafka_source import _Reader, _str

        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            f = conn.makefile("rb")
            try:
                while True:
                    head = f.read(4)
                    if len(head) < 4:
                        break
                    r = _Reader(f.read(_s.unpack(">i", head)[0]))
                    api, _ver, corr = r.i16(), r.i16(), r.i32()
                    r.string()  # client id
                    if api == 3:  # Metadata v0
                        leader = 0
                        if self.bad_leader_metas > 0:
                            self.bad_leader_metas -= 1
                            leader = 9  # node id not in the broker list
                        out = _s.pack(">i", 1) + _s.pack(">i", 0) + _str("127.0.0.1") + _s.pack(">i", self.port)
                        out += _s.pack(">i", 1) + _s.pack(">h", 0) + _str(self.topic)
                        out += _s.pack(">i", len(self.partitions))
                        for p in sorted(self.partitions):
                            out += _s.pack(">hii", 0, p, leader) + _s.pack(">i", 0) + _s.pack(">i", 0)
                    elif api == 2:  # ListOffsets v0
                        r.i32()  # replica
                        r.i32()  # topic count
                        r.string()
                        r.i32()  # partition count
                        part, ts, _maxn = r.i32(), r.i64(), r.i32()
                        off = 0 if ts == -2 else len(self.partitions[part])
                        out = _s.pack(">i", 1) + _str(self.topic) + _s.pack(">i", 1)
                        out += _s.pack(">ih", part, 0) + _s.pack(">i", 1) + _s.pack(">q", off)
                    elif api == 1:  # Fetch v0
                        r.i32(), r.i32(), r.i32()  # replica, max_wait, min_bytes
                        r.i32()  # topic count
                        r.string()
                        r.i32()  # partition count
                        part, offset, maxb = r.i32(), r.i64(), r.i32()
                        if self.drop_conns > 0:
                            self.drop_conns -= 1
                            break  # abrupt close: a genuine transient failure
                        out = _s.pack(">i", 1) + _str(self.topic) + _s.pack(">i", 1)
                        if self.fail_fetches > 0 or offset > len(self.partitions[part]):
                            # error 1 = OFFSET_OUT_OF_RANGE, like a real
                            # broker answers for an offset past the log
                            if self.fail_fetches > 0:
                                self.fail_fetches -= 1
                            out += _s.pack(">ihq", part, 1, len(self.partitions[part]))
                            out += _s.pack(">i", 0)
                        else:
                            # real brokers truncate the set at max_bytes —
                            # the sidecar's fetch-size growth depends on it
                            ms = self._message_set(part, offset)[:maxb]
                            out += _s.pack(">ihq", part, 0, len(self.partitions[part]))
                            out += _s.pack(">i", len(ms)) + ms
                    else:
                        break
                    frame = _s.pack(">i", corr) + out
                    conn.sendall(_s.pack(">i", len(frame)) + frame)
            except (OSError, ValueError):
                pass
            finally:
                conn.close()

    def close(self):
        self._srv.close()


class TestKafkaSpoolSource:
    VALUES = [b'{"message":"k1"}', b'{"message":"k2"}', b'{"message":"k3"}']

    def _drain(self, tmp_path, broker, want=3, spool=None):
        import glob
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.kafka_source import KafkaSpoolSource

        spool = spool or str(tmp_path / "spool")
        src = KafkaSpoolSource(
            spool, bootstrap=f"127.0.0.1:{broker.port}", poll_interval=0.05
        ).start()
        deadline = _time.time() + 10
        text = ""
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "kafka", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if text.count("message") >= want:
                break
            _time.sleep(0.05)
        src.stop()
        return text

    def test_drains_multiple_partitions(self, tmp_path):
        broker = _FakeKafkaBroker({0: self.VALUES[:2], 1: self.VALUES[2:]})
        text = self._drain(tmp_path, broker)
        broker.close()
        assert all(f'"k{i}"' in text for i in (1, 2, 3))

    def test_gzip_wrapper_batches_unwrap(self, tmp_path):
        broker = _FakeKafkaBroker({0: self.VALUES}, gzip_batches=True)
        text = self._drain(tmp_path, broker)
        broker.close()
        assert all(f'"k{i}"' in text for i in (1, 2, 3))

    def test_offsets_resume_without_redelivery(self, tmp_path):
        """Restart with the same spool: committed offsets persist, so the
        second drain fetches ONLY the messages produced after the stop —
        no duplicate of the committed prefix."""
        broker = _FakeKafkaBroker({0: self.VALUES[:2]})
        spool = str(tmp_path / "spool")
        text = self._drain(tmp_path, broker, want=2, spool=spool)
        assert '"k1"' in text and '"k2"' in text
        broker.partitions[0].append(self.VALUES[2])
        text = self._drain(tmp_path, broker, want=3, spool=spool)
        broker.close()
        assert text.count('"k1"') == 1 and text.count('"k2"') == 1 and '"k3"' in text

    def test_oversized_message_grows_fetch_size(self, tmp_path):
        """A message bigger than max_bytes truncates the fetched set to
        zero parsed messages; the sidecar must grow the fetch size and
        drain it rather than refetching the same offset forever."""
        big = ('{"message":"' + "x" * 4096 + '"}').encode()
        broker = _FakeKafkaBroker({0: [self.VALUES[0], big, self.VALUES[1]]})
        import glob
        import os
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.kafka_source import KafkaSpoolSource

        spool = str(tmp_path / "spool")
        src = KafkaSpoolSource(
            spool, bootstrap=f"127.0.0.1:{broker.port}",
            poll_interval=0.05, max_bytes=256,  # smaller than `big`
        ).start()
        deadline = _time.time() + 10
        text = ""
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "kafka", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if text.count('"message"') >= 3:
                break
            _time.sleep(0.05)
        src.stop()
        broker.close()
        assert '"k1"' in text and '"k2"' in text and "x" * 4096 in text

    def test_transient_fetch_error_does_not_kill_drain(self, tmp_path):
        """A broker-reported fetch error (e.g. committed offset fell behind
        retention) must not silently kill the daemon thread: the loop
        records it, backs off, reconnects, and ingestion continues."""
        broker = _FakeKafkaBroker({0: self.VALUES}, fail_fetches=2)
        text = self._drain(tmp_path, broker)
        broker.close()
        assert all(f'"k{i}"' in text for i in (1, 2, 3))

    def test_stale_leader_metadata_does_not_kill_drain(self, tmp_path):
        """Metadata advertising a leader node id that is missing from the
        broker list (a stale leader mid-failover) raises KeyError — an
        error OUTSIDE any curated exception tuple. The loop's catch must
        be broad enough to record it and reconnect, not die silently."""
        import glob
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.kafka_source import KafkaSpoolSource

        broker = _FakeKafkaBroker({0: self.VALUES}, bad_leader_metas=1)
        spool = str(tmp_path / "spool")
        src = KafkaSpoolSource(
            spool, bootstrap=f"127.0.0.1:{broker.port}", poll_interval=0.05
        ).start()
        deadline = _time.time() + 10
        text = ""
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "kafka", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if text.count("message") >= 3:
                break
            _time.sleep(0.05)
        alive = src._thread.is_alive()
        err = src.last_error
        src.stop()
        broker.close()
        assert alive
        assert isinstance(err, KeyError)
        assert all(f'"k{i}"' in text for i in (1, 2, 3))

    def test_poison_message_quarantines_partition_not_thread(self, tmp_path):
        """A message larger than max_fetch_bytes can never be drained —
        but it must cost ONE partition, not the sidecar: the offending
        (partition, offset) lands in ``poisoned`` with a loud last_error,
        the fetch ladder stops burning on it, and every other partition
        keeps draining with the thread alive."""
        import glob
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.kafka_source import (
            KafkaSpoolSource,
            KafkaWireError,
        )

        big = ('{"message":"' + "x" * 4096 + '"}').encode()
        broker = _FakeKafkaBroker({0: [self.VALUES[0], big], 1: self.VALUES[1:]})
        spool = str(tmp_path / "spool")
        src = KafkaSpoolSource(
            spool, bootstrap=f"127.0.0.1:{broker.port}", poll_interval=0.05,
            max_bytes=256, max_fetch_bytes=1024,  # smaller than `big`
        ).start()
        deadline = _time.time() + 10
        text = ""
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "kafka", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if text.count("message") >= 3 and src.poisoned:
                break
            _time.sleep(0.05)
        alive = src._thread.is_alive()
        err, poisoned = src.last_error, dict(src.poisoned)
        src.stop()
        broker.close()
        assert alive
        assert poisoned == {0: 1}
        assert isinstance(err, KafkaWireError) and "quarantined" in str(err)
        assert all(f'"k{i}"' in text for i in (1, 2, 3))
        assert "x" * 4096 not in text

    def test_empty_wrapper_set_advances_offset(self, tmp_path):
        """A COMPLETE gzip wrapper whose inner set is empty (compaction can
        leave these) parses to zero messages with raw bytes present — the
        sidecar must advance past it via the wrapper's offset, not
        misclassify it as an oversized message and stall the partition."""

        class _EmptyWrapperBroker(_FakeKafkaBroker):
            def _message_set(self, part, offset):
                if offset == 0:
                    import gzip as _gz
                    import struct as _s
                    import zlib as _z

                    payload = _gz.compress(b"")  # empty inner set
                    body = _s.pack(">BB", 0, 1) + _s.pack(">i", -1)
                    body += _s.pack(">i", len(payload)) + payload
                    crc = _s.unpack(">i", _s.pack(">I", _z.crc32(body) & 0xFFFFFFFF))[0]
                    msg = _s.pack(">i", crc) + body
                    return _s.pack(">qi", 0, len(msg)) + msg
                return super()._message_set(part, offset)

        broker = _EmptyWrapperBroker({0: [b"IGNORED", self.VALUES[0], self.VALUES[1]]})
        text = self._drain(tmp_path, broker, want=2)
        broker.close()
        assert '"k1"' in text and '"k2"' in text
        assert "IGNORED" not in text

    def test_committed_offset_past_truncated_log_re_resolves(self, tmp_path):
        """auto.offset.reset recovery: a committed offset that fell outside
        the log (retention truncation, topic recreation) answers fetch
        error 1 forever — the sidecar must re-resolve via ListOffsets and
        re-commit instead of bouncing off the error through the reconnect
        loop for eternity."""
        import glob
        import json as _json
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.kafka_source import (
            KafkaOffsetOutOfRange,
            KafkaSpoolSource,
        )

        broker = _FakeKafkaBroker({0: self.VALUES})
        spool = str(tmp_path / "spool")
        os.makedirs(spool, exist_ok=True)
        with open(os.path.join(spool, "kafka.offsets"), "w") as f:
            _json.dump({"0": 50}, f)  # stale commit far past the 3-item log
        src = KafkaSpoolSource(
            spool, bootstrap=f"127.0.0.1:{broker.port}", poll_interval=0.05
        ).start()
        deadline = _time.time() + 10
        text = ""
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "kafka", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if text.count("message") >= 3:
                break
            _time.sleep(0.05)
        err, alive = src.last_error, src._thread.is_alive()
        src.stop()
        broker.close()
        assert alive
        assert isinstance(err, KafkaOffsetOutOfRange)
        assert all(f'"k{i}"' in text for i in (1, 2, 3))

    def test_latest_start_survives_early_fetch_error(self, tmp_path):
        """start=LATEST: the resolved tail offset must be committed at
        connect time — an error before the partition's first spool must
        resume from THAT offset, not re-resolve at the new tail and
        silently skip everything that arrived in between."""
        import glob
        import time as _time

        from filebeat_to_clickhouse_spark.streaming.kafka_source import (
            LATEST,
            KafkaSpoolSource,
        )

        broker = _FakeKafkaBroker({0: []})
        spool = str(tmp_path / "spool")
        src = KafkaSpoolSource(
            spool, bootstrap=f"127.0.0.1:{broker.port}", poll_interval=0.05,
            start=LATEST,
        ).start()
        deadline = _time.time() + 10
        offsets_path = os.path.join(spool, "kafka.offsets")
        while _time.time() < deadline and not os.path.exists(offsets_path):
            _time.sleep(0.05)
        assert os.path.exists(offsets_path), "resolved start offset never committed"
        broker.drop_conns = 1  # next fetch: abrupt connection loss → reconnect
        broker.partitions[0].extend(self.VALUES)
        text = ""
        while _time.time() < deadline:
            bodies = sorted(glob.glob(os.path.join(spool, "kafka", "*.body")))
            text = "".join(open(b).read() + "\n" for b in bodies)
            if text.count("message") >= 3:
                break
            _time.sleep(0.05)
        src.stop()
        broker.close()
        assert all(text.count(f'"k{i}"') == 1 for i in (1, 2, 3))

    def test_spooled_bodies_flow_to_parquet_sink(self, spark, tmp_path):
        """The full C2 e2e the round-4 suite could only skip: wire bytes
        over a real socket speaking the Kafka protocol → sidecar spool →
        file stream + NDJSON parse + normalize → parquet sink."""
        from filebeat_to_clickhouse_spark.__main__ import build_service
        from filebeat_to_clickhouse_spark.config import InputConfig, PipelineConfig

        broker = _FakeKafkaBroker({0: self.VALUES})
        cfg = PipelineConfig()
        cfg.server.host, cfg.server.port = "127.0.0.1", 0
        cfg.spool_dir = str(tmp_path / "spool")
        cfg.checkpoint_dir = str(tmp_path / "ck")
        cfg.inputs["kafka"] = InputConfig(
            enabled=True,
            options={"brokers": [f"127.0.0.1:{broker.port}"], "mode": "sidecar"},
        )
        out = str(tmp_path / "logs_table")
        import glob
        import time as _time

        front, queries = build_service(cfg, "parquet", out, once=True, spark=spark)
        try:
            deadline = _time.time() + 10
            while _time.time() < deadline:
                if glob.glob(os.path.join(cfg.spool_dir, "kafka", "*.body")):
                    break
                _time.sleep(0.05)
            for q in queries:
                q.awaitTermination(120)
            front2, queries2 = build_service(cfg, "parquet", out, once=True, spark=spark)
            try:
                for q in queries2:
                    q.awaitTermination(120)
            finally:
                front2.stop()
        finally:
            front.stop()
            broker.close()
        msgs = {r["message"] for r in spark.read.parquet(out).select("message").collect()}
        assert {"k1", "k2", "k3"} <= msgs

    def test_message_set_roundtrip_both_magics(self):
        from filebeat_to_clickhouse_spark.streaming.kafka_source import (
            _parse_message_set,
            encode_message_set,
        )

        vals = [b"a", b"", b'{"x":1}']
        for magic in (0, 1):
            got, last = _parse_message_set(encode_message_set(vals, base_offset=7, magic=magic))
            assert [v for _, v in got] == vals
            assert [o for o, _ in got] == [7, 8, 9]
            assert last == 9

    def test_partial_trailing_message_ends_batch(self):
        from filebeat_to_clickhouse_spark.streaming.kafka_source import (
            _parse_message_set,
            encode_message_set,
        )

        full = encode_message_set([b"aaa", b"bbb"])
        got, last = _parse_message_set(full[:-2])  # broker-style truncation
        assert [v for _, v in got] == [b"aaa"] and last == 0

    def test_parser_terminates_on_arbitrary_bytes(self):
        """Wire-parser robustness contract: ANY byte string — corrupt
        broker output, bit-flipped frames, adversarial sizes (negative
        int32 size fields included) — must terminate promptly and either
        parse or raise, never hang or exit with an unexpected error type.
        The drain loop's broad catch makes every raise a reconnect, so
        the only catastrophic parser behavior would be non-termination."""
        import struct as _struct
        import zlib as _zlib

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from filebeat_to_clickhouse_spark.streaming.kafka_source import (
            KafkaWireError,
            _parse_message_set,
            encode_message_set,
        )

        @settings(max_examples=300, deadline=None)
        @given(st.binary(max_size=256))
        def fuzz(buf):
            try:
                msgs, last = _parse_message_set(buf)
            except (KafkaWireError, _zlib.error, _struct.error, EOFError):
                return
            assert last >= -1
            for off, v in msgs:
                assert isinstance(v, (bytes, bytearray))

        fuzz()

        # mutated VALID frames: flip one byte anywhere in an encoded set
        base = encode_message_set([b'{"m":"a"}', b"bb", b""], base_offset=3)

        @settings(max_examples=300, deadline=None)
        @given(
            st.integers(min_value=0, max_value=len(base) - 1),
            st.integers(min_value=1, max_value=255),
        )
        def fuzz_flip(pos, delta):
            buf = bytearray(base)
            buf[pos] = (buf[pos] + delta) % 256
            try:
                _parse_message_set(bytes(buf))
            except (KafkaWireError, _zlib.error, _struct.error, EOFError):
                return

        fuzz_flip()


class TestCliMain:
    def test_once_drains_preseeded_spool_to_parquet(self, spark, tmp_path):
        """The __main__ CLI end-to-end (the reference process's drop-in
        shape): YAML config → main(['--once']) starts the receiver, drains
        a pre-seeded spool backlog through parse/normalize into the
        parquet sink, shuts everything down, and exits 0."""
        import socket as _socket

        import yaml as _yaml

        from filebeat_to_clickhouse_spark.__main__ import main

        spool = tmp_path / "spool"
        (spool / "bulk").mkdir(parents=True)
        (spool / "bulk" / "1.body").write_text(
            '{"index":{}}\n'
            '{"@timestamp":"2024-01-01T10:00:00.000Z","message":"cli-e2e",'
            '"host":{"name":"h1"}}'
        )
        s = _socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        cfgp = tmp_path / "config.yaml"
        cfgp.write_text(
            _yaml.safe_dump(
                {
                    "server": {"host": "127.0.0.1", "port": port},
                    "spark": {
                        "spool_dir": str(spool),
                        "checkpoint_dir": str(tmp_path / "ck"),
                    },
                }
            )
        )
        out = str(tmp_path / "logs_table")
        rc = main(["--config", str(cfgp), "--sink", "parquet", "--out", out, "--once"])
        assert rc == 0
        msgs = {r["message"] for r in spark.read.parquet(out).collect()}
        assert "cli-e2e" in msgs


class TestGrowthWatchdog:
    def test_timeout_cancels_and_sweeps_leaked_streams(self, spark):
        """The measurement harness contract (tools/growth_check.run_watched):
        a query exceeding the cap is cancelled via its job group AND its
        leaked streaming queries are stopped — cancelJobGroup cannot reach
        micro-batches running under the stream's own runId group — leaving
        zero active streams and zero running tasks for the next timing."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "growth_check",
            os.path.join(os.path.dirname(__file__), "..", "tools", "growth_check.py"),
        )
        gc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(gc)

        from conftest import SF_ORACLE

        from filebeat_to_clickhouse_spark.queries import QUERIES

        spark.conf.set("spark.sql.streaming.stopTimeout", "30000")
        try:
            r = gc.run_watched(
                spark, QUERIES, "streaming_attribution_roundtrip", SF_ORACLE, cap_sec=2.0
            )
        finally:
            spark.conf.unset("spark.sql.streaming.stopTimeout")
        assert r == "timeout"
        assert len(spark.streams.active) == 0
        jt = spark.sparkContext._jsc.sc().statusTracker()
        assert all(e.numRunningTasks() == 0 for e in jt.getExecutorInfos())


class TestServiceWithSidecars:
    def test_redis_and_lumberjack_inputs_flow_to_sink(self, spark, tmp_path):
        """Full reference config-surface parity: inputs.redis and
        inputs.logstash enabled → sidecars drain into the spool → the same
        per-format streams land everything in the sink."""
        import struct as _s
        import socket as _socket
        import time as _time

        from filebeat_to_clickhouse_spark.__main__ import build_service
        from filebeat_to_clickhouse_spark.config import InputConfig, PipelineConfig

        redis_srv = _FakeRedis([b'{"message":"via-redis"}'])
        cfg = PipelineConfig()
        cfg.server.host, cfg.server.port = "127.0.0.1", 0
        cfg.spool_dir = str(tmp_path / "spool")
        cfg.checkpoint_dir = str(tmp_path / "ck")
        cfg.inputs["redis"] = InputConfig(
            enabled=True, options={"address": f"127.0.0.1:{redis_srv.port}"}
        )
        cfg.inputs["logstash"] = InputConfig(enabled=True, options={"port": 0})
        out = str(tmp_path / "logs_table")

        front, queries = build_service(cfg, "parquet", out, once=True, spark=spark)
        try:
            lj_port = front._sidecars[-1].port
            j = b'{"message":"via-lumberjack"}'
            with _socket.create_connection(("127.0.0.1", lj_port), timeout=5) as c:
                c.sendall(b"2W" + _s.pack(">I", 1) + b"2J" + _s.pack(">II", 1, len(j)) + j)
                c.recv(6)  # ack
            deadline = _time.time() + 10
            import glob

            while _time.time() < deadline:
                n = len(glob.glob(os.path.join(cfg.spool_dir, "redis", "*.body"))) + len(
                    glob.glob(os.path.join(cfg.spool_dir, "lumberjack", "*.body"))
                )
                if n >= 2:
                    break
                _time.sleep(0.05)
            for q in queries:
                q.awaitTermination(120)
            # second drain picks up files spooled after the first start
            front2, queries2 = build_service(cfg, "parquet", out, once=True, spark=spark)
            try:
                for q in queries2:
                    q.awaitTermination(120)
            finally:
                front2.stop()
        finally:
            front.stop()
            redis_srv.close()
        msgs = {r["message"] for r in spark.read.parquet(out).select("message").collect()}
        assert {"via-redis", "via-lumberjack"} <= msgs


class TestTcpLinesSource:
    def test_lines_spooled_and_flushed_on_disconnect(self, spark, tmp_path):
        import glob
        import socket as _socket
        import time as _time

        from filebeat_to_clickhouse_spark.ingest.formats import parse_bulk_ndjson
        from filebeat_to_clickhouse_spark.streaming.lumberjack import TcpLinesSpoolSource

        spool = str(tmp_path / "spool")
        with TcpLinesSpoolSource(spool, flush_lines=2) as src:
            with _socket.create_connection(("127.0.0.1", src.port), timeout=5) as c:
                # 2 lines → chunk flush; 3rd without trailing newline →
                # disconnect flush
                c.sendall(b'{"message":"t1"}\n{"message":"t2"}\n{"message":"t3"}')
            deadline = _time.time() + 5
            bodies = []
            while _time.time() < deadline and len(bodies) < 2:
                bodies = glob.glob(os.path.join(spool, "tcp", "*.body"))
                _time.sleep(0.05)
        text = "\n".join(open(b).read() for b in sorted(bodies))
        df = spark.createDataFrame([(text,)], "value string")
        got = {r["message"] for r in parse_bulk_ndjson(df).select("message").collect()}
        assert got == {"t1", "t2", "t3"}


class TestDsirScoreStream:
    def test_stream_scorer_is_bit_exact_vs_batch(self, spark):
        """dsir_score_stream under a dsir_lambda_table model must reproduce
        dsir_importance_weights' (n_tokens, dsir_score) for every raw
        document — same integer arithmetic, streaming-shaped plan."""
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.extensions.text import (
            dsir_importance_weights,
            dsir_lambda_table,
        )
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.streaming.pipeline import dsir_score_stream

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        raw = docs.filter(F.col("lang") != "en")
        tgt = docs.filter(F.col("lang") == "en")
        batch = {
            r["doc_id"]: (r["n_tokens"], r["dsir_score"])
            for r in dsir_importance_weights(raw, tgt).collect()
        }
        lam = dsir_lambda_table(raw, tgt)
        streamed = {
            r["doc_id"]: (r["n_tokens"], r["dsir_score"])
            for r in dsir_score_stream(raw, lam, text_col="text").collect()
        }
        assert streamed == batch

    def test_null_text_scores_null_not_crash(self, spark):
        from filebeat_to_clickhouse_spark.streaming.pipeline import dsir_score_stream

        rows = spark.createDataFrame([("x y z",), (None,)], "message string")
        lam = spark.createDataFrame(
            [(b, 1) for b in range(1024)], "bucket bigint, lam bigint"
        )
        got = {r["message"]: r["dsir_score"] for r in dsir_score_stream(rows, lam).collect()}
        assert got["x y z"] == 3 and got[None] is None

    def test_bucket_width_mismatch_raises(self, spark):
        """A λ table trained at a different width than the caller's
        n_buckets (which is also the token-hash modulo) must raise at
        assembly, not silently mis-score: a smaller table used to score
        every bucket ≥ its size as 0, a larger one IndexError'd (r5
        advice). Duplicate buckets are rejected the same way."""
        import pytest as _pytest

        from filebeat_to_clickhouse_spark.streaming.pipeline import dsir_score_stream

        rows = spark.createDataFrame([("x y z",)], "message string")
        small = spark.createDataFrame(
            [(b, 1) for b in range(512)], "bucket bigint, lam bigint"
        )
        with _pytest.raises(ValueError, match="bucket set mismatch"):
            dsir_score_stream(rows, small)  # default n_buckets=1024
        # trained at 512 and scored at 512: fine
        assert dsir_score_stream(rows, small, n_buckets=512).count() == 1
        dup = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 3)], "bucket bigint, lam bigint"
        )
        with _pytest.raises(ValueError, match="bucket set mismatch"):
            dsir_score_stream(rows, dup, n_buckets=2)


class TestClickHouseProtocolFidelity:
    """Replay of byte-faithful ClickHouse HTTP interface responses (r5
    verdict item 7: the sink was only ever exercised against a generic
    python http.server). The canned bytes reproduce a real server's
    wire shape — status line, Keep-Alive, X-ClickHouse-Query-Id /
    -Summary / -Timezone headers on success; the `Code: N.
    DB::Exception: ...` text body plus X-ClickHouse-Exception-Code on
    failure — served by a raw socket so nothing normalizes them."""

    _OK = (
        b"HTTP/1.1 200 OK\r\n"
        b"Date: Fri, 15 Aug 2025 10:00:00 GMT\r\n"
        b"Connection: Keep-Alive\r\n"
        b"Content-Type: text/plain; charset=UTF-8\r\n"
        b"X-ClickHouse-Server-Display-Name: clickhouse-server\r\n"
        b"X-ClickHouse-Query-Id: 8f2c7e9a-1b2c-4d5e-8f90-abcdef123456\r\n"
        b"X-ClickHouse-Timezone: UTC\r\n"
        b"Keep-Alive: timeout=10\r\n"
        b'X-ClickHouse-Summary: {"read_rows":"2","read_bytes":"188",'
        b'"written_rows":"2","written_bytes":"188","total_rows_to_read":"0",'
        b'"result_rows":"2","result_bytes":"188"}\r\n'
        b"Content-Length: 0\r\n"
        b"\r\n"
    )
    _ERR_BODY = (
        b"Code: 60. DB::Exception: Table logs.logs_table does not exist. "
        b"(UNKNOWN_TABLE) (version 24.8.4.13 (official build))\n"
    )
    _ERR = (
        b"HTTP/1.1 404 Not Found\r\n"
        b"Date: Fri, 15 Aug 2025 10:00:01 GMT\r\n"
        b"Connection: Keep-Alive\r\n"
        b"Content-Type: text/plain; charset=UTF-8\r\n"
        b"X-ClickHouse-Server-Display-Name: clickhouse-server\r\n"
        b"X-ClickHouse-Query-Id: 9a3d8f0b-2c3d-5e6f-9012-bcdef2345678\r\n"
        b"X-ClickHouse-Exception-Code: 60\r\n"
        b"X-ClickHouse-Timezone: UTC\r\n"
        b"Keep-Alive: timeout=10\r\n"
        + f"Content-Length: {len(_ERR_BODY)}\r\n\r\n".encode()
        + _ERR_BODY
    )

    @staticmethod
    def _serve_canned(response: bytes):
        """One-shot raw-socket server: reads the full request (headers +
        Content-Length body), records it, replies with the canned bytes
        verbatim. Returns (port, requests, closer)."""
        import socket
        import threading

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        requests: list[bytes] = []

        def run():
            conn, _ = srv.accept()
            with conn:
                buf = b""
                while b"\r\n\r\n" not in buf:
                    buf += conn.recv(65536)
                head, _, rest = buf.partition(b"\r\n\r\n")
                clen = 0
                for line in head.split(b"\r\n"):
                    if line.lower().startswith(b"content-length:"):
                        clen = int(line.split(b":", 1)[1])
                while len(rest) < clen:
                    rest += conn.recv(65536)
                requests.append(head + b"\r\n\r\n" + rest)
                conn.sendall(response)

        th = threading.Thread(target=run, daemon=True)
        th.start()
        return srv.getsockname()[1], requests, srv.close

    def test_success_replay_accepted_and_request_well_formed(self):
        from filebeat_to_clickhouse_spark.streaming.sink import (
            _post_ndjson,
            clickhouse_insert_url,
            rows_to_jsoneachrow,
        )

        port, reqs, close = self._serve_canned(self._OK)
        try:
            url = clickhouse_insert_url("127.0.0.1", port, "logs", "logs_table")
            body = rows_to_jsoneachrow(
                [
                    {"timestamp": "2025-08-15 10:00:00", "message": "m1"},
                    {"timestamp": "2025-08-15 10:00:01", "message": "m2"},
                ]
            )
            _post_ndjson(url, body, "default", "", timeout=10)  # no raise
        finally:
            close()
        (raw,) = reqs
        head, _, sent_body = raw.partition(b"\r\n\r\n")
        first = head.split(b"\r\n")[0]
        # the request shape a real server parses: POST to /?query=INSERT..
        assert first.startswith(b"POST /?query=INSERT%20INTO%20logs.logs_table")
        assert b"FORMAT%20JSONEachRow HTTP/1.1" in first
        assert b"Content-Type: application/x-ndjson" in head
        assert b"Authorization: Basic " in head
        assert sent_body == body

    def test_exception_replay_surfaces_server_message(self):
        import pytest as _pytest

        from filebeat_to_clickhouse_spark.streaming.sink import (
            _post_ndjson,
            clickhouse_insert_url,
        )

        port, _, close = self._serve_canned(self._ERR)
        try:
            url = clickhouse_insert_url("127.0.0.1", port, "logs", "logs_table")
            with _pytest.raises(RuntimeError) as ei:
                _post_ndjson(url, b'{"message":"m"}', "default", "", timeout=10)
        finally:
            close()
        msg = str(ei.value)
        # the server's own diagnosis must reach the operator log: HTTP
        # status, the numeric exception code header, and the DB::Exception
        # body text
        assert "HTTP 404" in msg and "exception code 60" in msg
        assert "DB::Exception: Table logs.logs_table does not exist" in msg


class TestCdfGateStream:
    def test_within_one_quantile_of_batch_rank_and_gates(self, spark):
        """The streaming gate under an exact_quantile_boundaries model must
        land within scale/k of the batch percentile_rank on the training
        corpus itself (the quantization is the only divergence), gate on
        min_pct_ppm, and pass NULLs through as NULL."""
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.operators import (
            exact_quantile_boundaries,
            percentile_rank,
        )
        from filebeat_to_clickhouse_spark.streaming.pipeline import cdf_gate_stream

        corpus = spark.createDataFrame(
            [(i, (i * 37) % 101) for i in range(200)], "rid bigint, score bigint"
        )
        k = 20
        bounds = exact_quantile_boundaries(corpus, "score", k=k)
        batch = {r["rid"]: r["pct_ppm"] for r in
                 percentile_rank(corpus, "score", ()).collect()}

        stream_rows = corpus.unionByName(
            spark.createDataFrame([(999, None)], "rid bigint, score bigint")
        )
        got = {r["rid"]: (r["pct_ppm"], r["keep"]) for r in
               cdf_gate_stream(stream_rows, bounds, "score",
                               min_pct_ppm=500_000).collect()}
        assert got[999] == (None, None)
        for rid, bpct in batch.items():
            spct = got[rid][0]
            assert abs(spct - bpct) <= 1_000_000 // k, (rid, spct, bpct)
            assert got[rid][1] == (spct >= 500_000)

    def test_sparse_or_empty_model_raises(self, spark):
        import pytest as _pytest

        from filebeat_to_clickhouse_spark.streaming.pipeline import cdf_gate_stream

        rows = spark.createDataFrame([(1, 5)], "rid bigint, score bigint")
        empty = spark.createDataFrame([], "q bigint, boundary bigint")
        with _pytest.raises(ValueError, match="boundary set mismatch"):
            cdf_gate_stream(rows, empty, "score")
        sparse = spark.createDataFrame([(1, 5), (3, 9)], "q bigint, boundary bigint")
        with _pytest.raises(ValueError, match="boundary set mismatch"):
            cdf_gate_stream(rows, sparse, "score")


class TestRocksDBRestartRecovery:
    """r10 (verdict item 5): the RocksDB state-store default (session.py)
    is only safe if a query's state SURVIVES a stop and a resume from the
    same checkpoint — RocksDB rebuilds state from its changelog/snapshot
    files on recovery, a path the previous in-memory default never
    exercised. This drives stop → resume with 20k keys of dedup state;
    the abrupt-kill half of the story (an uncommitted micro-batch replayed
    into the sink) is pinned separately by
    TestParquetIdempotentSink::test_crash_mid_install_replay_heals."""

    def test_dedup_state_survives_stop_and_resume(self, spark, tmp_path):
        import json as _json

        assert "RocksDB" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        src = tmp_path / "src"
        src.mkdir()
        out = str(tmp_path / "out_rocks")
        ck = str(tmp_path / "ck_rocks")
        n = 20_000

        def start():
            stream = (
                spark.readStream.schema("k bigint, ts timestamp").json(str(src))
            )
            dedup = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
                ["k"]
            )
            return (
                dedup.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )

        (src / "f0.json").write_text(
            "\n".join(
                _json.dumps({"k": i, "ts": "2024-01-01T10:00:00"}) for i in range(n)
            )
        )
        q = start()
        q.awaitTermination(180)
        assert not q.isActive

        # second run, SAME checkpoint: half the keys replay inside the
        # watermark horizon (must be dropped by the RESTORED state), half
        # are new (must pass)
        (src / "f1.json").write_text(
            "\n".join(
                _json.dumps({"k": i, "ts": "2024-01-01T10:30:00"})
                for i in range(n // 2, n + n // 2)
            )
        )
        q = start()
        q.awaitTermination(180)
        ks = sorted(r["k"] for r in spark.read.parquet(out).collect())
        assert ks == list(range(n + n // 2))
