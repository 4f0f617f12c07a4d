"""Wire-format parsers as DataFrame transforms.

Each parser takes a DataFrame with a string column (default ``value``)
holding one HTTP request body (or one spooled line) and returns a DataFrame
of parsed events: the EVENT_SCHEMA fields at top level plus ``raw_json``
(the original wire text of the event, preserving unknown keys — the
reference's "Extra" catch-all, main.go:82, 405-431).

All parsing is ``from_json``/regexp expressions — JVM-side, codegen'd,
trivially parallel over any number of input partitions. Malformed input
degrades to skipped rows, mirroring the reference's silent-skip behavior
(main.go:276-279, 322-324).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import ArrayType

from ..checkpointing import default_checkpoint_dir as _default_ckpt_dir
from ..checkpointing import make_lineage_cut as _make_lineage_cut
from ..schema import BULK_ACTION_KEYS, EVENT_SCHEMA

_EVENT_ARRAY = ArrayType(EVENT_SCHEMA)


def _is_json_object(line: Column) -> Column:
    """True iff the line parses as a JSON object (reference requires a
    map-shaped document, main.go:292-299)."""
    return F.json_object_keys(line).isNotNull()


def _action_keys_only(keys: Column) -> Column:
    """True for the ES bulk action-line shape: a SINGLE top-level key that
    is an action verb (``{"index": {...}}``). Requiring the exact shape —
    not mere key presence — keeps documents that happen to carry a
    top-level ``index``/``create``/``update``/``delete`` field from being
    swallowed as actions."""
    return (F.size(keys) == 1) & F.arrays_overlap(
        keys, F.array(*[F.lit(k) for k in BULK_ACTION_KEYS])
    )


def _is_action_line(line: Column) -> Column:
    """Bulk action line (``index``/``create``/``update``/``delete``,
    main.go:284-288). Action lines carry no event data — only their
    presence is checked — so the stateless reformulation "a document is any
    JSON-object line that is not an action line" preserves the pairing
    semantics (incl. bare-document tolerance, main.go:291-305) without
    per-line state.

    KNOWN stateless divergence: the reference consumes the line AFTER an
    action unconditionally as the document (main.go:308+), so a stream of
    two consecutive action-shaped lines feeds the second to the document
    parser; here both classify as actions. Single-key action shape makes
    the ambiguous case a document whose only key is an action verb —
    vanishingly rarer than documents merely containing one.
    """
    keys = F.json_object_keys(line)
    return keys.isNotNull() & _action_keys_only(keys)


def _finish(parsed: DataFrame) -> DataFrame:
    """Expand the event struct to top level, keep the raw wire text."""
    return parsed.select(F.col("event.*"), F.col("raw_json"))


def parse_bulk_ndjson(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Elasticsearch Bulk NDJSON bodies → events (handleBulk, main.go:257-345).

    Tolerates blank lines, junk (non-JSON) lines, bare documents with no
    preceding action line, and any of the four action verbs — everything is
    an append, exactly like the reference.
    """
    lines = df.select(F.explode(F.split(F.col(value_col), "\n")).alias("line")).select(
        F.trim(F.col("line")).alias("line")
    )
    # The FULL key-set check runs only on lines whose first key is an action
    # verb (cheap prefix regex) — for a single-key object the first key is
    # the only key, so the regex is implied by the action shape; document
    # lines skip that tokenization entirely and pay one json_object_keys
    # gate + one from_json parse.
    line = F.col("line")
    action_pre = line.rlike(r'^\{\s*"(index|create|update|delete)"\s*:')
    is_action = F.when(action_pre, _action_keys_only(F.json_object_keys(line))).otherwise(F.lit(False))
    docs = lines.filter(
        (F.length("line") > 0)
        & ~F.coalesce(is_action, F.lit(False))
        & F.json_object_keys(line).isNotNull()
    )
    return _finish(
        docs.select(F.from_json(line, EVENT_SCHEMA).alias("event"), line.alias("raw_json"))
    )


def parse_json_array(df: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON array bodies → events (handleEvents /events, main.go:348-362)."""
    exploded = df.select(
        F.explode(F.from_json(F.col(value_col), _EVENT_ARRAY)).alias("event")
    )
    return _finish(exploded.select(F.col("event"), F.to_json("event").alias("raw_json")))


def parse_single(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Single JSON object bodies → events (handleFilebeat /filebeat /ingest,
    main.go:365-380). Non-object bodies are skipped.

    The gate is ``json_object_keys`` (a tokenize-only second scan of the
    text), NOT the corrupt-record trick: filtering on a field of the parsed
    struct re-evaluates ``from_json`` in the filter AND the projection —
    Catalyst has no CSE across operator boundaries — which measured 1.6×
    slower than tokenize+parse at sf0.1."""
    parsed = df.select(
        F.from_json(F.col(value_col), EVENT_SCHEMA).alias("event"),
        F.col(value_col).alias("raw_json"),
    ).filter(_is_json_object(F.col("raw_json")))
    return _finish(parsed)


def parse_logstash(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Logstash HTTP bodies → events (handleLogstash, main.go:562-609).

    Three-way fallback, as in the reference: JSON array of events → typed
    single event → arbitrary JSON object (unknown keys survive in raw_json).
    Expressed as a single coalesce over array-or-wrapped-single, then explode.
    """
    v = F.col(value_col)
    as_array = F.from_json(v, _EVENT_ARRAY)
    as_single = F.when(_is_json_object(v), F.array(F.from_json(v, EVENT_SCHEMA)))
    events = df.select(v.alias("value"), F.coalesce(as_array, as_single).alias("events")).filter(
        F.col("events").isNotNull()
    )
    exploded = events.select(F.col("value"), F.explode(F.col("events")).alias("event"))
    # raw text: the whole body for a single object; the re-serialized element
    # for array bodies (the reference likewise re-marshals array elements,
    # main.go:574-597 → 508-511).
    raw = F.when(
        F.ltrim(F.col("value")).startswith("["), F.to_json(F.col("event"))
    ).otherwise(F.col("value"))
    return _finish(exploded.select(F.col("event"), raw.alias("raw_json")))


def classify_lines(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Line-level ingest accounting — the upgrade over the reference's
    silent skip of unparseable input (A14, main.go:276-279, 322-324): every
    wire line is classified ``action`` / ``document`` / ``junk`` / ``blank``
    so parse loss is observable (dead-letter routing = filter on class).
    """
    lines = df.select(F.explode(F.split(F.col(value_col), "\n")).alias("line")).select(
        F.trim(F.col("line")).alias("line")
    )
    keys = F.json_object_keys(F.col("line"))
    cls = (
        F.when(F.length("line") == 0, F.lit("blank"))
        .when(keys.isNull(), F.lit("junk"))
        .when(_action_keys_only(keys), F.lit("action"))
        .otherwise(F.lit("document"))
    )
    return lines.select(F.col("line"), cls.alias("line_class"))


def parse_bulk_actions(df: DataFrame, value_col: str = "value", order_col: str = "body_seq") -> DataFrame:
    """ES bulk bodies → one row per ACTION with its paired document line:
    (seq, verb, action_id, doc_line).

    Where ``parse_bulk_ndjson`` implements the reference's semantics —
    every verb is an append, action metadata discarded (main.go:284-288
    recognizes index/create/update/delete and ignores them) — this parser
    keeps the verb and ``_id`` so ``replay_bulk_actions`` can apply real
    bulk semantics. Pairing is positional within a body: the action at
    line i takes the line at i+1 iff that line is a document (a delete is
    followed by the next action, so its pairing is naturally NULL; an
    action followed by junk pairs NULL and is observable). ``order_col``
    (BIGINT) orders bodies globally; intra-body order is the line index.
    Pairing rides a ``lead()`` window keyed on the body — ONE pass over
    the exploded lines (a positional self-join would derive the whole
    explode+classify chain twice and add a join exchange); a body is one
    HTTP request, so the per-partition state is bounded by body size.
    """
    lines = df.select(
        F.col(order_col).alias("_body"),
        F.posexplode(F.split(F.col(value_col), "\n")).alias("_idx", "_raw"),
    ).select("_body", "_idx", F.trim(F.col("_raw")).alias("line"))
    keys = F.json_object_keys(F.col("line"))
    action_pre = F.col("line").rlike(r'^\{\s*"(index|create|update|delete)"\s*:')
    is_action = F.when(action_pre, _action_keys_only(keys)).otherwise(F.lit(False))
    is_doc = (F.length("line") > 0) & ~F.coalesce(is_action, F.lit(False)) & keys.isNotNull()
    w = Window.partitionBy("_body").orderBy("_idx")
    tagged = lines.select(
        "_body",
        "_idx",
        "line",
        F.coalesce(is_action, F.lit(False)).alias("_is_action"),
        F.coalesce(is_doc, F.lit(False)).alias("_is_doc"),
    ).select(
        "_body",
        "_idx",
        "line",
        "_is_action",
        F.when(F.lead("_is_doc").over(w), F.lead("line").over(w)).alias("doc_line"),
    )
    paired = tagged.filter(F.col("_is_action")).select(
        "_body",
        "_idx",
        F.element_at(F.json_object_keys(F.col("line")), 1).alias("verb"),
        F.coalesce(
            *[F.get_json_object("line", f"$.{k}._id") for k in BULK_ACTION_KEYS]
        ).alias("action_id"),
        "doc_line",
    )
    # 2^20 lines per body of packing headroom (Filebeat bulk bodies run to
    # thousands of lines; 10^6 bodies × 2^20 lines stays under 2^63)
    seq = F.col("_body") * F.lit(1 << 20) + F.col("_idx")
    # auto-id actions ('{"index":{}}' — the form Filebeat itself sends)
    # create a NEW document each, so each gets a unique synthetic id; an
    # id-less update/delete is invalid in ES (rejected per item) and stays
    # NULL for the replay fns to drop. The synthetic id is a seq-keyed
    # md5, not the bare sequence number: _id shares one namespace with
    # client-chosen ids (as in ES itself), and a guessable '_auto_<n>'
    # would let an ORDINARY client id accidentally collide with — and
    # silently merge into — an auto-id document; the digest makes that
    # 2^-64. Determinism is deliberate (the id must be replay-stable
    # across Spark task retries, so true randomness is off the table),
    # which means a client that intentionally computes this formula can
    # still collide — the same trust model as client-supplied _ids in
    # general: ES does not authenticate id ownership either, only its
    # RANDOM auto-ids are unguessable, and an adversarial producer on a
    # shared index can always overwrite ids it can name
    return paired.select(
        seq.alias("seq"),
        "verb",
        F.coalesce(
            "action_id",
            F.when(
                F.col("verb").isin("index", "create"),
                F.concat(
                    F.lit("_auto_"),
                    F.md5(F.concat(F.lit("fbck:auto-id:"), seq.cast("string"))),
                ),
            ),
        ).alias("action_id"),
        "doc_line",
    )


def replay_bulk_actions(paired: DataFrame) -> DataFrame:
    """Apply bulk action semantics → final per-``_id`` state:
    (action_id, n_ops, last_verb, present, last_message).

    Last-writer-wins per ``_id`` in wire order (the packed ``seq``), a
    trailing ``delete`` leaves the id absent (``present`` false), and
    index/create/update all materialize their paired document (update is
    treated as full replacement — the partial-``doc``-merge form of the
    ES update API is out of scope and documented as such). One
    map-side-combinable max(struct) per id — uniform key, no window, no
    state beyond the 1-row-per-id aggregate, so replay scales like exact
    dedup. The reference ignores verbs entirely (everything appends);
    this closes that declared gap (SURVEY §7.5).

    NULL action_id rows (id-less update/delete — ES rejects those per
    item; auto-id index/create got synthetic ids at parse) are dropped.
    """
    last = paired.filter(F.col("action_id").isNotNull()).groupBy("action_id").agg(
        F.max(F.struct("seq", "verb", "doc_line")).alias("_last"),
        F.count(F.lit(1)).alias("n_ops"),
    )
    lv = F.col("_last.verb")
    return last.select(
        "action_id",
        "n_ops",
        lv.alias("last_verb"),
        (lv != F.lit("delete")).alias("present"),
        F.when(lv != "delete", F.get_json_object(F.col("_last.doc_line"), "$.message")).alias(
            "last_message"
        ),
    )


def replay_bulk_actions_partial(paired: DataFrame) -> DataFrame:
    """ES bulk semantics WITH partial-``doc`` update merge → final
    per-id FIELD state: (action_id, field, value), one row per live
    field of each surviving document.

    This is the one form ``replay_bulk_actions`` declares out of scope
    (it treats update as full replacement): the ES update API's
    ``{"doc": {...}}`` body merges its fields SHALLOWLY into the current
    document. It goes beyond even the reference, which ignores action
    verbs entirely (main.go:284-288). Semantics, matching ES:

    - ``index``/``create`` fully replace the document (fields absent
      from the new body are gone);
    - ``update`` overlays only the fields in its ``doc`` wrapper;
    - ``delete`` removes the document; an update landing after a delete
      (or on a never-indexed id) creates from the partial — the
      ``doc_as_upsert`` behavior, chosen so replay is total;
    - ids whose final state is deleted emit no rows.

    Relational formulation (no per-id sequential fold): a field's final
    value comes from the latest SETTER at or after the id's last RESET
    (reset = index/create/delete, since each wipes prior fields): one
    max(struct) per id finds the reset, field rows explode from the
    reset body and from updates after it, one max(struct) per
    (id, field) picks the winner. Both aggregates are map-side
    combinable on uniform keys — replay scales like exact dedup, and
    wire order is totally captured by the packed ``seq``.

    NULL action_id rows (id-less update/delete — ES rejects those per
    item; auto-id index/create got synthetic ids at parse) are dropped:
    they must not survive via the update branch's null-join escape.
    """
    paired = paired.filter(F.col("action_id").isNotNull())
    # paired feeds the reset aggregate plus the base and update branches
    # (three derivations of the parse chain without a cut — measured 6
    # source scans in the registered fixture's executed plan)
    paired = _make_lineage_cut(_default_ckpt_dir())(paired, eager=False)
    resets = (
        paired.filter(F.col("verb") != "update")
        .groupBy("action_id")
        .agg(F.max(F.struct("seq", "verb")).alias("_r"))
    )
    acts = paired.join(
        resets.select(
            "action_id", F.col("_r.seq").alias("_rseq"), F.col("_r.verb").alias("_rverb")
        ),
        "action_id",
        "left",
    )
    base = acts.filter(
        (F.col("verb") != "update")
        & (F.col("seq") == F.col("_rseq"))
        & (F.col("_rverb") != F.lit("delete"))
    )
    base_fields = base.select(
        "action_id",
        "seq",
        F.explode(F.from_json("doc_line", "map<string,string>")).alias("field", "value"),
    )
    upd = acts.filter(
        (F.col("verb") == "update")
        & (F.col("_rseq").isNull() | (F.col("seq") > F.col("_rseq")))
    )
    upd_fields = upd.select(
        "action_id",
        "seq",
        F.explode(
            F.from_json(F.get_json_object("doc_line", "$.doc"), "map<string,string>")
        ).alias("field", "value"),
    )
    return (
        base_fields.unionByName(upd_fields)
        .groupBy("action_id", "field")
        .agg(F.max(F.struct("seq", "value")).alias("_last"))
        .select("action_id", "field", F.col("_last.value").alias("value"))
    )
