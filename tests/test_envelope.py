"""T1 Envelope projection semantics, field for field against the
reference's constants (main.go:324-347)."""

from __future__ import annotations

import json

from cga_logs_to_kinesis_spark.streaming.envelope import (
    EVENT_TYPE_LOG,
    MESSAGE_TYPE_OUT,
    SOURCE_TYPE,
    envelope_projection,
    envelope_to_json,
)


def test_envelope_fields(spark, tmp_path):
    log = tmp_path / "app.log"
    log.write_text("line one\nline two\n")
    lines = spark.read.format("text").load(str(tmp_path))
    env = envelope_projection(lines, origin="inst-7").collect()

    assert len(env) == 2
    for row in env:
        assert row.origin == "inst-7"                 # $INSTANCE
        assert row.event_type == EVENT_TYPE_LOG       # always LogMessage
        lm = row.log_message
        assert lm.message_type == MESSAGE_TYPE_OUT    # OUT even for stderr
        assert lm.source_type == SOURCE_TYPE          # constant "bosh"
        assert lm.source_instance.endswith("app.log")  # file path
        assert row.partition_key == lm.source_instance  # key = path
        assert row.timestamp > 1_500_000_000 * 10**9  # ingest-time ns
    msgs = sorted(bytes(r.log_message.message).decode() for r in env)
    assert msgs == ["line one", "line two"]


def test_envelope_json_wire_format(spark, tmp_path):
    (tmp_path / "a.log").write_text("hello\n")
    lines = spark.read.format("text").load(str(tmp_path))
    wire = envelope_to_json(envelope_projection(lines, "o")).collect()
    assert len(wire) == 1
    assert set(wire[0].asDict()) == {"data", "partition_key"}
    payload = json.loads(wire[0].data)
    assert payload["event_type"] == "LogMessage"
    assert payload["log_message"]["source_type"] == "bosh"
