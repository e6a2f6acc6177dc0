"""Compiled events.proto descriptor: structural proof (pure-Python
wire decode, runs everywhere) + Spark round-trip (gated on the
spark-protobuf connector jar, reference main.go:332-342)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.streaming.protobuf_codec import (
    default_descriptor_path,
    envelope_from_protobuf,
    envelope_to_protobuf,
)
from tools.gen_descriptor import build_descriptor_set

# -- minimal wire decoder (inverse of tools/gen_descriptor.py) --------------


def read_varint(buf, i):
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over one message."""
    i = 0
    while i < len(buf):
        tag, i = read_varint(buf, i)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            val, i = read_varint(buf, i)
        elif wire == 2:
            ln, i = read_varint(buf, i)
            val, i = buf[i:i + ln], i + ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        yield num, wire, val


def group(buf):
    out = {}
    for num, _w, val in fields(buf):
        out.setdefault(num, []).append(val)
    return out


def test_descriptor_set_structure():
    """The checked-in bytes parse as a FileDescriptorSet declaring the
    reference's Envelope/LogMessage schema with the generated-code
    field numbers (envelope.pb.go:100-116, log.pb.go:58-63)."""
    path = default_descriptor_path()
    assert path is not None, "events.desc missing from the package"
    with open(path, "rb") as f:
        blob = f.read()
    assert blob == build_descriptor_set()       # tool output is current

    fds = group(blob)
    [file_proto] = fds[1]                       # FileDescriptorSet.file
    fp = group(file_proto)
    assert fp[1] == [b"events.proto"] and fp[2] == [b"events"]
    assert fp[12] == [b"proto2"]

    msgs = {}
    for m in fp[4]:                             # message_type
        g = group(m)
        flds = {}
        for fld in g.get(2, []):
            fg = group(fld)
            flds[fg[1][0].decode()] = {
                "number": fg[3][0], "label": fg[4][0], "type": fg[5][0],
                "type_name": fg.get(6, [b""])[0].decode()}
        enums = {}
        for en in g.get(4, []):
            eg = group(en)
            enums[eg[1][0].decode()] = {
                group(v)[1][0].decode(): group(v)[2][0]
                for v in eg.get(2, [])}
        msgs[g[1][0].decode()] = (flds, enums)

    env_fields, env_enums = msgs["Envelope"]
    assert env_fields["origin"] == {
        "number": 1, "label": 2, "type": 9, "type_name": ""}
    assert env_fields["eventType"]["number"] == 2
    assert env_fields["timestamp"]["number"] == 6
    assert env_fields["logMessage"] == {
        "number": 8, "label": 1, "type": 11,
        "type_name": ".events.LogMessage"}
    assert env_enums["EventType"]["LogMessage"] == 5

    lm_fields, lm_enums = msgs["LogMessage"]
    assert lm_fields["message"] == {
        "number": 1, "label": 2, "type": 12, "type_name": ""}
    assert {n: f["number"] for n, f in lm_fields.items()} == {
        "message": 1, "message_type": 2, "timestamp": 3,
        "app_id": 4, "source_type": 5, "source_instance": 6}
    assert lm_enums["MessageType"] == {"OUT": 1, "ERR": 2}


def test_protobuf_spark_roundtrip_gated(spark):
    """Where the spark-protobuf jar exists: struct → protobuf bytes →
    struct must round-trip.  Cleanly skipped where the jar is absent
    (this container)."""
    env = spark.createDataFrame(
        [("inst-1", 5, 1_700_000_000_000_000_000,
          (b"hello", "OUT", 1_700_000_000_000_000_000,
           "app-1", "bosh", "0"))],
        "origin string, eventType int, timestamp long, "
        "logMessage struct<message: binary, message_type: string, "
        "timestamp: long, app_id: string, source_type: string, "
        "source_instance: string>")
    try:
        wire = env.select(envelope_to_protobuf(
            F.struct(*env.columns)).alias("data"))
        back = wire.select(envelope_from_protobuf(
            F.col("data")).alias("env")).select("env.*").collect()
    except NotImplementedError as e:
        pytest.skip(f"spark-protobuf unavailable: {e}")
    [r] = back
    assert r.origin == "inst-1"
    assert bytes(r.logMessage.message) == b"hello"
    assert r.logMessage.source_type == "bosh"
