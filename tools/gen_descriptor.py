"""Generate a compiled FileDescriptorSet for ``events.proto``.

The reference marshals ``events.Envelope`` protobufs (reference
main.go:332-342; schema per the generated Go code
``events/envelope.pb.go:100-116`` and ``events/log.pb.go:58-63``).
Spark's ``to_protobuf``/``from_protobuf`` need a *compiled descriptor
set* file; this container has neither ``protoc`` nor the Python
protobuf package, so this tool emits the descriptor by hand using the
protobuf wire format itself (descriptor.proto is an ordinary proto2
message: varints + length-delimited fields, nothing more).

The subset compiled is exactly the engine's Envelope projection —
the same fields ``streaming/envelope.py`` emits:

    syntax = "proto2"; package events;
    message Envelope {
      required string origin = 1;
      required EventType eventType = 2;
      optional int64 timestamp = 6;
      optional LogMessage logMessage = 8;
      enum EventType { HttpStartStop=4; LogMessage=5; ValueMetric=6;
                       CounterEvent=7; Error=8; ContainerMetric=9; }
    }
    message LogMessage {
      required bytes message = 1;
      required MessageType message_type = 2;
      required int64 timestamp = 3;
      optional string app_id = 4;
      optional string source_type = 5;
      optional string source_instance = 6;
      enum MessageType { OUT=1; ERR=2; }
    }

Field numbers, labels and enum values are copied from the reference's
generated code so wire bytes are compatible with its consumers.

Run:  python tools/gen_descriptor.py [out_path]
Default out:  cga_logs_to_kinesis_spark/streaming/events.desc
"""

from __future__ import annotations

import sys

# -- minimal proto2 wire-format encoder -------------------------------------

VARINT, LEN = 0, 2


def varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def field(num: int, wire: int, payload: bytes) -> bytes:
    return varint((num << 3) | wire) + payload


def f_varint(num: int, value: int) -> bytes:
    return field(num, VARINT, varint(value))


def f_bytes(num: int, value: bytes) -> bytes:
    return field(num, LEN, varint(len(value)) + value)


def f_str(num: int, value: str) -> bytes:
    return f_bytes(num, value.encode())


# -- descriptor.proto field numbers (google/protobuf/descriptor.proto) ------
# FileDescriptorSet.file = 1
# FileDescriptorProto: name=1 package=2 message_type=4 syntax=12
# DescriptorProto: name=1 field=2 enum_type=4
# FieldDescriptorProto: name=1 number=3 label=4 type=5 type_name=6
# EnumDescriptorProto: name=1 value=2
# EnumValueDescriptorProto: name=1 number=2

LABEL_OPTIONAL, LABEL_REQUIRED = 1, 2
TYPE_INT64, TYPE_STRING, TYPE_MESSAGE, TYPE_BYTES, TYPE_ENUM = 3, 9, 11, 12, 14


def fld(name: str, number: int, label: int, ftype: int,
        type_name: str | None = None) -> bytes:
    body = (f_str(1, name) + f_varint(3, number)
            + f_varint(4, label) + f_varint(5, ftype))
    if type_name:
        body += f_str(6, type_name)
    return f_bytes(2, body)          # DescriptorProto.field


def enum(name: str, values: list[tuple[str, int]]) -> bytes:
    body = f_str(1, name)
    for vname, vnum in values:
        body += f_bytes(2, f_str(1, vname) + f_varint(2, vnum))
    return f_bytes(4, body)          # DescriptorProto.enum_type


def message(name: str, *parts: bytes) -> bytes:
    return f_bytes(4, f_str(1, name) + b"".join(parts))
    # ^ FileDescriptorProto.message_type


def build_descriptor_set() -> bytes:
    envelope = message(
        "Envelope",
        fld("origin", 1, LABEL_REQUIRED, TYPE_STRING),
        fld("eventType", 2, LABEL_REQUIRED, TYPE_ENUM,
            ".events.Envelope.EventType"),
        fld("timestamp", 6, LABEL_OPTIONAL, TYPE_INT64),
        fld("logMessage", 8, LABEL_OPTIONAL, TYPE_MESSAGE,
            ".events.LogMessage"),
        enum("EventType", [("HttpStartStop", 4), ("LogMessage", 5),
                           ("ValueMetric", 6), ("CounterEvent", 7),
                           ("Error", 8), ("ContainerMetric", 9)]),
    )
    log_message = message(
        "LogMessage",
        fld("message", 1, LABEL_REQUIRED, TYPE_BYTES),
        fld("message_type", 2, LABEL_REQUIRED, TYPE_ENUM,
            ".events.LogMessage.MessageType"),
        fld("timestamp", 3, LABEL_REQUIRED, TYPE_INT64),
        fld("app_id", 4, LABEL_OPTIONAL, TYPE_STRING),
        fld("source_type", 5, LABEL_OPTIONAL, TYPE_STRING),
        fld("source_instance", 6, LABEL_OPTIONAL, TYPE_STRING),
        enum("MessageType", [("OUT", 1), ("ERR", 2)]),
    )
    file_proto = (f_str(1, "events.proto") + f_str(2, "events")
                  + envelope + log_message + f_str(12, "proto2"))
    return f_bytes(1, file_proto)    # FileDescriptorSet.file


DEFAULT_OUT = "cga_logs_to_kinesis_spark/streaming/events.desc"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    blob = build_descriptor_set()
    with open(out, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes to {out}")


if __name__ == "__main__":
    main()
