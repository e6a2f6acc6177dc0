"""Protobuf wire codec (T3), gated on spark-protobuf availability.

The reference marshals each record as an ``events.Envelope`` protobuf
(reference main.go:332-342 via ``Envelope.Marshal()``).  Spark ≥3.4
ships ``pyspark.sql.protobuf.functions.to_protobuf/from_protobuf``,
which need a compiled descriptor set for ``events.proto``.  This
container has neither protoc nor a descriptor file, so:

- with a descriptor (``descriptor_path``): real protobuf bytes on the
  wire, byte-compatible with the reference's consumers;
- without: ``NotImplementedError`` — callers fall back to the JSON
  codec (streaming/envelope.py), which the reference ecosystem treats
  as an equivalent interchange encoding (easyjson codecs generated for
  the same schema, ``events_easyjson.go``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MESSAGE_NAME = "events.Envelope"


def _protobuf_fns():
    try:
        from pyspark.sql.protobuf import functions as pb
        return pb
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "spark-protobuf not on the classpath") from e


def envelope_to_protobuf(env_struct: Column,
                         descriptor_path: str | None = None) -> Column:
    """struct column → protobuf bytes.  Needs a descriptor set file."""
    if descriptor_path is None:
        raise NotImplementedError(
            "no compiled events.proto descriptor available in this "
            "environment; use envelope_to_json (JSON wire format)")
    pb = _protobuf_fns()
    return pb.to_protobuf(env_struct, MESSAGE_NAME,
                          descFilePath=descriptor_path)


def envelope_from_protobuf(data: Column,
                           descriptor_path: str | None = None) -> Column:
    """protobuf bytes → Envelope struct column."""
    if descriptor_path is None:
        raise NotImplementedError(
            "no compiled events.proto descriptor available in this "
            "environment; use from_json with schema.ENVELOPE")
    pb = _protobuf_fns()
    return pb.from_protobuf(data, MESSAGE_NAME,
                            descFilePath=descriptor_path)


def wire_encode(env: DataFrame,
                descriptor_path: str | None = None) -> DataFrame:
    """Serialize Envelope rows for the sink: protobuf when a
    descriptor is supplied, JSON otherwise."""
    from cga_logs_to_kinesis_spark.streaming.envelope import envelope_to_json
    if descriptor_path is None:
        return envelope_to_json(env)
    payload = envelope_to_protobuf(
        F.struct(*[F.col(c) for c in env.columns if c != "partition_key"]),
        descriptor_path).alias("data")
    return env.select(payload, F.col("partition_key"))
