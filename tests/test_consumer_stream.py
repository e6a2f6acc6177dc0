"""Streaming Kinesis-consumer source (reference kinesis.go:374-423):
GetShardIterator/GetRecords paging → spool → Spark stream, round-trip
against the producing sink."""

from __future__ import annotations

import base64
import json

from cga_logs_to_kinesis_spark.sources.consumer import (
    DirStreamClient,
    DirStreamTransport,
    ShardPoller,
    read_consumer_stream,
)
from cga_logs_to_kinesis_spark.sources.pages import decode_envelopes
from cga_logs_to_kinesis_spark.streaming.faults import JsonDirTransport
from cga_logs_to_kinesis_spark.streaming.pipeline import (
    PipelineConfig,
    build_pipeline,
)


def put(transport, stream, items):
    transport.send(stream, [(d.encode(), k) for d, k in items])


def test_client_pages_in_sequence_order(tmp_path):
    tp = DirStreamTransport(str(tmp_path), n_shards=1)
    put(tp, "s", [("a", "k1"), ("b", "k2")])
    put(tp, "s", [("c", "k1")])

    c = DirStreamClient(str(tmp_path))
    assert c.shard_ids("s") == ["shard-0000"]
    it = c.get_shard_iterator("s", "shard-0000")
    page = c.get_records(it, limit=2)
    assert [r.data for r in page.records] == [b"a", b"b"]
    page2 = c.get_records(page.next_shard_iterator, limit=10)
    assert [r.data for r in page2.records] == [b"c"]
    # fully caught up: empty page, iterator stable
    page3 = c.get_records(page2.next_shard_iterator)
    assert page3.records == ()


def test_sharding_by_partition_key(tmp_path):
    tp = DirStreamTransport(str(tmp_path), n_shards=4)
    keys = [f"key-{i}" for i in range(40)]
    put(tp, "s", [(f"d{i}", k) for i, k in enumerate(keys)])
    c = DirStreamClient(str(tmp_path))
    shards = c.shard_ids("s")
    assert len(shards) > 1                     # keys spread over shards
    seen = []
    for sh in shards:
        page = c.get_records(c.get_shard_iterator("s", sh), limit=100)
        # a key's records always land in one shard
        seen.extend(r.partition_key for r in page.records)
    assert sorted(seen) == sorted(keys)


def test_latest_and_after_sequence_iterators(tmp_path):
    tp = DirStreamTransport(str(tmp_path), n_shards=1)
    put(tp, "s", [("old", "k")])
    c = DirStreamClient(str(tmp_path))
    latest = c.get_shard_iterator("s", "shard-0000", "LATEST")
    put(tp, "s", [("new", "k")])
    page = c.get_records(latest)
    assert [r.data for r in page.records] == [b"new"]

    seq = page.records[0].sequence_number
    it = c.get_shard_iterator("s", "shard-0000",
                              "AFTER_SEQUENCE_NUMBER", after_sequence=seq)
    assert c.get_records(it).records == ()     # nothing after the last


def test_poller_resumes_after_restart(tmp_path):
    tp = DirStreamTransport(str(tmp_path / "stream"), n_shards=2)
    spool = tmp_path / "spool"
    spool.mkdir()
    put(tp, "s", [(f"r{i}", f"k{i}") for i in range(5)])

    c = DirStreamClient(str(tmp_path / "stream"))
    p1 = ShardPoller(client=c, stream="s", spool_dir=str(spool))
    p1._load_state()
    assert p1.poll_once() == 5
    p1._save_state()

    put(tp, "s", [("late", "k9")])
    p2 = ShardPoller(client=c, stream="s", spool_dir=str(spool))
    p2._load_state()
    assert p2.poll_once() == 1                 # only the new record
    lines = []
    for f in spool.glob("*.jsonl"):
        lines.extend(json.loads(ln) for ln in f.read_text().splitlines())
    assert sorted(base64.b64decode(ln["wire_b64"]).decode()
                  for ln in lines) == sorted(
        [f"r{i}" for i in range(5)] + ["late"])


def test_spool_preserves_arbitrary_bytes(spark, tmp_path):
    """Record payloads are opaque bytes (reference kinesis.go:477-489
    — Envelope.Marshal() protobuf wire); the spool must round-trip
    them bit-exact, including bytes invalid as UTF-8."""
    payloads = [
        b"\x0a\x05hello\x10\xff\x01",          # protobuf-ish wire
        bytes(range(256)),                      # every byte value
        "unicode-ok ✓".encode(),                # valid UTF-8 too
    ]
    tp = DirStreamTransport(str(tmp_path / "stream"), n_shards=1)
    tp.send("s", [(d, f"k{i}") for i, d in enumerate(payloads)])

    spool = tmp_path / "spool"
    spool.mkdir()
    poller = ShardPoller(client=DirStreamClient(str(tmp_path / "stream")),
                         stream="s", spool_dir=str(spool))
    poller._load_state()
    assert poller.poll_once() == 3

    wire = read_consumer_stream(spark, str(spool))
    q = (wire.writeStream.format("memory").queryName("raw_spool")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT wire_bytes FROM raw_spool ORDER BY sequence_number"
    ).collect()
    assert [bytes(r.wire_bytes) for r in got] == payloads


def test_legacy_spool_rows_recovered_not_nulled(spark, tmp_path):
    """Pre-base64 spool files (a ``wire`` text field, no ``wire_b64``)
    left behind by an in-place upgrade must surface their payloads via
    encode(wire, 'utf-8') — not silently read as NULL."""
    spool = tmp_path / "spool"
    spool.mkdir()
    legacy = {"wire": "old-format line", "partition_key": "k0",
              "shard_id": "shard-0000",
              "sequence_number": "00000000000000000001.jsonl:000000000",
              "approximate_arrival_ts": 1.0}
    modern = {"wire_b64": base64.b64encode(b"new-format line").decode(),
              "partition_key": "k1", "shard_id": "shard-0000",
              "sequence_number": "00000000000000000002.jsonl:000000000",
              "approximate_arrival_ts": 2.0}
    (spool / "00000000000000000001.jsonl").write_text(
        json.dumps(legacy) + "\n")
    (spool / "00000000000000000002.jsonl").write_text(
        json.dumps(modern) + "\n")

    wire = read_consumer_stream(spark, str(spool))
    q = (wire.writeStream.format("memory").queryName("legacy_spool")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT wire_bytes, wire FROM legacy_spool "
        "ORDER BY sequence_number").collect()
    assert [bytes(r.wire_bytes) for r in got] == [
        b"old-format line", b"new-format line"]
    assert [r.wire for r in got] == ["old-format line", "new-format line"]


def test_wire_string_view_substitutes_invalid_utf8(spark, tmp_path):
    """The ``wire`` column is a deterministic UTF-8 view: invalid byte
    sequences become U+FFFD (Python ``decode('utf-8', 'replace')``
    semantics), never an invalid UTF8String flowing into string
    functions."""
    payload = b"ok \xff\xfe end"
    tp = DirStreamTransport(str(tmp_path / "stream"), n_shards=1)
    tp.send("s", [(payload, "k")])
    spool = tmp_path / "spool"
    spool.mkdir()
    poller = ShardPoller(client=DirStreamClient(str(tmp_path / "stream")),
                         stream="s", spool_dir=str(spool))
    poller._load_state()
    assert poller.poll_once() == 1

    wire = read_consumer_stream(spark, str(spool))
    q = (wire.writeStream.format("memory").queryName("utf8_spool")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    [row] = spark.sql(
        "SELECT wire_bytes, wire FROM utf8_spool").collect()
    assert bytes(row.wire_bytes) == payload          # bit-exact binary
    assert row.wire.startswith("ok ") and row.wire.endswith(" end")
    assert "�" in row.wire                      # replaced, not raw
    assert "\xff" not in row.wire


def test_consumer_stream_round_trip_with_sink(spark, tmp_path):
    """sink → fake stream → poller → readStream → decode: the consumed
    rows match what the producer pipeline delivered (parity with the
    batch_pages decode path)."""
    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "a.log").write_text("alpha\nbeta\n")
    (watch / "b.log").write_text("gamma\n")

    # produce through the real pipeline into the fake stream AND a
    # plain dir transport (the already-verified batch decode reference)
    stream_dir = tmp_path / "stream"
    ref_dir = tmp_path / "ref"

    class Tee(DirStreamTransport):
        def __init__(self, stream_dir, ref):
            super().__init__(stream_dir, n_shards=2)
            self.ref = ref

        def send(self, stream, page):
            self.ref.send(stream, page)
            return super().send(stream, page)

    query, stats = build_pipeline(
        spark,
        PipelineConfig(watch_dir=str(watch), glob="*.log",
                       origin="inst-c",
                       checkpoint_dir=str(tmp_path / "ckpt1"),
                       available_now=True),
        Tee(str(stream_dir), JsonDirTransport(str(ref_dir))))
    query.awaitTermination(120)
    assert stats.records_sent == 3

    # consume: poll the stream, then drain the spool as a Spark stream
    spool = tmp_path / "spool"
    spool.mkdir()
    poller = ShardPoller(client=DirStreamClient(str(stream_dir)),
                         stream="logs", spool_dir=str(spool))
    poller._load_state()
    assert poller.poll_once() == 3

    wire = read_consumer_stream(spark, str(spool))
    assert wire.isStreaming
    decoded = decode_envelopes(wire, col="wire")
    q = (decoded.writeStream.format("memory").queryName("consumed")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM consumed").collect()
    assert len(got) == 3
    assert all(not r.is_corrupt for r in got)
    msgs = {bytes(r.log_message.message).decode() for r in got}
    assert msgs == {"alpha", "beta", "gamma"}

    # parity with the delivered reference copy
    ref_msgs = set()
    for f in ref_dir.glob("page-*.json"):
        for data, _k in json.loads(f.read_text()):
            raw = json.loads(data)["log_message"]["message"]
            ref_msgs.add(base64.b64decode(raw).decode())
    assert ref_msgs == msgs


def test_sigv4_consumer_against_local_kinesis_fake():
    """The no-boto3 consumer wire path, offline: ListShards /
    GetShardIterator / GetRecords as signed x-amz-json-1.1 calls
    against a local http.server Kinesis double that independently
    RE-SIGNS every request (403 on mismatch) and pages an in-memory
    shard — TRIM_HORIZON paging, iterator continuation, and
    AFTER_SEQUENCE_NUMBER resume all exercised."""
    import contextlib
    import http.server
    import threading

    from cga_logs_to_kinesis_spark.functions.credentials import (
        Credentials, Provider,
    )
    from cga_logs_to_kinesis_spark.functions.sigv4 import sign_request
    from cga_logs_to_kinesis_spark.sources.consumer import (
        sigv4_consumer_client,
    )

    creds = Credentials("AKTEST", "SKTEST", None)

    class StaticProv(Provider):
        def get(self):
            return creds

    shard = [  # (sequence_number, data_b64, partition_key)
        ("101", base64.b64encode(b"rec-a").decode(), "k1"),
        ("102", base64.b64encode(b"rec-b").decode(), "k2"),
        ("103", base64.b64encode(b"rec-c").decode(), "k1"),
    ]

    class KinesisFake(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            expect = sign_request(
                access_key=creds.access_key,
                secret_key=creds.secret_key,
                region="us-east-1", service="kinesis", method="POST",
                path="/", query=[],
                headers={
                    "Host": self.headers["Host"],
                    "Content-Type": self.headers["Content-Type"],
                    "X-Amz-Target": self.headers["X-Amz-Target"],
                    "X-Amz-Date": self.headers["X-Amz-Date"],
                },
                payload=body)
            if self.headers["Authorization"] != expect.authorization:
                self.send_error(403, "signature mismatch")
                return
            target = self.headers["X-Amz-Target"].split(".")[-1]
            req = json.loads(body)
            if target == "ListShards":
                out = {"Shards": [{"ShardId": "shardId-000000000000"}]}
            elif target == "GetShardIterator":
                if req["ShardIteratorType"] == "TRIM_HORIZON":
                    pos = 0
                elif req["ShardIteratorType"] == "AFTER_SEQUENCE_NUMBER":
                    seqs = [s for s, _, _ in shard]
                    pos = seqs.index(req["StartingSequenceNumber"]) + 1
                else:
                    pos = len(shard)
                out = {"ShardIterator": f"it:{pos}"}
            elif target == "GetRecords":
                pos = int(req["ShardIterator"].split(":")[1])
                limit = req.get("Limit", 500)
                page = shard[pos:pos + limit]
                out = {
                    "Records": [
                        {"Data": d, "PartitionKey": k,
                         "SequenceNumber": s,
                         "ApproximateArrivalTimestamp": 1.5}
                        for s, d, k in page],
                    "NextShardIterator": f"it:{pos + len(page)}",
                    "MillisBehindLatest": 0,
                }
            else:
                self.send_error(400, f"unknown target {target}")
                return
            resp = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

    @contextlib.contextmanager
    def serve():
        srv = http.server.HTTPServer(("127.0.0.1", 0), KinesisFake)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            yield f"http://127.0.0.1:{srv.server_address[1]}"
        finally:
            srv.shutdown()
            t.join(timeout=5)

    with serve() as url:
        c = sigv4_consumer_client("us-east-1", provider=StaticProv(),
                                  endpoint_url=url)
        assert c.shard_ids("s") == ["shardId-000000000000"]
        it = c.get_shard_iterator("s", "shardId-000000000000")
        page = c.get_records(it, limit=2)
        assert [r.data for r in page.records] == [b"rec-a", b"rec-b"]
        assert [r.partition_key for r in page.records] == ["k1", "k2"]
        page2 = c.get_records(page.next_shard_iterator, limit=10)
        assert [r.data for r in page2.records] == [b"rec-c"]
        # resume AFTER_SEQUENCE_NUMBER — the poller's restart path
        it3 = c.get_shard_iterator("s", "shardId-000000000000",
                                   "AFTER_SEQUENCE_NUMBER",
                                   after_sequence="101")
        page3 = c.get_records(it3, limit=10)
        assert [r.sequence_number for r in page3.records] == \
            ["102", "103"]


def test_sigv4_consumer_drives_full_streaming_ingest(spark, tmp_path):
    """S7 end-to-end on the SIGNED wire path (r13 verdict next-#4):
    producer pipeline → dir stream → a local http.server Kinesis fake
    that independently RE-SIGNS every request (403 on mismatch) and
    DELEGATES paging to DirStreamClient → ShardPoller driving
    sigv4_consumer_client → spool → Spark file stream → envelope
    decode.  Then a poller RESTART picks up a late record via a
    wire-signed AFTER_SEQUENCE_NUMBER resume — the same round-trip +
    resume contract the DirStreamClient path pins, now proven through
    the stdlib signed client end to end."""
    import contextlib
    import http.server
    import threading

    from cga_logs_to_kinesis_spark.functions.credentials import (
        Credentials,
        Provider,
    )
    from cga_logs_to_kinesis_spark.functions.sigv4 import sign_request
    from cga_logs_to_kinesis_spark.sources.consumer import (
        sigv4_consumer_client,
    )

    creds = Credentials("AKTEST", "SKTEST", None)

    class StaticProv(Provider):
        def get(self):
            return creds

    stream_dir = tmp_path / "stream"
    delegate = DirStreamClient(str(stream_dir))

    class KinesisFake(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            expect = sign_request(
                access_key=creds.access_key,
                secret_key=creds.secret_key,
                region="us-east-1", service="kinesis", method="POST",
                path="/", query=[],
                headers={
                    "Host": self.headers["Host"],
                    "Content-Type": self.headers["Content-Type"],
                    "X-Amz-Target": self.headers["X-Amz-Target"],
                    "X-Amz-Date": self.headers["X-Amz-Date"],
                },
                payload=body)
            if self.headers["Authorization"] != expect.authorization:
                self.send_error(403, "signature mismatch")
                return
            target = self.headers["X-Amz-Target"].split(".")[-1]
            req = json.loads(body)
            if target == "ListShards":
                out = {"Shards": [
                    {"ShardId": s}
                    for s in delegate.shard_ids(req["StreamName"])]}
            elif target == "GetShardIterator":
                out = {"ShardIterator": delegate.get_shard_iterator(
                    req["StreamName"], req["ShardId"],
                    req["ShardIteratorType"],
                    after_sequence=req.get("StartingSequenceNumber"))}
            elif target == "GetRecords":
                page = delegate.get_records(
                    req["ShardIterator"], limit=req.get("Limit", 500))
                out = {
                    "Records": [
                        {"Data": base64.b64encode(r.data).decode(),
                         "PartitionKey": r.partition_key,
                         "SequenceNumber": r.sequence_number,
                         "ApproximateArrivalTimestamp":
                             r.approximate_arrival_ts}
                        for r in page.records],
                    "NextShardIterator": page.next_shard_iterator,
                    "MillisBehindLatest": page.millis_behind_latest,
                }
            else:
                self.send_error(400, f"unknown target {target}")
                return
            resp = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

    @contextlib.contextmanager
    def serve():
        srv = http.server.HTTPServer(("127.0.0.1", 0), KinesisFake)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            yield f"http://127.0.0.1:{srv.server_address[1]}"
        finally:
            srv.shutdown()
            t.join(timeout=5)

    # 1. produce through the real pipeline into the dir stream
    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "a.log").write_text("alpha\nbeta\n")
    (watch / "b.log").write_text("gamma\n")
    query, stats = build_pipeline(
        spark,
        PipelineConfig(watch_dir=str(watch), glob="*.log",
                       origin="inst-s7",
                       checkpoint_dir=str(tmp_path / "ckpt1"),
                       available_now=True),
        DirStreamTransport(str(stream_dir), n_shards=2))
    query.awaitTermination(120)
    assert stats.records_sent == 3

    spool = tmp_path / "spool"
    spool.mkdir()
    with serve() as url:
        wire_client = sigv4_consumer_client(
            "us-east-1", provider=StaticProv(), endpoint_url=url)

        # 2. poll over the signed wire, drain the spool as a stream
        p1 = ShardPoller(client=wire_client, stream="logs",
                         spool_dir=str(spool))
        p1._load_state()
        assert p1.poll_once() == 3
        p1._save_state()

        decoded = decode_envelopes(
            read_consumer_stream(spark, str(spool)), col="wire")
        q = (decoded.writeStream.format("memory")
             .queryName("sigv4_consumed")
             .option("checkpointLocation", str(tmp_path / "ckpt2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sigv4_consumed").collect()
        assert len(got) == 3
        assert all(not r.is_corrupt for r in got)
        assert {bytes(r.log_message.message).decode() for r in got} \
            == {"alpha", "beta", "gamma"}

        # 3. restart: a late record arrives through the producer
        # pipeline (its checkpoint ships only the new file); a FRESH
        # poller resumes from saved state — an AFTER_SEQUENCE_NUMBER
        # iterator over the signed wire — and fetches exactly it
        (watch / "c.log").write_text("delta\n")
        query2, stats2 = build_pipeline(
            spark,
            PipelineConfig(watch_dir=str(watch), glob="*.log",
                           origin="inst-s7",
                           checkpoint_dir=str(tmp_path / "ckpt1"),
                           available_now=True),
            DirStreamTransport(str(stream_dir), n_shards=2))
        query2.awaitTermination(120)
        assert stats2.records_sent == 1
        p2 = ShardPoller(client=wire_client, stream="logs",
                         spool_dir=str(spool))
        p2._load_state()
        assert p2.poll_once() == 1          # only the new record
        q2 = (decoded.writeStream.format("memory")
              .queryName("sigv4_consumed2")
              .option("checkpointLocation", str(tmp_path / "ckpt3"))
              .trigger(availableNow=True).start())
        q2.awaitTermination(120)
        full = spark.sql("SELECT * FROM sigv4_consumed2").collect()
        assert len(full) == 4               # no dupes from the resume
        assert all(not r.is_corrupt for r in full)
        assert {bytes(r.log_message.message).decode() for r in full} \
            == {"alpha", "beta", "gamma", "delta"}
