"""S8 stream admin: create/delete/list/describe + REAL resharding —
SplitShard / MergeShards change where subsequent records route while
closed parents stay readable, the semantics a resharding consumer
actually depends on (reference kinesis.go:252-372)."""

from __future__ import annotations

import pytest

from cga_logs_to_kinesis_spark.sources.admin import (
    MAX_HASH_KEY,
    DirStreamAdmin,
    hash_key_for,
    wait_active,
)
from cga_logs_to_kinesis_spark.sources.consumer import (
    DirStreamClient,
    DirStreamTransport,
)


def _all_records(client, stream):
    out = []
    for sid in client.shard_ids(stream):
        it = client.get_shard_iterator(stream, sid)
        page = client.get_records(it, limit=10_000)
        out += [(sid, r.partition_key, r.data) for r in page.records]
    return out


def test_create_describe_list_delete_lifecycle(tmp_path):
    admin = DirStreamAdmin(str(tmp_path))
    admin.create_stream("logs", 3)
    d = admin.describe_stream("logs")
    assert d.stream_status == "ACTIVE"
    assert len(d.shards) == 3 and all(s.open for s in d.shards)
    # ranges are disjoint and cover the full 128-bit space
    spans = sorted((s.hash_start, s.hash_end) for s in d.shards)
    assert spans[0][0] == 0 and spans[-1][1] == MAX_HASH_KEY
    for (_, e1), (s2, _) in zip(spans, spans[1:]):
        assert e1 + 1 == s2
    # duplicate create is an error, like the real API
    with pytest.raises(FileExistsError):
        admin.create_stream("logs", 1)
    admin.create_stream("audit", 1)
    admin.create_stream("metrics", 1)
    # paged listing: ExclusiveStartStreamName + HasMoreStreams
    page1 = admin.list_streams(limit=2)
    assert page1.stream_names == ("audit", "logs")
    assert page1.has_more_streams
    page2 = admin.list_streams(limit=2,
                               exclusive_start=page1.stream_names[-1])
    assert page2.stream_names == ("metrics",)
    assert not page2.has_more_streams
    admin.delete_stream("audit")
    assert "audit" not in admin.list_streams().stream_names
    with pytest.raises(KeyError):
        admin.describe_stream("audit")


def test_wait_active_polls_through_creating_window(tmp_path):
    admin = DirStreamAdmin(str(tmp_path))
    admin.create_stream("slow", 2, creating_describes=3)
    assert admin.describe_stream("slow").stream_status == "CREATING"
    # 2 CREATING describes remain, the 3rd poll sees ACTIVE
    assert wait_active(admin, "slow") == 3
    with pytest.raises(TimeoutError):
        admin.create_stream("never", 1, creating_describes=99)
        wait_active(admin, "never", max_describes=5)


def test_admin_stream_routes_by_hash_range(tmp_path):
    """Records land in exactly the open shard owning
    md5(partition_key) — the contract resharding is built on."""
    admin = DirStreamAdmin(str(tmp_path))
    admin.create_stream("logs", 4)
    tp = DirStreamTransport(str(tmp_path))
    page = [(f"payload-{i}".encode(), f"key-{i}") for i in range(200)]
    assert tp.send("logs", page) == []
    client = DirStreamClient(str(tmp_path))
    got = _all_records(client, "logs")
    assert len(got) == 200
    ranges = {s.shard_id: (s.hash_start, s.hash_end)
              for s in admin.describe_stream("logs").shards}
    for sid, key, _data in got:
        start, end = ranges[sid]
        assert start <= hash_key_for(key) <= end, (sid, key)


def test_split_redirects_new_traffic_and_keeps_parents_readable(
        tmp_path):
    admin = DirStreamAdmin(str(tmp_path))
    admin.create_stream("logs", 2)
    tp = DirStreamTransport(str(tmp_path))
    before = [(f"pre-{i}".encode(), f"key-{i}") for i in range(100)]
    tp.send("logs", before)
    # split the first shard at its midpoint
    s0 = admin.describe_stream("logs").shards[0]
    mid = (s0.hash_start + s0.hash_end) // 2 + 1
    left, right = admin.split_shard("logs", s0.shard_id, mid)
    d = admin.describe_stream("logs")
    by_id = {s.shard_id: s for s in d.shards}
    assert not by_id[s0.shard_id].open
    assert by_id[left].parents == (s0.shard_id,)
    assert (by_id[left].hash_start, by_id[right].hash_end) == \
        (s0.hash_start, s0.hash_end)
    assert by_id[left].hash_end + 1 == by_id[right].hash_start == mid
    after = [(f"post-{i}".encode(), f"key-{i}") for i in range(100)]
    tp.send("logs", after)
    client = DirStreamClient(str(tmp_path))
    got = _all_records(client, "logs")
    # nothing lost across the reshard, old records not re-routed
    assert sorted(d for _, _, d in got) == sorted(
        d for d, _ in before + after)
    landed = {sid for sid, _, data in got if data.startswith(b"post")
              and sid in (left, right, s0.shard_id)}
    assert s0.shard_id not in landed, "closed parent took new traffic"
    pre_parent = [data for sid, _, data in got
                  if sid == s0.shard_id]
    assert pre_parent and all(d.startswith(b"pre") for d in pre_parent)


def test_merge_requires_adjacency_and_takes_new_traffic(tmp_path):
    admin = DirStreamAdmin(str(tmp_path))
    admin.create_stream("logs", 3)
    shards = admin.describe_stream("logs").shards
    with pytest.raises(ValueError):
        admin.merge_shards("logs", shards[0].shard_id,
                           shards[2].shard_id)   # not adjacent
    child = admin.merge_shards("logs", shards[0].shard_id,
                               shards[1].shard_id)
    d = admin.describe_stream("logs")
    by_id = {s.shard_id: s for s in d.shards}
    assert by_id[child].hash_start == shards[0].hash_start
    assert by_id[child].hash_end == shards[1].hash_end
    assert set(by_id[child].parents) == {shards[0].shard_id,
                                         shards[1].shard_id}
    tp = DirStreamTransport(str(tmp_path))
    page = [(f"m-{i}".encode(), f"key-{i}") for i in range(120)]
    tp.send("logs", page)
    client = DirStreamClient(str(tmp_path))
    got = _all_records(client, "logs")
    assert len(got) == 120
    # every record in the merged range landed in the child
    for sid, key, _data in got:
        assert sid in (child, shards[2].shard_id)


def test_legacy_streams_keep_modulo_routing(tmp_path):
    """Streams without admin metadata are untouched: the n_shards
    modulo contract the existing consumer tests pin."""
    tp = DirStreamTransport(str(tmp_path), n_shards=2)
    tp.send("plain", [(b"x", "a"), (b"y", "b"), (b"z", "c")])
    client = DirStreamClient(str(tmp_path))
    sids = client.shard_ids("plain")
    assert sids and all(s in ("shard-0000", "shard-0001")
                        for s in sids)
    assert len(_all_records(client, "plain")) == 3


def test_sigv4_admin_against_local_fake_delegating_to_dir_admin(
        tmp_path):
    """The no-boto3 signed admin wire path, offline: every
    kinesis.go:252-372 action POSTs x-amz-json-1.1 to a local
    http.server that independently RE-SIGNS the request (403 on a
    mismatch) and DELEGATES to DirStreamAdmin — so the wire client is
    held to the same resharding semantics the in-process fake pins:
    create -> CREATING window -> ACTIVE, split children visible via
    DescribeStream with real hash ranges, merge, paged ListStreams,
    delete."""
    import contextlib
    import http.server
    import json as _json
    import threading

    from cga_logs_to_kinesis_spark.functions.credentials import (
        Credentials, Provider,
    )
    from cga_logs_to_kinesis_spark.functions.sigv4 import sign_request
    from cga_logs_to_kinesis_spark.sources.admin import (
        sigv4_stream_admin,
    )

    creds = Credentials("AKTEST", "SKTEST", None)

    class StaticProv(Provider):
        def get(self):
            return creds

    backend = DirStreamAdmin(str(tmp_path))

    class AdminFake(http.server.BaseHTTPRequestHandler):
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
            req = _json.loads(body)
            out: dict = {}
            if target == "CreateStream":
                backend.create_stream(req["StreamName"],
                                      req["ShardCount"],
                                      creating_describes=2)
            elif target == "DeleteStream":
                backend.delete_stream(req["StreamName"])
            elif target == "ListStreams":
                r = backend.list_streams(
                    req.get("Limit"),
                    req.get("ExclusiveStartStreamName"))
                out = {"StreamNames": list(r.stream_names),
                       "HasMoreStreams": r.has_more_streams}
            elif target == "DescribeStream":
                d = backend.describe_stream(req["StreamName"])
                out = {"StreamDescription": {
                    "StreamStatus": d.stream_status,
                    "Shards": [
                        {"ShardId": s.shard_id,
                         "HashKeyRange": {
                             "StartingHashKey": str(s.hash_start),
                             "EndingHashKey": str(s.hash_end)},
                         "SequenceNumberRange":
                             {} if s.open
                             else {"EndingSequenceNumber": "1"},
                         **({"ParentShardId": s.parents[0]}
                            if s.parents else {}),
                         **({"AdjacentParentShardId": s.parents[1]}
                            if len(s.parents) > 1 else {})}
                        for s in d.shards]}}
            elif target == "MergeShards":
                backend.merge_shards(req["StreamName"],
                                     req["ShardToMerge"],
                                     req["AdjacentShardToMerge"])
            elif target == "SplitShard":
                backend.split_shard(req["StreamName"],
                                    req["ShardToSplit"],
                                    int(req["NewStartingHashKey"]))
            else:
                self.send_error(400, f"unknown target {target}")
                return
            resp = _json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

    @contextlib.contextmanager
    def serve():
        srv = http.server.HTTPServer(("127.0.0.1", 0), AdminFake)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            yield f"http://127.0.0.1:{srv.server_address[1]}"
        finally:
            srv.shutdown()
            t.join(timeout=5)

    with serve() as url:
        admin = sigv4_stream_admin("us-east-1", provider=StaticProv(),
                                   endpoint_url=url)
        admin.create_stream("wire-a", 2)
        assert wait_active(admin, "wire-a") == 3   # 2 CREATING + 1
        d = admin.describe_stream("wire-a")
        assert len(d.shards) == 2 and all(s.open for s in d.shards)
        # split the low shard at its midpoint: children visible with
        # real hash ranges, parent closed with parentage
        low = min(d.shards, key=lambda s: s.hash_start)
        mid = (low.hash_start + low.hash_end) // 2 + 1
        admin.split_shard("wire-a", low.shard_id, mid)
        d2 = admin.describe_stream("wire-a")
        open_now = [s for s in d2.shards if s.open]
        closed = [s for s in d2.shards if not s.open]
        assert len(open_now) == 3 and len(closed) == 1
        assert closed[0].shard_id == low.shard_id
        kids = [s for s in open_now if low.shard_id in s.parents]
        assert sorted((s.hash_start, s.hash_end) for s in kids) == \
            [(low.hash_start, mid - 1), (mid, low.hash_end)]
        # merge the two children back; paged ListStreams; delete
        kids.sort(key=lambda s: s.hash_start)
        admin.merge_shards("wire-a", kids[0].shard_id,
                           kids[1].shard_id)
        d3 = admin.describe_stream("wire-a")
        assert sum(1 for s in d3.shards if s.open) == 2
        admin.create_stream("wire-b", 1)
        page1 = admin.list_streams(limit=1)
        assert page1.stream_names == ("wire-a",) \
            and page1.has_more_streams
        page2 = admin.list_streams(limit=1, exclusive_start="wire-a")
        assert page2.stream_names == ("wire-b",) \
            and not page2.has_more_streams
        admin.delete_stream("wire-b")
        assert "wire-b" not in admin.list_streams().stream_names
