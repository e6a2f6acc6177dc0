"""Kinesis stream-admin surface (S8): CreateStream / DeleteStream /
MergeShards / SplitShard / ListStreams / DescribeStream
(reference kinesis.go:252-372), re-expressed over the repo's
file-backed stream fake plus a boto3-gated real client.

The fake is not a stub registry: shards carry REAL 128-bit hash-key
ranges and ``DirStreamTransport`` routes ``md5(partition_key)`` into
the open shard owning that point — so ``split_shard`` and
``merge_shards`` genuinely change where subsequent records land,
closed parents stay readable (Kinesis retention semantics), and the
consumer (``DirStreamClient.shard_ids``) discovers children the same
way a real resharding consumer does.  That is the engine-relevant
content of S8: resharding is the streaming analogue of changing
``spark.sql.shuffle.partitions``, and the tests pin that no record is
lost or re-routed retroactively across a reshard.

Stream status models the provisioning lifecycle deterministically:
``create_stream(..., creating_describes=n)`` reports CREATING for the
first ``n`` DescribeStream calls, then ACTIVE — enough to exercise
``wait_active`` without wall-clock sleeps.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass

MAX_HASH_KEY = (1 << 128) - 1
_META = ".stream_meta.json"


def hash_key_for(partition_key: str) -> int:
    """Kinesis's routing point: MD5(partition key) as a 128-bit int."""
    return int.from_bytes(
        hashlib.md5(partition_key.encode()).digest(), "big")


@dataclass(frozen=True)
class ShardInfo:
    shard_id: str
    hash_start: int
    hash_end: int
    open: bool
    parents: tuple[str, ...] = ()


@dataclass(frozen=True)
class DescribeStreamResp:
    stream_name: str
    stream_status: str              # CREATING | ACTIVE | (DELETING)
    shards: tuple[ShardInfo, ...]


@dataclass(frozen=True)
class ListStreamsResp:
    stream_names: tuple[str, ...]
    has_more_streams: bool


class StreamAdmin:
    """The admin protocol — one method per reference API call
    (kinesis.go:252-372)."""

    def create_stream(self, name: str, shard_count: int) -> None:
        raise NotImplementedError

    def delete_stream(self, name: str) -> None:
        raise NotImplementedError

    def list_streams(self, limit: int | None = None,
                     exclusive_start: str | None = None
                     ) -> ListStreamsResp:
        raise NotImplementedError

    def describe_stream(self, name: str) -> DescribeStreamResp:
        raise NotImplementedError

    def merge_shards(self, name: str, shard_id: str,
                     adjacent_shard_id: str) -> str:
        raise NotImplementedError

    def split_shard(self, name: str, shard_id: str,
                    new_starting_hash: int) -> tuple[str, str]:
        raise NotImplementedError


def wait_active(admin: StreamAdmin, name: str,
                max_describes: int = 100) -> int:
    """Poll DescribeStream until ACTIVE (the create-then-wait idiom
    every producer runs before its first PutRecords).  Returns the
    number of describes it took; raises if the stream never
    activates within the budget."""
    for i in range(1, max_describes + 1):
        if admin.describe_stream(name).stream_status == "ACTIVE":
            return i
    raise TimeoutError(
        f"stream {name} not ACTIVE after {max_describes} describes")


class DirStreamAdmin(StreamAdmin):
    """File-backed admin over the ``DirStreamTransport`` /
    ``DirStreamClient`` layout: shard metadata (ranges, open flags,
    parentage) lives in ``<stream>/.stream_meta.json``; shard record
    files are untouched by admin operations, so closed parents remain
    readable exactly like shards inside the retention window."""

    def __init__(self, stream_dir: str):
        self.stream_dir = stream_dir

    # -- metadata helpers -------------------------------------------------
    def _meta_path(self, name: str) -> str:
        return os.path.join(self.stream_dir, name, _META)

    def _load(self, name: str) -> dict:
        try:
            with open(self._meta_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise KeyError(f"no such stream: {name}") from None

    def _store(self, name: str, meta: dict) -> None:
        path = self._meta_path(name)
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path)

    # -- API --------------------------------------------------------------
    def create_stream(self, name: str, shard_count: int,
                      creating_describes: int = 0) -> None:
        root = os.path.join(self.stream_dir, name)
        if os.path.exists(self._meta_path(name)):
            raise FileExistsError(f"stream exists: {name}")
        os.makedirs(root, exist_ok=True)
        span = (MAX_HASH_KEY + 1) // shard_count
        shards = []
        for i in range(shard_count):
            start = i * span
            end = (MAX_HASH_KEY if i == shard_count - 1
                   else (i + 1) * span - 1)
            sid = f"shard-{i:04d}"
            os.makedirs(os.path.join(root, sid), exist_ok=True)
            shards.append({"id": sid, "start": str(start),
                           "end": str(end), "open": True,
                           "parents": []})
        self._store(name, {"creating_left": creating_describes,
                           "next_shard": shard_count,
                           "shards": shards})

    def delete_stream(self, name: str) -> None:
        self._load(name)                      # KeyError if missing
        shutil.rmtree(os.path.join(self.stream_dir, name))

    def list_streams(self, limit: int | None = None,
                     exclusive_start: str | None = None
                     ) -> ListStreamsResp:
        names = sorted(
            d for d in (os.listdir(self.stream_dir)
                        if os.path.isdir(self.stream_dir) else [])
            if os.path.exists(self._meta_path(d)))
        if exclusive_start is not None:
            names = [n for n in names if n > exclusive_start]
        has_more = False
        if limit is not None and len(names) > limit:
            names, has_more = names[:limit], True
        return ListStreamsResp(tuple(names), has_more)

    def describe_stream(self, name: str) -> DescribeStreamResp:
        meta = self._load(name)
        if meta.get("creating_left", 0) > 0:
            meta["creating_left"] -= 1
            self._store(name, meta)
            status = "CREATING"
        else:
            status = "ACTIVE"
        shards = tuple(
            ShardInfo(s["id"], int(s["start"]), int(s["end"]),
                      s["open"], tuple(s.get("parents", ())))
            for s in meta["shards"])
        return DescribeStreamResp(name, status, shards)

    def _new_shard(self, name: str, meta: dict, start: int, end: int,
                   parents: list[str]) -> dict:
        sid = f"shard-{meta['next_shard']:04d}"
        meta["next_shard"] += 1
        os.makedirs(os.path.join(self.stream_dir, name, sid),
                    exist_ok=True)
        child = {"id": sid, "start": str(start), "end": str(end),
                 "open": True, "parents": parents}
        meta["shards"].append(child)
        return child

    def split_shard(self, name: str, shard_id: str,
                    new_starting_hash: int) -> tuple[str, str]:
        meta = self._load(name)
        s = next((x for x in meta["shards"]
                  if x["id"] == shard_id and x["open"]), None)
        if s is None:
            raise KeyError(f"no open shard {shard_id}")
        start, end = int(s["start"]), int(s["end"])
        if not start < new_starting_hash <= end:
            raise ValueError("NewStartingHashKey outside shard range")
        s["open"] = False
        left = self._new_shard(name, meta, start,
                               new_starting_hash - 1, [shard_id])
        right = self._new_shard(name, meta, new_starting_hash, end,
                                [shard_id])
        self._store(name, meta)
        return left["id"], right["id"]

    def merge_shards(self, name: str, shard_id: str,
                     adjacent_shard_id: str) -> str:
        meta = self._load(name)
        a = next((x for x in meta["shards"]
                  if x["id"] == shard_id and x["open"]), None)
        b = next((x for x in meta["shards"]
                  if x["id"] == adjacent_shard_id and x["open"]), None)
        if a is None or b is None:
            raise KeyError("both shards must exist and be open")
        lo, hi = sorted([a, b], key=lambda x: int(x["start"]))
        if int(lo["end"]) + 1 != int(hi["start"]):
            raise ValueError("shards are not adjacent")
        a["open"] = b["open"] = False
        child = self._new_shard(name, meta, int(lo["start"]),
                                int(hi["end"]),
                                [a["id"], b["id"]])
        self._store(name, meta)
        return child["id"]


def load_open_ranges(stream_dir: str, stream: str
                     ) -> list[tuple[int, int, str]] | None:
    """The open shards' (start, end, shard_id) ranges for an
    admin-managed stream; None when the stream has no admin metadata
    (legacy modulo streams)."""
    path = os.path.join(stream_dir, stream, _META)
    try:
        with open(path) as f:
            meta = json.load(f)
    except FileNotFoundError:
        return None
    return [(int(s["start"]), int(s["end"]), s["id"])
            for s in meta["shards"] if s["open"]]


def route_key(ranges: list[tuple[int, int, str]],
              partition_key: str) -> str:
    """Range routing: the open shard whose 128-bit hash range
    contains md5(partition_key)."""
    h = hash_key_for(partition_key)
    for start, end, sid in ranges:
        if start <= h <= end:
            return sid
    raise RuntimeError(
        f"no open shard covers hash {h} — corrupt reshard metadata")


def sigv4_stream_admin(region: str, provider=None,
                       endpoint_url: str | None = None,
                       clock=None) -> StreamAdmin:
    """The no-boto3 admin client: every kinesis.go:252-372 action as
    a signed x-amz-json-1.1 call over stdlib urllib — the admin-side
    sibling of ``sigv4_transport`` / ``sigv4_consumer_client``.
    ``endpoint_url`` points it at the local re-signing http fake in
    tests; prefer ``boto3_stream_admin`` in production."""
    import time as _time
    import urllib.request

    from cga_logs_to_kinesis_spark.functions.credentials import (
        default_chain,
    )

    prov = provider or default_chain()
    now = clock or _time.time

    def call(target: str, body_obj: dict) -> dict:
        from cga_logs_to_kinesis_spark.streaming.sink import (
            build_api_request,
        )

        creds = prov.get()
        req = build_api_request(
            target=f"Kinesis_20131202.{target}", body_obj=body_obj,
            region=region, access_key=creds.access_key,
            secret_key=creds.secret_key,
            amz_date=_time.strftime("%Y%m%dT%H%M%SZ",
                                    _time.gmtime(now())),
            session_token=creds.session_token,
            endpoint_url=endpoint_url)
        r = urllib.request.Request(
            req["url"], data=req["body"], headers=req["headers"],
            method=req["method"])
        with urllib.request.urlopen(r, timeout=30) as resp:
            body = resp.read()
            return json.loads(body) if body else {}

    class SigV4StreamAdmin(StreamAdmin):
        def create_stream(self, name, shard_count):
            call("CreateStream", {"StreamName": name,
                                  "ShardCount": shard_count})

        def delete_stream(self, name):
            call("DeleteStream", {"StreamName": name})

        def list_streams(self, limit=None, exclusive_start=None):
            body = {}
            if limit is not None:
                body["Limit"] = limit
            if exclusive_start is not None:
                body["ExclusiveStartStreamName"] = exclusive_start
            r = call("ListStreams", body)
            return ListStreamsResp(tuple(r["StreamNames"]),
                                   r["HasMoreStreams"])

        def describe_stream(self, name):
            d = call("DescribeStream", {"StreamName": name})
            desc = d["StreamDescription"]
            shards = tuple(
                ShardInfo(s["ShardId"],
                          int(s["HashKeyRange"]["StartingHashKey"]),
                          int(s["HashKeyRange"]["EndingHashKey"]),
                          "EndingSequenceNumber"
                          not in s["SequenceNumberRange"],
                          tuple(p for p in [s.get("ParentShardId"),
                                            s.get(
                                                "AdjacentParentShardId")]
                                if p))
                for s in desc["Shards"])
            return DescribeStreamResp(name, desc["StreamStatus"],
                                      shards)

        def merge_shards(self, name, shard_id, adjacent_shard_id):
            call("MergeShards", {"StreamName": name,
                                 "ShardToMerge": shard_id,
                                 "AdjacentShardToMerge":
                                     adjacent_shard_id})
            return ""

        def split_shard(self, name, shard_id, new_starting_hash):
            call("SplitShard", {"StreamName": name,
                                "ShardToSplit": shard_id,
                                "NewStartingHashKey":
                                    str(new_starting_hash)})
            return ("", "")

    return SigV4StreamAdmin()


def boto3_stream_admin(region: str) -> StreamAdmin:
    """Real Kinesis admin client, import-gated like the transports."""
    try:
        import boto3  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "boto3 not available; use DirStreamAdmin") from e

    class Boto3StreamAdmin(StreamAdmin):  # pragma: no cover
        def __init__(self, region: str):
            import boto3
            self.c = boto3.client("kinesis", region_name=region)

        def create_stream(self, name, shard_count):
            self.c.create_stream(StreamName=name,
                                 ShardCount=shard_count)

        def delete_stream(self, name):
            self.c.delete_stream(StreamName=name)

        def list_streams(self, limit=None, exclusive_start=None):
            kw = {}
            if limit is not None:
                kw["Limit"] = limit
            if exclusive_start is not None:
                kw["ExclusiveStartStreamName"] = exclusive_start
            r = self.c.list_streams(**kw)
            return ListStreamsResp(tuple(r["StreamNames"]),
                                   r["HasMoreStreams"])

        def describe_stream(self, name):
            d = self.c.describe_stream(StreamName=name)
            desc = d["StreamDescription"]
            shards = tuple(
                ShardInfo(s["ShardId"],
                          int(s["HashKeyRange"]["StartingHashKey"]),
                          int(s["HashKeyRange"]["EndingHashKey"]),
                          "EndingSequenceNumber"
                          not in s["SequenceNumberRange"],
                          tuple(p for p in [s.get("ParentShardId"),
                                            s.get("AdjacentParentShardId")]
                                if p))
                for s in desc["Shards"])
            return DescribeStreamResp(name, desc["StreamStatus"], shards)

        def merge_shards(self, name, shard_id, adjacent_shard_id):
            self.c.merge_shards(StreamName=name, ShardToMerge=shard_id,
                                AdjacentShardToMerge=adjacent_shard_id)
            return ""

        def split_shard(self, name, shard_id, new_starting_hash):
            self.c.split_shard(StreamName=name, ShardToSplit=shard_id,
                               NewStartingHashKey=str(new_starting_hash))
            return ("", "")

    return Boto3StreamAdmin(region)
