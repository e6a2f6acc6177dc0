"""Consumer-side decode (S7), protobuf codec gating, approx-aggregate
error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.registry import all_queries
from cga_logs_to_kinesis_spark.sources import load_events
from cga_logs_to_kinesis_spark.sources.pages import (
    decode_envelopes,
    read_delivered_jsonl,
)
from cga_logs_to_kinesis_spark.streaming.envelope import (
    envelope_projection,
    envelope_to_json,
)
from cga_logs_to_kinesis_spark.streaming.protobuf_codec import (
    envelope_to_protobuf,
    wire_encode,
)
from tests.conftest import SF_SMOKE


def test_wire_roundtrip_through_files(spark, tmp_path):
    """Produce → deliver to files → consume → decode: the full loop
    the reference ships through Kinesis (S1→T1→T3→K1→S7)."""
    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "x.log").write_text("r1\nr2\nr3\n")
    lines = spark.read.format("text").load(str(watch))
    wire = envelope_to_json(envelope_projection(lines, "origin-9"))

    out = tmp_path / "delivered"
    wire.select("data").write.format("text").save(str(out))

    decoded = decode_envelopes(
        read_delivered_jsonl(spark, str(out)))
    rows = decoded.collect()
    assert len(rows) == 3
    assert all(not r.is_corrupt for r in rows)
    assert {bytes(r.log_message.message).decode() for r in rows} == {
        "r1", "r2", "r3"}
    assert all(r.log_message.source_type == "bosh" for r in rows)


def test_decode_tolerates_corrupt_records(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"origin":"o","event_type":"LogMessage","timestamp":1}\n'
        'not json at all\n')
    decoded = decode_envelopes(read_delivered_jsonl(spark, str(src)))
    rows = {r.origin: r for r in decoded.collect()}
    assert len(rows) == 2
    assert rows["o"].is_corrupt is False
    assert rows[None].is_corrupt is True    # survived, flagged


def test_protobuf_codec_gated(spark, tmp_path):
    """No spark-protobuf connector jar in this environment → explicit
    NotImplementedError (the packaged events.desc descriptor exists,
    but the probe in protobuf_codec detects the missing jar) and a
    JSON fallback that works."""
    (tmp_path / "y.log").write_text("hello\n")
    lines = spark.read.format("text").load(str(tmp_path))
    env = envelope_projection(lines, "o")
    with pytest.raises(NotImplementedError):
        envelope_to_protobuf(F.struct("origin"), descriptor_path=None)
    wire = wire_encode(env, descriptor_path=None)   # JSON fallback
    assert wire.columns == ["data", "partition_key"]
    assert wire.count() == 1


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, "/root/testdata/sf0.01"])
def test_approx_distinct_error_bound(spark, sf_dir):
    """The operator's error CONTRACT: every group's HLL++ estimate
    must land within APPROX_BOUND_SIGMA x APPROX_RSD of the exact
    countDistinct (deterministic given the data — no flake window),
    checked at BOTH the local and the driver-gate scale.  This is
    what makes the rows-only driver row trustworthy: 'approx' has a
    verified bound, not just a stable row count."""
    from cga_logs_to_kinesis_spark.operators.relational3 import (
        APPROX_BOUND_SIGMA,
        APPROX_RSD,
    )
    q = all_queries()["approx_distinct_users"]
    approx = {r.event_type: r.approx_users
              for r in q.fn(spark, sf_dir).collect()}
    exact = {r.event_type: r.n for r in
             load_events(spark, sf_dir)
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(approx) == set(exact)
    bound = APPROX_BOUND_SIGMA * APPROX_RSD
    for et, n in exact.items():
        rel_err = abs(approx[et] - n) / n
        assert rel_err <= bound, (
            f"{et}: approx {approx[et]} vs exact {n} "
            f"(rel err {rel_err:.4f} > {bound})")


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, "/root/testdata/sf0.01"])
def test_approx_quantiles_rank_error_bound(spark, sf_dir):
    """The quantile sketch's error CONTRACT: approx_percentile(acc)
    guarantees each returned value sits within n/acc RANK positions of
    the target rank.  Verified per (group, quantile) against the
    exact sorted ranks — deterministic given the data, checked at
    both the local and driver-gate scale (same philosophy as the HLL
    bound above)."""
    from cga_logs_to_kinesis_spark.operators.relational3 import (
        QUANTILE_ACCURACY,
        QUANTILE_PROBS,
    )
    from cga_logs_to_kinesis_spark.sources import load_table

    q = all_queries()["approx_quantiles"]
    rows = {r.o_orderpriority: r for r in q.fn(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    by_prio = {
        r.o_orderpriority: sorted(v for v in r.vals if v is not None)
        for r in orders.groupBy("o_orderpriority")
        .agg(F.collect_list("o_totalprice").alias("vals")).collect()}
    assert set(rows) == set(by_prio)
    for prio, vals in by_prio.items():
        n = len(vals)
        slack = max(1.0, n / QUANTILE_ACCURACY)
        for p in QUANTILE_PROBS:
            got = getattr(rows[prio], f"p{int(p * 100)}")
            # exact rank window of the returned value (bisect bounds)
            import bisect
            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got) - 1
            target = p * (n - 1)
            dist = 0.0 if lo <= target <= hi else \
                min(abs(lo - target), abs(hi - target))
            assert dist <= slack, (
                f"{prio} p{int(p*100)}: value {got} rank window "
                f"[{lo},{hi}] vs target {target:.1f} (err {dist} > "
                f"{slack})")
