"""Daemon entry point: the reference's CLI/env surface, Spark-native.

The reference daemon is configured entirely through env vars wired in
by its BOSH ctl script (reference ``jobs/logs-to-kinesis/templates/
ctl.erb:17-27``, parsed at ``main.go:375-407``):

    FILES_TO_WATCH  ':'-separated file paths
    DIRS_TO_WATCH   ':'-separated 'root/**/glob' entries
    INSTANCE        origin label for every Envelope
    STREAM_NAME     delivery stream
    PORT            metrics port (here: metrics file path instead)

Run the Spark equivalent the same way:

    DIRS_TO_WATCH='/var/log/**/*.log' INSTANCE=web-0 \\
        python -m cga_logs_to_kinesis_spark.main

Differences from the reference, by design: checkpointed exactly-once
source tracking instead of a lossy in-memory buffer; file-unit ingest
instead of tail-follow (SURVEY §7.4.1); transport defaults to a local
file sink unless boto3 + AWS config are present.
"""

from __future__ import annotations

import os
import signal
import sys

from cga_logs_to_kinesis_spark.session import get_session
from cga_logs_to_kinesis_spark.streaming.config import watch_config_from_env
from cga_logs_to_kinesis_spark.streaming.metrics import (
    attach_metrics,
    serve_metrics,
)
from cga_logs_to_kinesis_spark.streaming.pipeline import (
    PipelineConfig,
    build_pipeline,
)
from cga_logs_to_kinesis_spark.streaming.sink import (
    ConsoleTransport,
    FileTransport,
    SinkConfig,
    boto3_transport,
)


def make_transport(env: dict[str, str]):
    kind = env.get("TRANSPORT", "file")
    if kind == "kinesis":
        return boto3_transport(env.get("AWS_REGION", "ap-southeast-2"))
    if kind == "console":
        return ConsoleTransport()
    return FileTransport(env.get("DELIVERY_DIR", "/tmp/delivered"))


def run(env: dict[str, str] | None = None,
        available_now: bool = False) -> int:
    env = dict(env if env is not None else os.environ)
    files, dirs = watch_config_from_env(env)
    if not files and not dirs:
        print("nothing to watch: set FILES_TO_WATCH and/or DIRS_TO_WATCH",
              file=sys.stderr)
        return 2

    spark = get_session("logs-to-kinesis-spark")
    metrics = attach_metrics(spark)
    transport = make_transport(env)
    sink_cfg = SinkConfig(stream_name=env.get("STREAM_NAME", "logs"))

    queries = []
    # one streaming query per watch root — the goroutine-per-watch
    # structure of the reference (main.go:259,285), as Spark queries
    targets = ([PipelineConfig(
        watch_dir=os.path.dirname(f) or ".",
        glob=os.path.basename(f),
        origin=env.get("INSTANCE", "spark-engine"),
        checkpoint_dir=env.get("CHECKPOINT_DIR",
                               "/tmp/l2k-ckpt") + f"/f{i}",
        available_now=available_now)
        for i, f in enumerate(files)]
        + [PipelineConfig(
            watch_dir=d.root, glob=d.glob,
            origin=env.get("INSTANCE", "spark-engine"),
            checkpoint_dir=env.get("CHECKPOINT_DIR",
                                   "/tmp/l2k-ckpt") + f"/d{i}",
            available_now=available_now)
           for i, d in enumerate(dirs)])
    stats_list = []
    for cfg in targets:
        query, stats = build_pipeline(spark, cfg, transport, sink_cfg)
        queries.append(query)
        stats_list.append(stats)

    if available_now:
        for q in queries:
            q.awaitTermination(600)
        total = sum(s.records_sent for s in stats_list)
        print(f"drained: {total} records sent, "
              f"{sum(s.records_dropped for s in stats_list)} dropped")
        spark.stop()
        return 0

    # daemon mode: serve /metrics on $PORT (reference main.go:410-413)
    # and block until SIGINT/SIGTERM (main.go:415-417)
    server = None
    if env.get("PORT"):
        server = serve_metrics(
            lambda: render_all_metrics(metrics, stats_list),
            int(env["PORT"]))

    def shutdown(_sig, _frm):
        for q in queries:
            q.stop()

    signal.signal(signal.SIGINT, shutdown)
    signal.signal(signal.SIGTERM, shutdown)
    for q in queries:
        q.awaitTermination()
    metrics_path = env.get("METRICS_PATH")
    if metrics_path:
        with open(metrics_path, "w") as f:
            f.write(render_all_metrics(metrics, stats_list))
    if server is not None:
        server.shutdown()
    spark.stop()
    return 0


def render_all_metrics(metrics, stats_list) -> str:
    """Engine (A3) + delivery (A2) counters in one exposition page —
    the reference's records_sent/records_dropped/request_errors family
    (main.go:28-47) alongside the streaming-progress metrics."""
    sent = sum(s.records_sent for s in stats_list)
    dropped = sum(s.records_dropped for s in stats_list)
    errors = sum(s.request_errors for s in stats_list)
    return metrics.render_prometheus() + (
        "# TYPE engine_records_sent_total counter\n"
        f"engine_records_sent_total {sent}\n"
        "# TYPE engine_records_dropped_total counter\n"
        f"engine_records_dropped_total {dropped}\n"
        "# TYPE engine_request_errors_total counter\n"
        f"engine_request_errors_total {errors}\n")


if __name__ == "__main__":
    raise SystemExit(run(
        available_now="--drain" in sys.argv))
