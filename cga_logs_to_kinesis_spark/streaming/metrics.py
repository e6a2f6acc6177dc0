"""Observability surface (A2/A3): cumulative engine metrics.

The reference exposes Prometheus counters/gauges keyed by instance on
an HTTP endpoint (reference main.go:28-47,410-413).  The Spark-native
equivalent is a StreamingQueryListener that folds every progress event
into cumulative counters, plus a text renderer in the Prometheus
exposition format.  No HTTP server is started here (engine core stays
transport-free); `render_prometheus` output can be served by any
framework — or scraped from a file sink.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class EngineMetrics:
    """Counter/gauge registry, labeled by query name (≈ `system`
    label in reference main.go:33)."""
    rows_in: dict[str, int] = field(default_factory=dict)
    batches: dict[str, int] = field(default_factory=dict)
    last_input_rate: dict[str, float] = field(default_factory=dict)
    last_batch_duration_ms: dict[str, int] = field(default_factory=dict)

    def render_prometheus(self) -> str:
        lines = [
            "# TYPE engine_rows_in_total counter",
            *[f'engine_rows_in_total{{query="{q}"}} {v}'
              for q, v in sorted(self.rows_in.items())],
            "# TYPE engine_batches_total counter",
            *[f'engine_batches_total{{query="{q}"}} {v}'
              for q, v in sorted(self.batches.items())],
            "# TYPE engine_input_rate gauge",
            *[f'engine_input_rate{{query="{q}"}} {v}'
              for q, v in sorted(self.last_input_rate.items())],
        ]
        return "\n".join(lines) + "\n"


class MetricsListener(StreamingQueryListener):
    def __init__(self, metrics: EngineMetrics):
        self.metrics = metrics

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        name = p.name or p.id
        m = self.metrics
        m.rows_in[name] = m.rows_in.get(name, 0) + int(p.numInputRows)
        m.batches[name] = m.batches.get(name, 0) + 1
        m.last_input_rate[name] = float(p.inputRowsPerSecond or 0.0)
        dur = p.durationMs or {}
        m.last_batch_duration_ms[name] = int(dur.get("triggerExecution", 0))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def attach_metrics(spark: SparkSession) -> EngineMetrics:
    """Register a listener; returns the live metrics registry."""
    metrics = EngineMetrics()
    spark.streams.addListener(MetricsListener(metrics))
    return metrics
