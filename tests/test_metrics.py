"""StreamingQueryListener metrics (A2/A3 surface)."""

from __future__ import annotations

import time

from cga_logs_to_kinesis_spark.streaming.metrics import attach_metrics


def test_metrics_listener_counts_rows(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, "x") for i in range(50)], "id long, k string"
    ).coalesce(1).write.parquet(str(src))

    metrics = attach_metrics(spark)
    stream = spark.readStream.schema("id long, k string").parquet(str(src))
    q = (stream.writeStream.format("noop").queryName("metrics_probe")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # listener callbacks are asynchronous; poll briefly
    for _ in range(40):
        if metrics.rows_in.get("metrics_probe", 0) >= 50:
            break
        time.sleep(0.25)
    assert metrics.rows_in.get("metrics_probe", 0) == 50
    assert metrics.batches.get("metrics_probe", 0) >= 1

    text = metrics.render_prometheus()
    assert 'engine_rows_in_total{query="metrics_probe"} 50' in text
    assert "# TYPE engine_rows_in_total counter" in text
