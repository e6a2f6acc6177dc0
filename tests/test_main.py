"""Daemon entry point: env-var surface parity with the reference's
ctl.erb wiring, exercised end to end in drain mode."""

from __future__ import annotations

import json
import subprocess
import sys


def test_daemon_drain_mode(tmp_path):
    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "app.log").write_text("one\ntwo\n")
    (watch / "other.txt").write_text("skip\n")
    out = tmp_path / "delivered"

    import os
    env = dict(os.environ)
    env.update({
        "DIRS_TO_WATCH": f"{watch}/**/*.log",
        "INSTANCE": "daemon-test",
        "STREAM_NAME": "s1",
        "TRANSPORT": "file",
        "DELIVERY_DIR": str(out),
        "CHECKPOINT_DIR": str(tmp_path / "ckpt"),
        # subprocess workers must resolve the same interpreter that has
        # pandas/pyarrow (bare `python3` from PATH wouldn't)
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    })
    env.pop("FILES_TO_WATCH", None)

    proc = subprocess.run(
        [sys.executable, "-m", "cga_logs_to_kinesis_spark.main",
         "--drain"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "drained: 2 records sent, 0 dropped" in proc.stdout

    delivered = []
    for f in out.glob("*.jsonl"):
        delivered.extend(json.loads(line)
                         for line in f.read_text().splitlines())
    # BinaryType serializes as base64 on the JSON wire (and the
    # consumer's from_json BINARY schema decodes it back)
    import base64
    msgs = {base64.b64decode(d["log_message"]["message"]).decode()
            for d in delivered}
    assert msgs == {"one", "two"}
    assert all(d["origin"] == "daemon-test" for d in delivered)


def test_daemon_requires_watch_config(tmp_path):
    import os
    env = dict(os.environ)
    env.pop("FILES_TO_WATCH", None)
    env.pop("DIRS_TO_WATCH", None)
    proc = subprocess.run(
        [sys.executable, "-m", "cga_logs_to_kinesis_spark.main",
         "--drain"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=120)
    assert proc.returncode == 2
    assert "nothing to watch" in proc.stderr
