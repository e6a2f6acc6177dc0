"""Append-tail bridge: follow open files, spool appends for Spark.

The reference delegates file-following to ``tail --follow=name
--retry`` (``main.go:214-250`` — follow by *name* so rotation swaps in
the new file, retry so a not-yet-existing path is watched anyway) and
forwards each complete line.  Spark's file stream source ingests new
*files*, not appends, so a daemon pointed at an actively-appended log
would see nothing until rotation (SURVEY §7.4.1).

This module is option (b) from that survey section: a small
driver-side tailer thread that converts *appends* into *spool files*.
Each poll, every watched file's newly-appended complete lines are
written as one atomic spool file (tmp + rename, so the Spark file
source never observes a partial file); the unmodified pipeline then
streams the spool directory.  The Spark side stays distributed and
checkpointed — the tailer is deliberately tiny driver-side glue, the
same division of labor as the reference shelling out to ``tail``.

Follow-by-name semantics reproduced:

* **rotation** — st_ino/st_dev change under the same name → reopen the
  new file from offset 0 (the final unterminated line of the old file
  is shipped at rotation, matching tail's EOF flush, main.go:238-244);
* **truncation** — size < offset → restart from 0 (``tail`` prints
  "file truncated" and does the same);
* **retry** — a watched path that does not exist yet (or vanishes) is
  polled until it appears, never an error (``--retry``, main.go:215);
* **line unit** — only complete ``\n``-terminated lines ship; a
  partial tail line stays buffered in the source file until finished
  (bufio.ReadBytes('\n') loop, main.go:230-248).

Offsets are persisted to ``<spool>/.tail_state.json`` after each
poll, so a daemon restart re-ships nothing (stronger than the
reference, whose restarted ``tail`` re-emits nothing but also loses
anything appended while down unless rotation is pending).
"""

from __future__ import annotations

import glob as globmod
import json
import os
import threading
import time
import uuid
from dataclasses import dataclass, field


@dataclass
class _FileState:
    ino: int = -1
    dev: int = -1
    offset: int = 0


@dataclass
class TailFollower:
    """Follow appends to ``watch_dir/glob``; stage them into spool files.

    ``poll_interval_s`` bounds append-to-visibility latency at
    poll + trigger; the reference's equivalent knob is tail's inotify
    (effectively 0) + the 5 s flush interval.
    """

    watch_dir: str
    spool_dir: str
    glob: str = "*.log"
    poll_interval_s: float = 0.2
    max_chunk_bytes: int = 64 * 1024 * 1024   # bound one spool file
    _states: dict[str, _FileState] = field(default_factory=dict)
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None

    # -- state persistence -------------------------------------------------

    @property
    def _state_path(self) -> str:
        return os.path.join(self.spool_dir, ".tail_state.json")

    def _load_state(self) -> None:
        try:
            with open(self._state_path) as f:
                raw = json.load(f)
            self._states = {p: _FileState(**s) for p, s in raw.items()}
        except (OSError, ValueError):
            self._states = {}

    def _save_state(self) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({p: vars(s) for p, s in self._states.items()}, f)
        os.replace(tmp, self._state_path)

    # -- one poll ----------------------------------------------------------

    def poll_once(self) -> int:
        """Scan watched files once; spool new complete lines.

        Returns the number of spool files written.  Public so tests
        (and availableNow backfills) can drive the tailer
        deterministically without the thread.
        """
        spooled = 0
        pattern = os.path.join(self.watch_dir, "**", self.glob)
        seen: set[str] = set()
        for path in globmod.glob(pattern, recursive=True):
            if not os.path.isfile(path):      # S4: regular files only
                continue
            seen.add(path)
            spooled += self._poll_file(path)
        # A vanished file keeps its state (retry semantics: it may come
        # back under the same name via rotation); state for files gone
        # >1 poll is harmless — offset is keyed by (ino, dev) identity.
        if spooled:
            self._save_state()
        return spooled

    def _poll_file(self, path: str) -> int:
        st = self._states.setdefault(path, _FileState())
        try:
            stat = os.stat(path)
        except OSError:
            return 0                           # vanished mid-poll: retry
        rotated = (stat.st_ino, stat.st_dev) != (st.ino, st.dev)
        truncated = stat.st_size < st.offset
        if rotated or truncated:
            st.ino, st.dev, st.offset = stat.st_ino, stat.st_dev, 0
        if stat.st_size <= st.offset:
            return 0
        try:
            with open(path, "rb") as f:
                f.seek(st.offset)
                chunk = f.read(min(stat.st_size - st.offset,
                                   self.max_chunk_bytes))
        except OSError:
            return 0
        # Ship only complete lines; keep a trailing partial buffered in
        # the source file by not advancing the offset past it.
        cut = chunk.rfind(b"\n")
        if cut < 0:
            return 0
        body, st.offset = chunk[:cut + 1], st.offset + cut + 1
        self._write_spool(path, body)
        return 1

    def _write_spool(self, src_path: str, body: bytes) -> None:
        # One spool file per (file, poll) chunk.  Name = zero-padded
        # nanosecond timestamp (lexicographic order == chunk order, so
        # readers that sort by name replay appends in sequence) + a
        # uuid suffix so two tailer instances (or a restart racing an
        # old thread) never collide on a name the Spark source has
        # already committed to its file log.
        name = f"{time.time_ns():020d}-{uuid.uuid4().hex}.log"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, os.path.join(self.spool_dir, name))

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "TailFollower":
        os.makedirs(self.spool_dir, exist_ok=True)
        self._load_state()
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, name="tail-follower", daemon=True)
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop.is_set():
            self.poll_once()
            self._stop.wait(self.poll_interval_s)

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        self._save_state()
