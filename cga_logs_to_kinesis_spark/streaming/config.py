"""Env-var config surface (S6): the reference's watch-list parsing.

Reference semantics (``src/logs-to-kinesis/main.go:395-407``):
``FILES_TO_WATCH`` is a ``:``-separated list of file paths;
``DIRS_TO_WATCH`` entries are ``:``-separated and each splits on
``/**/`` into (walk root, basename glob).  Empty entries are skipped
(the daemon calls WatchFile/WatchDir only for non-empty splits).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class DirWatch:
    root: str
    glob: str


def parse_files_to_watch(value: str) -> list[str]:
    """':'-split file list (reference main.go:395-400)."""
    return [p for p in value.split(":") if p]


def parse_dirs_to_watch(value: str) -> list[DirWatch]:
    """':'-split entries, each 'root/**/glob' (reference main.go:401-407).

    An entry without '/**/' watches the directory itself with a
    match-all glob.
    """
    out = []
    for entry in value.split(":"):
        if not entry:
            continue
        if "/**/" in entry:
            root, glob = entry.split("/**/", 1)
            out.append(DirWatch(root=root, glob=glob))
        else:
            out.append(DirWatch(root=entry, glob="*"))
    return out


def watch_config_from_env(env: dict[str, str] | None = None,
                          ) -> tuple[list[str], list[DirWatch]]:
    e = env if env is not None else os.environ
    return (parse_files_to_watch(e.get("FILES_TO_WATCH", "")),
            parse_dirs_to_watch(e.get("DIRS_TO_WATCH", "")))
