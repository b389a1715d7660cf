"""Per-query trace capture — the Spark-native analogue of the
reference's Perfetto tracing.

The reference instruments its driver and workers with chrome://tracing
spans (reference src/mini_spark/utils.py:47-169 `TraceEvent`/`traced`,
zig-src/src/utils.zig:14-62) and stitches worker traces into one
timeline. Spark already emits the equivalent — every job/stage/task
boundary with task metrics — through its event log; what's missing is
(a) attributing those events to named queries and (b) condensing the
raw log into a small reviewable artifact. This module does both:

  * ``trace_confs(dir)`` — session confs that turn on the event log.
  * ``tagged(sc, name)`` — context manager stamping a query name into
    the job group, so every job the query runs carries its name.
  * ``summarize_event_log(path)`` — fold the JSONL event log into
    per-query wall time, stage count, task count, and shuffle bytes.
  * ``write_trace(...)`` — emit the summary JSON artifact (bench.py
    writes one per run; BASELINE.md documents it).

The condensed artifact is also chrome://tracing-compatible on demand:
``to_chrome_trace`` renders the same spans Perfetto shows for the
reference ("X" complete events, one track per query).
"""

from __future__ import annotations

import contextlib
import json
import os
from typing import Any, Iterator


def trace_confs(trace_dir: str) -> dict[str, str]:
    """SparkSession confs that write an event log under ``trace_dir``."""
    os.makedirs(trace_dir, exist_ok=True)
    return {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{os.path.abspath(trace_dir)}",
        "spark.eventLog.compress": "false",
    }


@contextlib.contextmanager
def tagged(sc: Any, name: str) -> Iterator[None]:
    """Tag every job launched in the block with ``name`` (job group)."""
    sc.setJobGroup(name, name, interruptOnCancel=False)
    try:
        yield
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)


def _event_log_files(trace_dir: str, app_id: str) -> list[str]:
    """Event log paths for an app. Spark 4 writes a rolling v2 layout
    (``eventlog_v2_<appId>/events_N_<appId>``); classic single-file
    logs are ``<appId>[.inprogress]``."""
    v2 = os.path.join(trace_dir, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2):
        events = sorted(
            n for n in os.listdir(v2) if n.startswith("events_") and ".crc" not in n
        )
        return [os.path.join(v2, n) for n in events]
    for name in os.listdir(trace_dir):
        if name.startswith(app_id) and ".crc" not in name:
            return [os.path.join(trace_dir, name)]
    return []


def summarize_event_log(path: str | list[str]) -> dict[str, dict]:
    """Fold a Spark event log (one file or a rolling-v2 file list) into
    per-query-group summaries.

    Streaming one pass over the JSONL file(s) (event logs reach GBs on
    real clusters; nothing here materializes more than per-stage
    scalars): job start/end give wall spans, task ends accumulate task
    counts, runtimes, and shuffle bytes per stage; stages map back to
    the query via their job's group name.
    """
    paths = [path] if isinstance(path, str) else list(path)
    jobs: dict[int, dict] = {}
    stage_to_query: dict[int, str] = {}
    queries: dict[str, dict] = {}

    def q(name: str) -> dict:
        return queries.setdefault(
            name,
            {
                "jobs": 0,
                "stages": 0,
                "tasks": 0,
                "wall_ms": 0,
                "task_time_ms": 0,
                "shuffle_read_bytes": 0,
                "shuffle_write_bytes": 0,
                "input_bytes": 0,
                "spans": [],
            },
        )

    def _lines():
        for p in paths:
            with open(p) as f:
                yield from f

    for line in _lines():
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            group = (ev.get("Properties") or {}).get(
                "spark.jobGroup.id", "(untagged)"
            )
            jid = ev["Job ID"]
            jobs[jid] = {"group": group, "start": ev.get("Submission Time", 0)}
            for sid in ev.get("Stage IDs", []):
                stage_to_query[sid] = group
            rec = q(group)
            rec["jobs"] += 1
        elif kind == "SparkListenerJobEnd":
            job = jobs.get(ev["Job ID"])
            if job is None:
                continue
            end = ev.get("Completion Time", job["start"])
            rec = q(job["group"])
            rec["wall_ms"] += max(0, end - job["start"])
            rec["spans"].append(
                {"job": ev["Job ID"], "start_ms": job["start"], "end_ms": end}
            )
        elif kind == "SparkListenerStageCompleted":
            info = ev.get("Stage Info", {})
            group = stage_to_query.get(info.get("Stage ID"), "(untagged)")
            q(group)["stages"] += 1
        elif kind == "SparkListenerTaskEnd":
            group = stage_to_query.get(ev.get("Stage ID"), "(untagged)")
            rec = q(group)
            rec["tasks"] += 1
            metrics = ev.get("Task Metrics") or {}
            rec["task_time_ms"] += metrics.get("Executor Run Time", 0)
            sread = metrics.get("Shuffle Read Metrics") or {}
            rec["shuffle_read_bytes"] += sread.get(
                "Remote Bytes Read", 0
            ) + sread.get("Local Bytes Read", 0)
            swrite = metrics.get("Shuffle Write Metrics") or {}
            rec["shuffle_write_bytes"] += swrite.get("Shuffle Bytes Written", 0)
            inp = metrics.get("Input Metrics") or {}
            rec["input_bytes"] += inp.get("Bytes Read", 0)
    return queries


def write_trace(trace_dir: str, app_id: str, out_path: str) -> dict | None:
    """Summarize the session's event log into ``out_path``; returns the
    summary (None when the log is missing — e.g. tracing disabled)."""
    logs = _event_log_files(trace_dir, app_id)
    if not logs:
        return None
    summary = summarize_event_log(logs)
    with open(out_path, "w") as f:
        json.dump({"app_id": app_id, "queries": summary}, f, indent=1)
    return summary


def to_chrome_trace(summary: dict[str, dict]) -> list[dict]:
    """Render the summary as chrome://tracing 'X' events (the format the
    reference's Perfetto output uses) — one track per query, one span
    per job."""
    events = []
    for qi, (name, rec) in enumerate(sorted(summary.items())):
        for span in rec["spans"]:
            events.append(
                {
                    "name": f"{name} job {span['job']}",
                    "cat": "job",
                    "ph": "X",
                    "ts": span["start_ms"] * 1000,
                    "dur": max(1, (span["end_ms"] - span["start_ms"])) * 1000,
                    "pid": 0,
                    "tid": qi,
                }
            )
    return events
