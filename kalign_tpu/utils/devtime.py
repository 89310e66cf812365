"""Honest device-side timing through the tunnel.

The dev environment reaches the TPU through a tunnel whose per-launch
round trips cost seconds and whose chip is shared: wall-clock numbers
vary >2x run to run for identical code (BENCH_r01 42 GCUPS vs BENCH_r02
18 GCUPS for the same binary).  The contention-immune measurement is the
device's own event trace: wrap the computation in jax.profiler.trace and
sum the durations of events attributed to the TPU device process in the
exported Chrome-trace files.

This module codifies that recipe (CLAUDE.md "Honest device-side
timing"); the CLI --trace flag and bench.py use it.
"""

import glob
import gzip
import json
import os
import tempfile
from contextlib import contextmanager


def _iter_trace_files(trace_dir):
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    seen = set()
    for p in pats:
        for f in glob.glob(p, recursive=True):
            if f not in seen:
                seen.add(f)
                yield f


def device_seconds(trace_dir, device_substr="TPU"):
    """Sum event durations (seconds) attributed to device processes in
    every Chrome-trace file under `trace_dir`.

    Device processes are identified by their process_name metadata
    containing `device_substr` (e.g. "/device:TPU:0"); falls back to
    pid-name heuristics seen across jax versions.  Events nested inside
    other events on the same thread would double-count, so only
    top-level complete events per (pid, tid) are summed (intervals are
    merged per thread)."""
    total = 0.0
    for path in _iter_trace_files(trace_dir):
        opener = gzip.open if path.endswith(".gz") else open
        try:
            with opener(path, "rb") as fh:
                data = json.load(fh)
        except Exception:
            continue
        events = data.get("traceEvents", [])
        dev_pids = set()
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                name = str((e.get("args") or {}).get("name", ""))
                if device_substr in name:
                    dev_pids.add(e.get("pid"))
        if not dev_pids:
            continue
        # merge intervals per (pid, tid) so nested/overlapping events
        # do not double-count
        by_thread = {}
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                ts = e.get("ts")
                dur = e.get("dur")
                if ts is None or dur is None:
                    continue
                by_thread.setdefault((e["pid"], e.get("tid")), []).append(
                    (float(ts), float(ts) + float(dur)))
        for ivals in by_thread.values():
            ivals.sort()
            cur_s, cur_e = None, None
            for s, t in ivals:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        total += cur_e - cur_s
                    cur_s, cur_e = s, t
                else:
                    cur_e = max(cur_e, t)
            if cur_e is not None:
                total += cur_e - cur_s
    return total / 1e6  # trace timestamps are microseconds


@contextmanager
def device_timer(result_box, device_substr="TPU", keep_dir=None):
    """Context manager: traces the enclosed computation and stores the
    summed device seconds into result_box["device_s"].

    result_box also receives "trace_dir" when keep_dir is given (the
    temporary directory is deleted otherwise)."""
    import shutil

    import jax

    d = keep_dir or tempfile.mkdtemp(prefix="ktrace_")
    try:
        with jax.profiler.trace(d):
            yield
        result_box["device_s"] = device_seconds(d, device_substr)
        if keep_dir:
            result_box["trace_dir"] = d
    finally:
        if not keep_dir:
            shutil.rmtree(d, ignore_errors=True)
