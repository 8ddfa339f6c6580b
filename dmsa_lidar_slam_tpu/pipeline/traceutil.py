"""Shared jax.profiler trace capture + parsing.

One definition of "device-busy ms/scan" used by BOTH bench.py and
tools/profile_tpu.py, so the two instruments cannot disagree about what
they measure (VERDICT r3: the bench wall-clock ratio and PROFILE.md's
device-time table drifted 1.5x apart because they had no shared metric).

Method: jax.profiler writes a Chrome-trace export; XLA device execution
shows up as "X" events on the "XLA Modules" thread (whole-module spans) and
"XLA Ops" thread (per-op spans).  Device-busy time = sum of module-span
durations; it excludes host gaps, transfers queued behind compute, and jit
compilation — the pure device cost of the dispatched work.
"""

import collections
import glob
import gzip
import json
import os
import re
import tempfile
from contextlib import contextmanager
from typing import Dict, Optional, Tuple


@contextmanager
def capture(trace_dir: Optional[str] = None):
    """Context manager: capture a jax.profiler trace into `trace_dir`
    (a fresh private temp dir when None).  Yields the directory path."""
    import jax

    d = trace_dir or tempfile.mkdtemp(prefix="dmsa_trace_")
    with jax.profiler.trace(d):
        yield d


def load_events(trace_dir: str):
    """Load the newest *.trace.json.gz under trace_dir.

    Returns (x_events, pids, tids): the complete "X" (span) events plus the
    pid -> process-name and (pid, tid) -> thread-name maps."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    d = json.loads(gzip.decompress(open(path, "rb").read()))
    events = d.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tids = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    xs = [e for e in events if e.get("ph") == "X"]
    return xs, pids, tids


def device_busy_ms(trace_dir: str) -> float:
    """Total device-busy time (ms) in the trace: the sum of XLA module-span
    durations on device threads."""
    xs, _, tids = load_events(trace_dir)
    total = 0.0
    for e in xs:
        if tids.get((e["pid"], e["tid"]), "") == "XLA Modules":
            total += e.get("dur", 0)
    return total / 1e3


def op_totals(trace_dir: str) -> Tuple[float, Dict[str, float], Dict[str, int]]:
    """(module_total_ms, per-op total ms, per-op count) over the trace."""
    xs, _, tids = load_events(trace_dir)
    mod_total = 0.0
    ops: Dict[str, float] = collections.Counter()
    opn: Dict[str, int] = collections.Counter()
    for e in xs:
        line = tids.get((e["pid"], e["tid"]), "")
        if line == "XLA Modules":
            mod_total += e.get("dur", 0)
        elif line == "XLA Ops":
            ops[e["name"]] += e.get("dur", 0)
            opn[e["name"]] += 1
    return mod_total / 1e3, ops, opn


def category_totals(ops: Dict[str, float], opn: Dict[str, int], mod_total_ms: float):
    """Group per-op totals by op base name; structural whiles/conditionals
    that nest most of the module time are excluded to avoid double counts."""
    cat = collections.Counter()
    catn = collections.Counter()
    for k, v in ops.items():
        if re.match(r"^(conditional|while)[.\d]*$", k) and v > 0.05 * mod_total_ms * 1e3:
            continue
        base = re.sub(r"[.\d]+$", "", k)
        cat[base] += v
        catn[base] += opn[k]
    return cat, catn
