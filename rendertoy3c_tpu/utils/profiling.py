"""Device profiling helpers.

The reference's instrumentation is host wall-clock phase timers + an fps
overlay (src/wavefront.cpp:334-357, sutil/sutil.cpp:712-773) and an unused
NVTX hookup. The TPU equivalents: utils/timers.py for host phases, and this
module for device-side op-level profiles via jax.profiler — including a
parser that aggregates the captured trace into a per-op cost table (the
workflow used to drive this framework's own kernel optimization).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from contextlib import contextmanager
from typing import Callable, List, Tuple

import jax


@contextmanager
def device_trace(log_dir: str):
    """Capture a device trace: `with device_trace('/tmp/prof'): step()`."""
    with jax.profiler.trace(log_dir):
        yield


def summarize_trace(log_dir: str, top: int = 25) -> List[Tuple[str, float, int]]:
    """Aggregate the newest captured trace into [(op, total_ms, count)] rows
    sorted by total duration."""
    files = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        return []
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return [(name, dur / 1e3, cnt[name]) for name, dur in agg.most_common(top)]


def profile_step(step: Callable, *args, log_dir: str = "/tmp/rt3c_prof",
                 top: int = 25, rearm: Callable | None = None):
    """Run one warmed call under the profiler and return the op table.

    `rearm` (optional): zero-arg factory returning fresh call args; required
    when `step` donates an input buffer (e.g. the film accumulator), since
    the warmup call consumes it."""
    out = step(*(rearm() if rearm else args))
    jax.block_until_ready(out)
    with device_trace(log_dir):
        out = step(*(rearm() if rearm else args))
        jax.block_until_ready(out)
    return summarize_trace(log_dir, top=top)
