"""Tracing / profiling utilities — the TPU equivalent of the reference's
cycle-accurate micro-benchmarking (reference: readTSC via rdtscp,
source/asm64/amd64.gnu/Tsc.s:27-31; min-of-N with TSC-overhead subtraction,
test/curve25519_test.c:159-166).

On TPU the measurement unit is wall-clock per batched op, so the discipline
becomes: compile + warm first, then best-of-N timed repetitions closed by a
host fetch (a sync barrier), reported as ops/s and ns/op. `trace()` wraps
jax.profiler for kernel-level inspection in Perfetto/XProf.
"""

import contextlib
import json
import time

import numpy as np

__all__ = ["bench", "trace", "trace_summary", "trace_device_events",
           "Counter", "timed"]


def bench(fn, *args, reps=8, rounds=3, warmup=True):
    """Best-of-`rounds` mean-of-`reps` timing of fn(*args); returns seconds
    per call.

    The ONE timing discipline of this repo (mirrors the reference
    speed_test's min-of-N, test/curve25519_test.c:159-166, adapted per
    PERF.md): each round issues `reps` INDEPENDENT dispatches and closes
    with a host fetch of the last result. Single-device execution is FIFO,
    so the fetch bounds all `reps` calls; the axon tunnel's
    block_until_ready can return early, which the fetch sidesteps. Do NOT
    chain outputs into inputs here — each dependent link adds ~15 ms of
    measured tunnel round-trip latency that is not device throughput (the
    intentional serial-chain slope microbench lives in
    benchmarks/bench_fe_micro.py).
    """
    if warmup:
        np.asarray(jax_leaf(fn(*args)))   # compile + hard sync
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        np.asarray(_scalar_probe(jax_leaf(r)))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _scalar_probe(leaf):
    """One ELEMENT of the last result, not the whole buffer: fetching a
    64K-lane output through the tunnel costs tens of ms (~40 MB/s measured),
    which the old full-array fetch silently charged to the timed round.
    The element still syncs the FIFO stream, so it bounds all reps."""
    try:
        return leaf[(0,) * leaf.ndim]
    except TypeError:         # non-indexable leaf (python scalar)
        return leaf


def jax_leaf(tree):
    """First array leaf of a pytree (for sync barriers)."""
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0] if leaves else np.zeros(())


@contextlib.contextmanager
def trace(logdir="/tmp/curve25519_tpu_trace"):
    """jax.profiler trace context — open the result in XProf/Perfetto.
    TPU-native replacement for rdtscp cycle windows. Works through the axon
    tunnel (verified round 3; an earlier hang was environmental) — pair
    with trace_summary() for in-terminal kernel attribution."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def trace_summary(logdir, prefix=None):
    """Aggregate the newest trace under `logdir` into
    {event_name: {"total_us": float, "count": int}}, most-expensive first.

    Device kernel events carry the pallas_call/HLO name (e.g.
    "ladder_tiled.1"); `prefix` filters to names starting with it. This is
    the scriptable slice of what XProf's timeline shows — enough to
    attribute per-kernel device time without a UI."""
    import glob
    import gzip

    paths = sorted(glob.glob(
        f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    events = json.loads(gzip.open(paths[-1]).read().decode())["traceEvents"]
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        if prefix is not None and not name.startswith(prefix):
            continue
        d = agg.setdefault(name, {"total_us": 0.0, "count": 0})
        d["total_us"] += e["dur"]
        d["count"] += 1
    return dict(sorted(agg.items(), key=lambda kv: -kv[1]["total_us"]))


def trace_device_events(logdir):
    """Aggregate ONLY device-lane events of the newest trace under `logdir`
    into {event_name: {"total_us", "count"}}, using the trace's process
    metadata to find accelerator pids (process names carrying "TPU" /
    "/device:"). This is what separates kernel time from inter-kernel glue:
    sum(all device events) - sum(kernel events) = the device-side
    non-kernel cost of an op (the r3 sign-path finding, PERF.md §5)."""
    import glob
    import gzip

    paths = sorted(glob.glob(
        f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    events = json.loads(gzip.open(paths[-1]).read().decode())["traceEvents"]
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = str(e.get("args", {}).get("name", ""))
            if "TPU" in pname or "/device:" in pname or "Device" in pname:
                dev_pids.add(e.get("pid"))
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        d = agg.setdefault(name, {"total_us": 0.0, "count": 0})
        d["total_us"] += e["dur"]
        d["count"] += 1
    return dict(sorted(agg.items(), key=lambda kv: -kv[1]["total_us"]))


class Counter:
    """Throughput counter: accumulate (ops, seconds), report ops/s.
    The multi-device variant is the psum'd op counters in parallel/mesh.py."""

    def __init__(self, name):
        self.name = name
        self.ops = 0
        self.seconds = 0.0

    def add(self, ops, seconds):
        self.ops += ops
        self.seconds += seconds

    @property
    def ops_per_s(self):
        return self.ops / self.seconds if self.seconds else 0.0

    def json(self, baseline_ops_per_s=None):
        d = {"metric": self.name, "value": round(self.ops_per_s, 1),
             "unit": "ops/s"}
        if baseline_ops_per_s:
            d["vs_baseline"] = round(self.ops_per_s / baseline_ops_per_s, 3)
        return json.dumps(d)


@contextlib.contextmanager
def timed(counter, ops):
    """Time a block and add it to a Counter."""
    t0 = time.perf_counter()
    yield
    counter.add(ops, time.perf_counter() - t0)
