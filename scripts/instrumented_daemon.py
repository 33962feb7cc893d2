"""Instrumented pyspark.daemon: times each worker-prologue helper per task.

Usage: spark.python.daemon.module=instrumented_daemon with
PYTHONPATH including this directory. Writes per-call timings to
/tmp/worker_prof.jsonl (append, one JSON per helper call).
"""

import json
import os
import time

import pyspark.daemon as daemon
import pyspark.worker as worker

try:
    from html_table_spark import fastdaemon
    _PATCHED = fastdaemon.apply()
except Exception:
    _PATCHED = False


def _timed(name, fn):
    def wrap(*a, **k):
        t0 = time.monotonic()
        r = fn(*a, **k)
        dt = (time.monotonic() - t0) * 1000
        try:
            with open("/tmp/worker_prof.jsonl", "a") as f:
                f.write(json.dumps({"fn": name, "ms": round(dt, 2), "pid": os.getpid()}) + "\n")
        except OSError:
            pass
        return r

    return wrap


for _name in (
    "check_python_version",
    "setup_spark_files",
    "setup_broadcasts",
    "read_udfs",
    "read_command",
    "send_accumulator_updates",
):
    if hasattr(worker, _name):
        setattr(worker, _name, _timed(_name, getattr(worker, _name)))

# inside setup_spark_files: which line is slow?
import importlib

import pyspark.worker_util as worker_util

_orig_invalidate = importlib.invalidate_caches


def _probed_invalidate():
    import sys
    import time as _t

    details = []
    for name, f in list(sys.path_importer_cache.items()):
        if f is not None and hasattr(f, "invalidate_caches"):
            t0 = _t.monotonic()
            f.invalidate_caches()
            ms = round((_t.monotonic() - t0) * 1000, 2)
            if ms > 1:
                details.append((name[:120], repr(f)[:60], ms))
    try:
        with open("/tmp/worker_prof.jsonl", "a") as fh:
            fh.write(json.dumps({
                "fn": "invalidate_detail",
                "pid": os.getpid(),
                "n_cache": len(sys.path_importer_cache),
                "finders": details,
            }) + "\n")
    except OSError:
        pass


importlib.invalidate_caches = _timed(
    "importlib.invalidate_caches", _probed_invalidate
)
worker_util.importlib = importlib
worker_util.add_path = _timed("add_path", worker_util.add_path)
worker_util.utf8_deserializer.loads = _timed(
    "utf8_loads", worker_util.utf8_deserializer.loads
)


if __name__ == "__main__":
    daemon.manager()
