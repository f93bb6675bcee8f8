"""Profiling helpers.

The reference measures performance purely through its Criterion bench
harness (reference: benches/lib.rs:92-98); the TPU analog is the JAX
profiler writing xprof/perfetto traces. These thin wrappers standardize
where traces land so benchmark runs can always be inspected after the
fact.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(name: str = "frizbee", log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a device trace of the enclosed block::

        with profiling.trace("match_100k"):
            matcher.match_arrays(corpus)

    View with xprof/tensorboard on the written directory."""
    import jax

    log_dir = log_dir or os.environ.get(
        "FRIZBEE_TPU_TRACE_DIR", "/tmp/frizbee_tpu_traces"
    )
    path = os.path.join(log_dir, f"{name}-{int(time.time())}")
    with jax.profiler.trace(path):
        yield
    print(f"[frizbee-tpu] trace written to {path}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the xprof timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def device_time(fn, *args, iters: int = 10, **kwargs) -> float:
    """Median wall seconds per call of a device function, warmup included.
    Blocks on the result each call, so on high-latency links this measures
    link latency too — prefer ``trace`` for kernel-level numbers."""
    import jax

    fn(*args, **kwargs)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
