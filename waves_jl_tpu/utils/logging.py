"""Metrics logging + profiling hooks.

Replaces the reference's in-memory metrics dict + PNG plots
(`scripts/main.jl:34-44,67`) with a JSONL metrics log and first-class
steps/sec counters; `jax.profiler` traces are one flag away.
"""
from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager


class MetricsLogger:
    """Append-only JSONL metrics log; also keeps in-memory history.

    `tensorboard_dir` additionally mirrors numeric values as TensorBoard
    scalars, via `torch.utils.tensorboard` (cpu torch is baked into this
    image) or the standalone `tensorboardX` package as a fallback. When
    neither writer imports, a one-time warning is printed and mirroring is
    disabled — TB is a viewer convenience, never a dependency.
    """

    def __init__(self, path: str | None = None, tensorboard_dir: str | None = None):
        self.path = path
        self.history: list[dict] = []
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None
        self._tb = None
        if tensorboard_dir:
            SummaryWriter = None
            try:
                from torch.utils.tensorboard import SummaryWriter
            except Exception:
                try:
                    from tensorboardX import SummaryWriter
                except Exception:
                    SummaryWriter = None
            if SummaryWriter is not None:
                try:
                    self._tb = SummaryWriter(tensorboard_dir)
                except Exception:
                    self._tb = None
            if self._tb is None:
                import warnings

                warnings.warn(
                    "tensorboard_dir was given but no TensorBoard writer is "
                    "importable (tried torch.utils.tensorboard, tensorboardX)"
                    " — scalar mirroring disabled",
                    stacklevel=2,
                )

    def log(self, **kv):
        rec = {"time": time.time(), **kv}
        self.history.append(rec)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._tb is not None:
            step = int(rec.get("step", len(self.history)))
            for k, v in rec.items():
                if k in ("time", "step", "epoch"):
                    continue
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
        return rec

    def close(self):
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


class Timer:
    """Running-average phase timer (the reference relies on ad-hoc @time)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        return self.totals.get(name, 0.0) / max(1, self.counts.get(name, 0))

    def summary(self) -> dict:
        return {k: self.mean(k) for k in self.totals}


@contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
