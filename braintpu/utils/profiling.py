"""Tracing & profiling: first-class observability for the compute path.

The reference's only timing is coarse ``time.time()`` wall-clock
(SURVEY.md §5: run_full_pipeline.py:174-185, :481).  Here:

* :class:`StageTimer` — nested named spans with a structured summary,
* :func:`device_trace` — context manager around ``jax.profiler`` traces
  (viewable in TensorBoard/XProf),
* :func:`timed_device` — wall-clock a device computation honestly
  (block_until_ready around the call).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

__all__ = ["StageTimer", "device_trace", "timed_device"]


@dataclass
class Span:
    name: str
    start: float
    end: Optional[float] = None
    children: List["Span"] = field(default_factory=list)

    @property
    def seconds(self) -> float:
        return (self.end or time.perf_counter()) - self.start

    def as_dict(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "seconds": round(self.seconds, 4),
            "children": [c.as_dict() for c in self.children],
        }


class StageTimer:
    """Nested span timer: ``with timer.span("segmenting"): ...``"""

    def __init__(self):
        self.root: List[Span] = []
        self._stack: List[Span] = []

    @contextlib.contextmanager
    def span(self, name: str):
        s = Span(name, time.perf_counter())
        (self._stack[-1].children if self._stack else self.root).append(s)
        self._stack.append(s)
        try:
            yield s
        finally:
            s.end = time.perf_counter()
            self._stack.pop()

    def summary(self) -> List[Dict[str, Any]]:
        return [s.as_dict() for s in self.root]

    def report(self) -> str:
        def fmt(span: Dict[str, Any], depth=0) -> List[str]:
            out = [f"{'  ' * depth}{span['name']:<28} {span['seconds']:8.3f}s"]
            for c in span["children"]:
                out.extend(fmt(c, depth + 1))
            return out

        lines: List[str] = []
        for s in self.summary():
            lines.extend(fmt(s))
        return "\n".join(lines)

    def save(self, path) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/braintpu_trace"):
    """Capture an XLA device trace for TensorBoard's profiler."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_device(fn, *args, repeats: int = 1, **kwargs):
    """(result, seconds) with a proper device sync; min over ``repeats``."""
    import jax

    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - t0)
    return result, best
