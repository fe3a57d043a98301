"""XLA device-trace analysis: per-op time attribution without TensorBoard.

The reference has no profiling story at all (SURVEY.md §5 — only coarse
``time.time()`` wall-clock around pipeline stages).  braintpu captures
device traces with :func:`braintpu.utils.profiling.device_trace`; this
module turns the raw ``*.xplane.pb`` protobuf into an aggregated per-op
table — the tool used to find and eliminate the strided-slice, layout-copy
and GroupNorm-stats bottlenecks in the conv path.

Works offline from the protobuf alone (parses with the TF xplane schema;
degrades with a clear message when tensorflow isn't installed).
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional

__all__ = ["OpTime", "aggregate_trace", "format_table", "latest_xplane"]


@dataclass
class OpTime:
    name: str
    total_ms: float
    count: int

    @property
    def mean_ms(self) -> float:
        return self.total_ms / max(self.count, 1)


def latest_xplane(logdir: str) -> Optional[str]:
    """Newest ``*.xplane.pb`` under a ``jax.profiler.trace`` log directory."""
    paths = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/*.xplane.pb")))
    return paths[-1] if paths else None


def aggregate_trace(logdir_or_pb: str, line: str = "XLA Ops") -> List[OpTime]:
    """Aggregate device-op durations from a profiler capture.

    Args:
      logdir_or_pb: a trace log dir (newest capture is used) or a direct
        path to an ``.xplane.pb`` file.
      line: which trace line to aggregate — "XLA Ops" for per-HLO-op times,
        "XLA Modules" for whole-program executions.

    Returns:
      OpTime entries sorted by total time, descending.
    """
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except Exception as e:  # pragma: no cover - env without tensorflow
        raise RuntimeError(
            "trace parsing needs the TF xplane protobuf schema "
            "(tensorflow.tsl.profiler.protobuf); not available: %s" % e
        )

    pb = logdir_or_pb
    if os.path.isdir(pb):
        found = latest_xplane(pb)
        if found is None:
            raise FileNotFoundError(f"no .xplane.pb under {logdir_or_pb}")
        pb = found

    xs = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        xs.ParseFromString(f.read())

    totals: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)
    seen: List[str] = []
    for plane in xs.planes:
        seen.append(f"{plane.name}: lines {[ln.name for ln in plane.lines]}")
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        # the proto map's KEY is the canonical metadata id; the message's
        # .id field is optional duplication that some producers leave unset
        emeta = {k: m.name for k, m in plane.event_metadata.items()}
        for ln in plane.lines:
            if ln.name != line:
                continue
            for ev in ln.events:
                name = emeta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
    if not totals:
        raise ValueError(
            f"no device plane with a {line!r} line in this capture — per-op "
            "attribution needs a TPU/GPU trace (CPU captures only record "
            "host threads).  Planes found:\n  " + "\n  ".join(seen)
        )
    return sorted(
        (OpTime(n, t, counts[n]) for n, t in totals.items()),
        key=lambda o: -o.total_ms,
    )


def format_table(ops: List[OpTime], top: int = 30, width: int = 100) -> str:
    """Human-readable top-N table."""
    total = sum(o.total_ms for o in ops)
    lines = [f"{'total ms':>10}  {'count':>6}  {'%':>5}  op", "-" * width]
    for o in ops[:top]:
        pct = 100.0 * o.total_ms / total if total else 0.0
        lines.append(
            f"{o.total_ms:10.2f}  {o.count:6d}  {pct:5.1f}  {o.name[: width - 28]}"
        )
    lines.append(f"{total:10.2f}  (all {len(ops)} ops)")
    return "\n".join(lines)
