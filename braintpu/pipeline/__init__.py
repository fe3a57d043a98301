"""Single-process pipeline orchestration with structured progress events."""

from .orchestrator import STAGES, Pipeline, PipelineConfig, PipelineResult, StageEvent

__all__ = ["STAGES", "Pipeline", "PipelineConfig", "PipelineResult", "StageEvent"]
