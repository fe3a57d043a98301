"""Serving layer: REST API + job store + built-in web UI (stdlib only)."""

from .api import BLOCKED_KEYWORDS, CLINICAL_REFUSAL, AnalysisServer, make_server
from .jobs import STAGE_PROGRESS, JobStore

__all__ = [
    "BLOCKED_KEYWORDS",
    "CLINICAL_REFUSAL",
    "AnalysisServer",
    "make_server",
    "STAGE_PROGRESS",
    "JobStore",
]
