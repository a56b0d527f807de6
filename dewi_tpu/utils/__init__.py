"""Host-side utilities: timing/tracing harness, structured logging."""

from .profiling import Timer, summarize, write_metrics, xla_trace

__all__ = ["Timer", "xla_trace", "summarize", "write_metrics"]
