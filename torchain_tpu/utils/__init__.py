"""utils — profiling/tracing and misc helpers."""

from torchain_tpu.utils.profiling import StepTimer, trace_annotation, profile_trace

__all__ = ["StepTimer", "trace_annotation", "profile_trace"]
