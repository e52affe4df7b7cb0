"""Shared utilities: profiling/tracing instrumentation."""
