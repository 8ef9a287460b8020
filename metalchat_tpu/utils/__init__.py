"""Shared utilities: structured logging, tracing/profiling hooks."""

from metalchat_tpu.utils.profiling import (  # noqa: F401
    Meter,
    get_logger,
    named_scope,
    trace,
)
