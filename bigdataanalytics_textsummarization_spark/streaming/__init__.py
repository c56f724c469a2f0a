"""Structured Streaming surface: watermarked windows, sessions, custom state."""

from . import events  # noqa: F401
