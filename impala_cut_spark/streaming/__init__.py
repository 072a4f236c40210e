"""Structured Streaming surface.

The reference is pure batch MPP (SURVEY.md §2.9 — no streaming
operators exist there); this package is engine-extension surface: the
events table replayed as a stream with watermarked windowed
aggregation, sharing semantics with the batch rollups in
plans/coverage.py.
"""
