"""Structured-Streaming surface: frame parsing (P1–P7), the pipeline
wiring (source → stateful kernel → sinks), gap backfill (T6), and the
schema-compat views that reproduce the reference's table shapes."""
