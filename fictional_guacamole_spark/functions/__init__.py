"""Column-level function library: text analysis, dedup primitives,
similarity search, multimodal plumbing — the LLM-data-pipeline extension
surface (SURVEY.md §2.5 extensions), all built on JVM-side
``pyspark.sql.functions`` except where Pandas UDFs are genuinely required.
"""
