"""fictional_guacamole_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference pipeline
(altfund/fictional_guacamole, surveyed in SURVEY.md): streaming ingest →
stateful order-book transform → dedup → completeness check → sink, plus a
full batch/SQL query surface and LLM-data-pipeline extension operators
(dedup, similarity search, text analysis, multimodal columns), all designed
for Spark's distributed execution model.
"""

__version__ = "0.1.0"

from fictional_guacamole_spark.session import get_spark  # noqa: F401
