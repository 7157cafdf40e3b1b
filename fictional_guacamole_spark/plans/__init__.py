"""Query plan library: the judged query surface (SURVEY.md §2).

Importing this package registers every query into ``registry.REGISTRY``.
"""

from fictional_guacamole_spark.plans import (  # noqa: F401
    registry,
    relational,
    relational_ext,
    tpch_extra,
    marketdata,
    extensions,
    windows_streaming,
)

REGISTRY = registry.REGISTRY
