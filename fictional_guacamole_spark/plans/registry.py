"""Registry of judged queries.

Each :class:`Query` pairs a Spark DataFrame builder with an equivalent
ANSI-SQL oracle string runnable by DuckDB on the same parquet tables.
The driver executes both at sf0.01 and compares row count + schema +
order-insensitive value hash — so every computed column must carry the SAME
alias on both sides, and numeric aggregates must be computed so the two
engines produce bit-identical values (see ``plans/relational.py`` docstring
for the decimal-sum technique).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    survey_ref: str = ""  # operator ids from SURVEY.md §2 this query evidences
    description: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: list[str] = field(default_factory=list)


def query(name: str, *, oracle: str | None, survey_ref: str = "",
          description: str = "", bench: bool = False,
          tags: list[str] | None = None) -> Callable[[Builder], Builder]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def prepped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Session prep must not depend on which code paths a builder
            # happens to exercise: a builder whose fixture cache is WARM
            # can skip every load_table call, leaving a caller-provided
            # bare session without the addPyFile zip — and any
            # by-reference UDF (the book kernel) then dies on executors
            # with ModuleNotFoundError when the driver's cwd isn't the
            # repo (found by the /verify foreign-cwd recipe with warm
            # /tmp caches, exactly the round driver's environment).
            from fictional_guacamole_spark.tables import (
                _ensure_session_conf)

            _ensure_session_conf(spark)
            return fn(spark, sf_dir)

        prepped.__name__ = fn.__name__
        prepped.__doc__ = fn.__doc__
        prepped.__wrapped__ = fn
        REGISTRY[name] = Query(
            name=name, builder=prepped, oracle=oracle, survey_ref=survey_ref,
            description=description or (fn.__doc__ or "").strip().splitlines()[0]
            if (description or fn.__doc__) else "",
            bench=bench, tags=tags or [],
        )
        return fn

    return deco
