"""Query catalog: every operator from SURVEY.md §2 exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
a DuckDB oracle twin. The driver consumes these via ``__spark_entry__``.
"""

from __future__ import annotations

from .base import REGISTRY, Query

# importing the modules populates REGISTRY
from . import relational as _relational  # noqa: E402,F401
from . import llm as _llm  # noqa: E402,F401
from . import cdc_stream as _cdc_stream  # noqa: E402,F401


def all_queries() -> dict[str, Query]:
    return dict(REGISTRY)
