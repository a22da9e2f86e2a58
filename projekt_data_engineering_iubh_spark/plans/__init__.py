"""Query catalog: named (Spark plan, DuckDB oracle SQL) pairs.

Importing this package populates the registry; ``__spark_entry__`` exposes
it to the verification driver.
"""

from projekt_data_engineering_iubh_spark.plans.registry import (  # noqa: F401
    Query,
    all_queries,
    headline_queries,
    register,
)

# Importing the modules registers their queries.
from projekt_data_engineering_iubh_spark.plans import (  # noqa: E402,F401
    curation_queries,
    events,
    relational,
    text_queries,
    vector_queries,
)
