"""Query catalog package — the driver-contract surface.

Importing this package populates ``CATALOG`` with every implemented
query (one entry per operator family from SURVEY.md §2 plus the
large-scale extension operators).
"""

from qaapi_spark.plans.catalog import CATALOG, QuerySpec, query

# Registration side effects: each module adds its queries to CATALOG.
from qaapi_spark.plans import relational  # noqa: E402,F401
from qaapi_spark.plans import relational2  # noqa: E402,F401
from qaapi_spark.plans import relational3  # noqa: E402,F401
from qaapi_spark.plans import relational4  # noqa: E402,F401
from qaapi_spark.plans import relational5  # noqa: E402,F401
from qaapi_spark.plans import relational6  # noqa: E402,F401
from qaapi_spark.plans import maintenance  # noqa: E402,F401
from qaapi_spark.plans import calabrio  # noqa: E402,F401
from qaapi_spark.plans import llm_text  # noqa: E402,F401
from qaapi_spark.plans import llm_dedup  # noqa: E402,F401
from qaapi_spark.plans import llm_similarity  # noqa: E402,F401
from qaapi_spark.plans import llm_multimodal  # noqa: E402,F401
from qaapi_spark.plans import llm_sketches  # noqa: E402,F401
from qaapi_spark.plans import llm_sampling  # noqa: E402,F401
from qaapi_spark.plans import llm_retrieval  # noqa: E402,F401
from qaapi_spark.plans import llm_curation  # noqa: E402,F401
from qaapi_spark.plans import llm_pipeline  # noqa: E402,F401
from qaapi_spark.plans import llm_clustering  # noqa: E402,F401
from qaapi_spark.plans import profiling  # noqa: E402,F401
from qaapi_spark.plans import mining  # noqa: E402,F401

__all__ = ["CATALOG", "QuerySpec", "query"]
