"""Named query plans wired to the driver contract (__spark_entry__).

``registry`` collects every QuerySpec; importing this package pulls in
all query modules so registration side effects run.
"""

from .registry import QuerySpec, REGISTRY, query, queries, oracle_sql

from . import relational_queries  # noqa: F401,E402
from . import tpch_queries  # noqa: F401,E402
from . import governance_queries  # noqa: F401,E402
from . import window_queries  # noqa: F401,E402
from . import function_queries  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import northstar_queries  # noqa: F401,E402
from . import analytics_queries  # noqa: F401,E402
from . import graph_queries  # noqa: F401,E402
from . import curation_queries  # noqa: F401,E402
from . import materialize_queries  # noqa: F401,E402

__all__ = ["QuerySpec", "REGISTRY", "query", "queries", "oracle_sql"]
