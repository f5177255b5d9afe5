"""The engine's query surface.

Modules register their queries into :mod:`.registry`; importing this package
pulls in every operator family so ``registry.QUERIES`` is fully populated.
"""

from distributed_video_analytics_flink_spark.operators import (  # noqa: F401
    dedup,
    relational,
    scalars,
    similarity,
    sql_surface,
    text_analysis,
    video,
)
from distributed_video_analytics_flink_spark.operators.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    oracle_sql,
    queries,
)
