"""Query plans — importing this package registers every query.

Modules self-register into ``registry.REGISTRY`` at import time.
"""

from football_lakehouse_spark.plans import registry

# Import for side effects: each module registers its queries.
from football_lakehouse_spark.plans import flagship  # noqa: F401, E402
from football_lakehouse_spark.plans import relational  # noqa: F401, E402
from football_lakehouse_spark.plans import windows  # noqa: F401, E402
from football_lakehouse_spark.plans import lakehouse_plans  # noqa: F401, E402
from football_lakehouse_spark.plans import streaming_plans  # noqa: F401, E402
from football_lakehouse_spark.plans import ml_plans  # noqa: F401, E402
from football_lakehouse_spark.plans import llm_plans  # noqa: F401, E402
from football_lakehouse_spark.plans import advanced_plans  # noqa: F401, E402

__all__ = ["registry"]
