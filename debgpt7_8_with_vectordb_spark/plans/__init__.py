"""Query catalog — every operator exposed as a named (spark, sf_dir) query.

Importing this package populates ``QUERIES`` / ``ORACLE`` (the driver
contract surface in ``__spark_entry__.py``).
"""

from .catalog import ORACLE, QUERIES  # noqa: F401

# registration side effects
from . import retrieval_queries  # noqa: F401,E402
from . import relational_queries  # noqa: F401,E402
from . import analytics_queries  # noqa: F401,E402
from . import dedup_queries  # noqa: F401,E402
from . import text_queries  # noqa: F401,E402
from . import dataflow_queries  # noqa: F401,E402
from . import pipeline_queries  # noqa: F401,E402
from . import corpus_pipeline  # noqa: F401,E402
from . import curation_queries  # noqa: F401,E402
