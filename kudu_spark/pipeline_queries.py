"""Training-data pipeline operators (dedup, similarity, text analysis).

Filled in as operators land; each registers into kudu_spark.queries.REGISTRY.
"""

from __future__ import annotations
