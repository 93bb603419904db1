"""s3_elasticsearch_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the capabilities of the
reference repo ``priyanshijat/s3-elasticsearch-data-pipeline`` (an AWS
Glue + Athena + Elasticsearch incremental ETL pipeline), extended with
the operators a large-scale LLM training-data pipeline needs
(deduplication, similarity search, text analysis, multimodal columns).

Design principles (SURVEY.md §7):

- **DataFrame/SQL only** — declare logical plans, let Catalyst pick the
  physical strategy. No RDDs, no driver-side row collects.
- **Partition-aware at 100 TB** — hive-partitioned sources prune at
  planning time; the only shuffle-heavy op (the id-level anti-join) is
  designed for sort-merge + runtime bloom filters.
- **UDF-free parity surface** — every reference operator maps to
  built-in expressions; Pandas UDFs appear only in the extension surface
  (multimodal decode) where built-ins genuinely cannot express it.
"""

__version__ = "0.1.0"

from s3_elasticsearch_data_pipeline_spark.session import get_spark  # noqa: F401
from s3_elasticsearch_data_pipeline_spark.tables import TABLES, load_tables, register_views  # noqa: F401
