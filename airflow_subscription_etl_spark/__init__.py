"""airflow_subscription_etl_spark — a PySpark-native analytics engine.

Re-expresses the query semantics of the reference repo
``gompa969/airflow-subscription-etl`` (an Airflow DAG of row-at-a-time
Python ETL over two JSON tables; see ``/root/reference/dags/
subscription_flow.py``) as an idiomatic Spark DataFrame library, and
extends it with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Design stance (SURVEY.md §7):
- All data logic is declarative DataFrame code — Catalyst plans it,
  Tungsten executes it; no RDDs, no driver-side row loops.
- Dimension-sized tables (the 3-row ``plans`` catalog analog) are
  broadcast; fact-side operators shuffle only on their natural keys.
- Orchestration (the Airflow layer of the reference) is plain driver
  control flow in :mod:`.plans.pipeline`.
"""

from .session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
