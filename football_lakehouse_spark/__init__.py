"""football_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
the reference lakehouse (ceungblut/football-lakehouse, surveyed in
SURVEY.md): a medallion (Bronze/Silver/Gold) pattern library, the full
relational operator inventory (SURVEY.md §2), streaming ingest with
availableNow semantics, a deterministic constrained optimizer, and the
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) — all designed for 100 TB scale:

- declarative DataFrame/SQL plans only (Catalyst handles pushdown,
  pruning, join selection); zero row-at-a-time Python UDFs on hot paths
- broadcast hints for dimension joins, AQE on, partition-pruned scans
- no driver-side ``collect()`` inside any operator
"""

__version__ = "0.1.0"
