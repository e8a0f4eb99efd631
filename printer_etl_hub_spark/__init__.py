"""printer_etl_hub_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL hub ``gorzerk1/Printer-ETL-Hub`` (studied
read-only; see SURVEY.md for the full operator inventory and the mapping of
every reference operator to a Spark primitive), extended with the operators a
large-scale training-data pipeline needs: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding-cosine), similarity search, multimodal
binary-column plumbing, and text analysis.

Design principles (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst + Tungsten pick the physical plan.
- Dimensions broadcast; fact-fact joins shuffle on keys with AQE enabled.
- Python UDFs only for genuinely non-relational work (network fetch,
  HTML/XML scraping, multimodal decode) — always Arrow-batched
  (pandas_udf / mapInPandas), never row-at-a-time.
- Order-dependent reference semantics (first-appearance, last-wins) are made
  explicit with seq columns — Spark has no implicit row order.
"""

__version__ = "0.1.0"
