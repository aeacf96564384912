"""PySpark-native analytics + ingestion engine.

A brand-new, Spark-first engine with the capability surface of the
reference ingestion pipeline (``dbmurphy/mysql_public_data_ingestor``,
surveyed in ``SURVEY.md``) plus the driver-mandated analytics surface:
relational operators, streaming windows, and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) — all
designed for 100 TB scale: declarative DataFrame plans, Catalyst
pushdown/pruning, broadcast joins for dims, no driver-side collects in
any hot path.

Layout:
    session.py     SparkSession factory tuned for local[32] and cluster use
    tables.py      parquet table loaders for the driver fixtures
    config.py      YAML config model (reference: config/config.go)
    schema.py      schema registry + StructType<->MySQL DDL (reference:
                   api_plugins/opensky/opensky_plugin.go:35-54)
    topology.py    DB x table fan-out topology (reference:
                   database/db_manager.go:115-139)
    sources/       plugin registry, OpenSky-style REST poll source, JDBC
    operators/     relational / dedup / similarity / text / multimodal
    functions/     shared column-expression helpers
    streaming/     micro-batch ingest loop + streaming analytics
    plans/         plan inspection/assertion helpers
    registry.py    central query registry backing __spark_entry__.py
"""

__version__ = "0.1.0"
