"""apitap_spark — a PySpark-native analytics/ETL engine.

A from-scratch Spark-first re-expression of the capabilities of the
``abduldjafar/apitap`` reference engine (Rust + DataFusion 47):

* paginated HTTP JSON extraction registered as SQL-queryable tables
  (reference ``src/http/fetcher.rs``, ``src/utils/table_provider.rs``),
* full SQL transforms delegated to Spark SQL / Catalyst (reference
  delegates to DataFusion, ``Cargo.toml:24``),
* schema-creating, version-aware merge/upsert warehouse sink
  (reference ``src/writer/postgres.rs``),
* Jinja-templated SQL-module pipeline DSL + YAML config
  (reference ``src/config/templating.rs``, ``src/pipeline/mod.rs``),

plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) that go beyond the
reference surface, designed for 100 TB-class Spark clusters.
"""

from apitap_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
