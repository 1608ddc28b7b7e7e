"""Pipeline DSL: SQL-module templating, orchestration, CLI."""

from apitap_spark.pipeline.runner import run_pipeline
from apitap_spark.pipeline.templating import list_sql_templates, render_module

__all__ = ["run_pipeline", "list_sql_templates", "render_module"]
