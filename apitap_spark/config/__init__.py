"""Pipeline configuration: YAML model + env-var credential resolution."""

from apitap_spark.config.models import (
    Config,
    ConfigError,
    SourceConfig,
    TargetConfig,
    load_config,
    load_config_from_path,
)

__all__ = [
    "Config",
    "ConfigError",
    "SourceConfig",
    "TargetConfig",
    "load_config",
    "load_config_from_path",
]
