"""Operator families. Importing this package registers every query.

Each module holds one SURVEY §2 family; the @query decorator binds the
Spark implementation to its DuckDB oracle SQL at import time.
"""

from __future__ import annotations

import importlib
import pkgutil

for _mod in pkgutil.iter_modules(__path__):
    if not _mod.name.startswith("_"):
        importlib.import_module(f"{__name__}.{_mod.name}")

# engine modules outside operators/ that also declare queries
importlib.import_module("base_etl_spark.ann")
importlib.import_module("base_etl_spark.sinks")
importlib.import_module("base_etl_spark.multimodal")
importlib.import_module("base_etl_spark.profiling")
importlib.import_module("base_etl_spark.etl")
importlib.import_module("base_etl_spark.pysource")
