"""pgweasel_spark — PySpark-native log parse → enrich → route → aggregate engine."""

__version__ = "0.1.0"
