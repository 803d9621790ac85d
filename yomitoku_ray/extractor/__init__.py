from .schema import ColumnSchema, ExtractionSchema, FieldSchema
from .rule_pipeline import run_rule_extraction

__all__ = ["ColumnSchema", "ExtractionSchema", "FieldSchema", "run_rule_extraction"]
