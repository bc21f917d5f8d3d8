"""PySpark-native analytics engine with Netflix-Atlas query capabilities.

Public surface:
  - `atlas_spark.session.get_spark`      — configured SparkSession factory
  - `atlas_spark.api.Engine`             — graph/fetch/tags entry points
  - `atlas_spark.stacklang.vocab.parse`  — ASL -> expression AST
  - `atlas_spark.plans.builder.Evaluator`— AST -> DataFrame plans
  - `atlas_spark.registry`               — named driver-contract queries
"""

__version__ = "0.1.0"
