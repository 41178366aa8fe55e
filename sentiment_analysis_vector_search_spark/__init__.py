"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference sentiment-analysis + vector-search platform
(see SURVEY.md). Spark-first: declarative DataFrame plans, Catalyst
optimization, broadcast dims, bucket-prefiltered similarity joins.
"""

__version__ = "0.1.0"
