"""pyspark.ml demand forecasting (SURVEY.md §2.9 U3/U4)."""
