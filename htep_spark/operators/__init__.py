"""Spark-side operators: vectorized UDFs and built-in column expressions."""
