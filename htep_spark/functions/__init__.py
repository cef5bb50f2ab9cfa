"""Pure-Python operator kernels shared by the pytest oracle and Spark UDFs."""
