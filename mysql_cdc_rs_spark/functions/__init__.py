"""Spark-side function library: Arrow-vectorized pandas UDFs wrapping the
kernel, plus pure-Column expressions for everything Catalyst can codegen."""
