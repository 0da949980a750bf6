"""Column-level building blocks (all JVM-side pyspark.sql.functions —
no Python UDFs in any hot path)."""
