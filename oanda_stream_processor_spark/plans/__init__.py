"""Physical-layout utilities: partitioning, skew handling, bucketing."""
