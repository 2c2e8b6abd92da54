"""Plans: the round checkpoint protocol and the table-storage seam
(Iceberg when a catalog is configured, plain parquet round directories
otherwise)."""
