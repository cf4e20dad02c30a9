"""Sources & sinks (SURVEY.md §2 H): ingestion, ETL stamping, CSV/parquet IO."""
