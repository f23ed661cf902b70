"""Sources & sinks: NT files, parquet fixture tables, driver testdata."""
