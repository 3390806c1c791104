"""Sources and sinks: parquet lake I/O, JDBC, and watermark state."""
