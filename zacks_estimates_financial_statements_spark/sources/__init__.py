"""Sources: raw-zone (dated HTML/JSON directories) and Parquet table scans."""
