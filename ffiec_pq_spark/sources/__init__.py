"""Sources: zip manifests, TSV/POR readers, XBRL extraction, parquet scans."""
