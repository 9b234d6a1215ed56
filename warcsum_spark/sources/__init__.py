"""Sources & sinks: raw .warc.gz member scan, web_pages table, text manifests."""
