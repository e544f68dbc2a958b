"""Ingestion sources: containers the crawl actually arrives in (WARC),
parsed into the pages table the rest of the engine consumes."""
