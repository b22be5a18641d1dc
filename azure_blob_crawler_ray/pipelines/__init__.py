"""End-to-end pipelines: ingest (blob -> index), crawl (wave loop), and
the query layer over the index table."""
