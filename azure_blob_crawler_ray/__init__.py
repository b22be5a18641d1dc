"""azure_blob_crawler_ray — a Ray-Data-native crawl/ingest/query engine.

A from-scratch re-expression of the data-processing capabilities of the
reference repo ``Scientialibera/AZURE-BLOB-CRAWLER`` (an Azure-event-driven
blob ingest microservice) as an explicit, distributed URL-frontier pipeline
built on ``ray.data.Dataset``:

- frontier / fetch / parse / chunk / embed / index as ``map_batches`` stages
  over zero-copy Arrow batches (actor pools for stateful stages);
- a sharded cuckoo-filter URL-seen set keyed by 64-bit canonical-URL hashes;
- per-host politeness priority queues (min-heap on virtual next-fetch-time,
  robots gating) in stateful scheduler actors;
- per-wave groupby/aggregate/sort shuffles to dedupe + re-prioritize
  discovered links;
- checkpointed, resumable waves with per-partition lineage + metrics.

Everything here derives from public knowledge only (Ray / Ray Data docs,
Apache Arrow, the reference repo's observable behavior, published papers).
`file:line` citations in docstrings point into ``/root/reference`` so the
semantics can be checked against the reference.
"""

__version__ = "0.1.0"
