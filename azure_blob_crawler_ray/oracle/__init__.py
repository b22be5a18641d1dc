"""Reference-semantics oracle: a small, single-process, pure-Python
reimplementation of the reference pipeline's observable behavior
(extraction, chunking, embedding, id scheme, crawl/frontier simulation).

Golden outputs for every conformance test come from here — never
hand-written (FIXTURES.md F5). The oracle shares the engine's tokenizer,
hash, synthetic web and cuckoo-filter primitives so "engine == oracle
under identical parameters" is well-defined (SURVEY.md §7.4).
"""
