"""Stateful engine components: the sharded cuckoo-filter URL-seen set,
per-host politeness scheduler actors, and checkpoint/lineage handling
(T5/T6 in SURVEY.md §2.3 — absent in the reference, required by the
north rule)."""
