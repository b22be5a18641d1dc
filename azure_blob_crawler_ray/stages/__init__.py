"""map_batches stages: parse/extract, chunk, embed, assemble, plus the
training-data operators (dedup, similarity, text analysis, media)."""
