"""Embed stage (O14/S11): batched deterministic embeddings as an
actor-pool ``map_batches`` — the embedder (tokenizer + hash state) is
per-actor state, the analogue of the reference's OpenAI client singleton
(ref shared/processing/document_processor.py:38-106, T3) with the
reference's truncation + zero-vector-fallback semantics preserved
(ref :190-205) via ``functions/embed.py``.

The reference makes ONE HTTP call per chunk under a Semaphore(3)
(ref :226-240); here a whole Arrow batch is embedded in one vectorized
call — batch size × pool concurrency replace the semaphore.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import EMBEDDING_MAX_TOKENS
from ..functions.embed import embed_batch
from ..tokenizer import Tokenizer


class EmbedStage:
    def __init__(self, dim: int, text_col: str = "content", max_tokens: int = EMBEDDING_MAX_TOKENS):
        self.dim = dim
        self.text_col = text_col
        self.max_tokens = max_tokens
        self.tok = Tokenizer()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        # chunk batches carry exact token counts (the chunk stage output
        # column) — rows provably under the cap skip the truncation rescan
        counts = (
            batch["token_count"].to_pylist()
            if self.text_col == "content" and "token_count" in batch.column_names
            else None
        )
        mat = embed_batch(texts, dim=self.dim, tok=self.tok, max_tokens=self.max_tokens, counts=counts)
        vecs = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel(), type=pa.float32()), self.dim)
        return batch.append_column("vector", vecs)
