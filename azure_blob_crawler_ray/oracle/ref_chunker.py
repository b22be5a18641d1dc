"""Oracle chunker: the reference's TokenAwareChunker semantics, exactly.

Reimplements the observable behavior of ``shared/utils/chunking.py`` in
the reference repo (cited per method below), over our deterministic
tokenizer instead of tiktoken. Quirks preserved on purpose because the
conformance tests depend on them:

- sentence split consumes terminal ``[.!?]+`` punctuation (ref
  chunking.py:187-188) — re-chunked text loses it;
- a chunk that fits is returned UNSTRIPPED as-is (ref :74-76);
- overlap text may be empty, producing a chunk that starts with a space
  until the flush-strip (ref :109-110);
- accumulated token counts drift from recounts of the joined text and
  that drift decides flush boundaries (ref :104, :115);
- ``chunk_pages`` flushes via ``current.replace(page, '').strip()`` in its
  oversized-page branch (ref :159-168).
"""

from __future__ import annotations

import re
from typing import List

from ..config import CHUNK_MAX_TOKENS, EMBEDDING_FALLBACK_TOKEN_RATIO, OVERLAP_TOKENS
from ..tokenizer import Tokenizer

_SENTENCE_END = re.compile(r"[.!?]+(?:\s+|$)")  # ref chunking.py:187


class RefChunker:
    def __init__(self) -> None:
        self.tok = Tokenizer()  # per-instance, like the tiktoken load (ref :29-40)

    def count_tokens(self, text: str) -> int:
        return self.tok.count_tokens(text)  # ref :42-56

    # ---- sentence split (ref :176-192) ----
    def split_sentences(self, text: str) -> List[str]:
        parts = _SENTENCE_END.split(text)
        return [p.strip() for p in parts if p.strip()]

    # ---- overlap suffix (ref :247-271) ----
    def overlap_suffix(self, text: str, overlap_tokens: int) -> str:
        if overlap_tokens <= 0:
            return ""
        words = text.split()
        best = ""
        for i in range(len(words) - 1, -1, -1):
            cand = " ".join(words[i:])
            if self.count_tokens(cand) > overlap_tokens:
                break
            best = cand
        return best

    # ---- char split (ref :227-245) ----
    def split_by_chars(self, text: str, max_tokens: int) -> List[str]:
        width = max_tokens * EMBEDDING_FALLBACK_TOKEN_RATIO
        return [text[i : i + width] for i in range(0, len(text), width)]

    # ---- long-sentence word split (ref :194-225) ----
    def split_long_sentence(self, sentence: str, max_tokens: int) -> List[str]:
        out: List[str] = []
        acc = ""
        for word in sentence.split():
            trial = f"{acc} {word}" if acc else word
            if self.count_tokens(trial) > max_tokens:
                if acc:
                    out.append(acc)
                    acc = word
                else:  # a single word over the cap -> char split (ref :215-218)
                    out.extend(self.split_by_chars(word, max_tokens))
                    acc = ""
            else:
                acc = trial
        if acc:
            out.append(acc)
        return out

    # ---- chunk_text (ref :58-121) ----
    def chunk_text(
        self,
        text: str,
        max_tokens: int = CHUNK_MAX_TOKENS,
        overlap_tokens: int = OVERLAP_TOKENS,
    ) -> List[str]:
        if not text.strip():
            return []
        if self.count_tokens(text) <= max_tokens:
            return [text]  # unmodified, no strip (ref :74-76)

        out: List[str] = []
        acc = ""
        acc_tokens = 0
        for sentence in self.split_sentences(text):
            n = self.count_tokens(sentence)
            if n > max_tokens:  # ref :88-101
                if acc.strip():
                    out.append(acc.strip())
                    acc, acc_tokens = "", 0
                pieces = self.split_long_sentence(sentence, max_tokens)
                out.extend(pieces[:-1])
                acc = pieces[-1] if pieces else ""
                acc_tokens = self.count_tokens(acc)
            elif acc_tokens + n > max_tokens:  # ref :104-111
                if acc.strip():
                    out.append(acc.strip())
                acc = self.overlap_suffix(acc, overlap_tokens) + " " + sentence
                acc_tokens = self.count_tokens(acc)
            else:  # ref :112-115
                acc = f"{acc} {sentence}" if acc else sentence
                acc_tokens += n
        if acc.strip():
            out.append(acc.strip())
        return out

    # ---- chunk_pages (ref :123-174) ----
    def chunk_pages(self, pages: List[str], max_tokens: int = CHUNK_MAX_TOKENS) -> List[str]:
        if not pages:
            return []
        out: List[str] = []
        acc = ""
        acc_tokens = 0
        for page in pages:
            n = self.count_tokens(page)
            if acc and acc_tokens + n > max_tokens:  # ref :146-149
                out.append(acc.strip())
                acc, acc_tokens = page, n
            elif not acc:  # ref :150-153
                acc, acc_tokens = page, n
            else:  # ref :154-157
                acc = f"{acc}\n\n{page}"
                acc_tokens += n
            if n > max_tokens:  # oversized page (ref :159-168)
                if acc != page:
                    out.append(acc.replace(page, "").strip())
                pieces = self.chunk_text(page, max_tokens)
                out.extend(pieces[:-1])
                acc = pieces[-1] if pieces else ""
                acc_tokens = self.count_tokens(acc)
        if acc.strip():
            out.append(acc.strip())
        return out
