"""FastChunker — semantics-identical optimized twin of the conformance
oracle ``oracle/ref_chunker.RefChunker`` (the reference's
TokenAwareChunker, ref shared/utils/chunking.py:58-174).

The oracle recounts tokens of growing strings inside its accumulation
loops (exactly as the reference does), which is quadratic in sentence /
overlap length. This twin produces byte-identical chunks in linear time
by exploiting two properties of the shared tokenizer (tokenizer.py):

1. **Additivity across a space join.** No token alternative can span
   whitespace, and every alternative absorbs the whitespace *before* it
   (pattern ``\\s*(unit)``), so for non-empty, whitespace-free ``a``/``b``:
   ``count(a + " " + b) == count(a) + count(b)`` and
   ``count(" " + a) == count(a)``. All of the oracle's recounts of
   space-joined accumulations (``split_long_sentence`` trials,
   ``overlap_suffix`` candidates, the post-overlap accumulator) are
   therefore cumulative sums of per-word / per-sentence counts computed
   once.
2. **One char >= one token.** Every token is at least one character, so
   ``len(text) <= max_tokens`` proves a document fits in a single chunk
   with zero tokenizer work — the dominant case at the default
   CHUNK_MAX_TOKENS=4000 over web documents.

``tests/test_chunker_fast.py`` holds the equality proof: hypothesis
property tests plus corpus equality against RefChunker on the synthetic
document tables. The oracle stays untouched — it IS the spec; this
module is the engine's production chunker (stages/chunk.py).
"""

from __future__ import annotations

from typing import List, Tuple

from ..config import CHUNK_MAX_TOKENS, EMBEDDING_FALLBACK_TOKEN_RATIO, OVERLAP_TOKENS
from ..oracle.ref_chunker import _SENTENCE_END
from ..tokenizer import Tokenizer, fast_token_count


class FastChunker:
    def __init__(self) -> None:
        self.tok = Tokenizer()  # per-actor state, like the tiktoken load
        # exact vectorized twin of Tokenizer.count_tokens (equality
        # hypothesis+corpus-tested in tests/test_fast_token_count.py)
        self.count_tokens = fast_token_count

    def split_sentences(self, text: str) -> List[str]:
        parts = _SENTENCE_END.split(text)
        return [p.strip() for p in parts if p.strip()]

    def split_by_chars(self, text: str, max_tokens: int) -> List[str]:
        width = max_tokens * EMBEDDING_FALLBACK_TOKEN_RATIO
        return [text[i : i + width] for i in range(0, len(text), width)]

    # ---- overlap suffix (oracle ref_chunker.py:43-53), linear ----
    def overlap_suffix_n(self, text: str, overlap_tokens: int) -> Tuple[str, int]:
        """(suffix, token count). The oracle scans candidate suffixes
        ``" ".join(words[i:])`` from the end, recounting each: by
        additivity that count is the suffix sum of per-word counts, so
        one backwards pass with a running total is exact."""
        if overlap_tokens <= 0:
            return "", 0
        words = text.split()
        count = self.count_tokens
        total = 0
        i = len(words)
        while i > 0:
            c = count(words[i - 1])
            if total + c > overlap_tokens:
                break
            total += c
            i -= 1
        if i == len(words):
            return "", 0
        return " ".join(words[i:]), total

    def overlap_suffix(self, text: str, overlap_tokens: int) -> str:
        return self.overlap_suffix_n(text, overlap_tokens)[0]

    # ---- long-sentence word split (oracle :61-77), linear ----
    def split_long_sentence_n(
        self, sentence: str, max_tokens: int
    ) -> Tuple[List[str], int]:
        """(pieces, token count of the last piece). The oracle's trial
        string ``acc + " " + word`` has count ``acc_n + count(word)`` by
        additivity — per-word counts once, cumulative accumulator."""
        count = self.count_tokens
        out: List[str] = []
        acc_words: List[str] = []
        acc_n = 0
        last_is_chars = False
        for word in sentence.split():
            cw = count(word)
            if acc_n + cw > max_tokens:
                if acc_words:
                    out.append(" ".join(acc_words))
                    acc_words, acc_n = [word], cw
                    last_is_chars = False
                else:  # single word over the cap -> char split (oracle :70-72)
                    out.extend(self.split_by_chars(word, max_tokens))
                    acc_words, acc_n = [], 0
                    last_is_chars = True
            else:
                acc_words.append(word)
                acc_n += cw
                last_is_chars = False
        if acc_words:
            out.append(" ".join(acc_words))
            return out, acc_n
        if out and last_is_chars:
            return out, count(out[-1])
        return out, acc_n if not out else count(out[-1])

    def split_long_sentence(self, sentence: str, max_tokens: int) -> List[str]:
        return self.split_long_sentence_n(sentence, max_tokens)[0]

    # ---- chunk_text (oracle :80-114) ----
    def chunk_text(
        self,
        text: str,
        max_tokens: int = CHUNK_MAX_TOKENS,
        overlap_tokens: int = OVERLAP_TOKENS,
    ) -> List[str]:
        if not text.strip():
            return []
        count = self.count_tokens
        # every token is >= 1 char: len <= cap proves a single chunk
        if len(text) <= max_tokens or count(text) <= max_tokens:
            return [text]

        out: List[str] = []
        acc = ""
        acc_tokens = 0
        for sentence in self.split_sentences(text):
            n = count(sentence)
            if n > max_tokens:
                if acc.strip():
                    out.append(acc.strip())
                    acc, acc_tokens = "", 0
                pieces, last_n = self.split_long_sentence_n(sentence, max_tokens)
                out.extend(pieces[:-1])
                acc = pieces[-1] if pieces else ""
                acc_tokens = last_n if pieces else 0
            elif acc_tokens + n > max_tokens:
                if acc.strip():
                    out.append(acc.strip())
                ov, ov_n = self.overlap_suffix_n(acc, overlap_tokens)
                acc = ov + " " + sentence
                # count(ov + " " + s) == ov_n + n; count(" " + s) == n
                acc_tokens = ov_n + n
            else:
                acc = f"{acc} {sentence}" if acc else sentence
                acc_tokens += n
        if acc.strip():
            out.append(acc.strip())
        return out

    # ---- chunk_pages (oracle :117-142) ----
    def chunk_pages(
        self, pages: List[str], max_tokens: int = CHUNK_MAX_TOKENS
    ) -> List[str]:
        if not pages:
            return []
        count = self.count_tokens
        out: List[str] = []
        acc = ""
        acc_tokens = 0
        for page in pages:
            # exact n is consumed only while n <= max_tokens (an oversized
            # page resets the accumulator below); len(page) <= cap proves
            # n <= cap, sparing the recount on short pages entirely is
            # NOT possible (n feeds acc_tokens drift), but the oversize
            # comparison itself never needs the exact large value.
            n = count(page)
            if acc and acc_tokens + n > max_tokens:
                out.append(acc.strip())
                acc, acc_tokens = page, n
            elif not acc:
                acc, acc_tokens = page, n
            else:
                acc = f"{acc}\n\n{page}"
                acc_tokens += n
            if n > max_tokens:  # oversized page (oracle :133-139)
                if acc != page:
                    out.append(acc.replace(page, "").strip())
                pieces = self.chunk_text(page, max_tokens)
                out.extend(pieces[:-1])
                acc = pieces[-1] if pieces else ""
                acc_tokens = count(acc)
        if acc.strip():
            out.append(acc.strip())
        return out
