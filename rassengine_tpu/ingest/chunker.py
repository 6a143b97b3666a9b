"""Text chunking for embedding.

Reference behavior (app/main.py:2156-2170): whitespace-split, fixed
``CHUNK_SIZE`` words per chunk, no overlap. The reference also defines an
``ADAPTIVE_CHUNKING`` flag that is never read (SURVEY §2 C9 dead flag); here it
is implemented for real: short texts stay whole and the tail chunk is merged
into its predecessor when it would be tiny, which avoids fragmenting FHIR
narratives into sub-sentence chunks that embed poorly.
"""

from __future__ import annotations


def chunk_text(text: str, chunk_size: int = 512, *, adaptive: bool = False,
               overlap: int = 0) -> list[str]:
    """Split ``text`` into chunks of ≤ ``chunk_size`` whitespace words.

    overlap: number of words repeated between consecutive chunks (0 = reference
    behavior).
    """
    words = (text or "").split()
    if not words:
        return []
    if len(words) <= chunk_size:
        return [" ".join(words)]
    step = max(1, chunk_size - max(0, overlap))
    chunks = [words[i : i + chunk_size] for i in range(0, len(words), step)]
    # with overlap, the final window can be a pure suffix of the previous one
    while len(chunks) >= 2 and len(chunks[-1]) <= max(0, overlap):
        chunks.pop()
    # adaptive: merge a tiny tail chunk (<25% of chunk_size) into its predecessor
    if adaptive and len(chunks) >= 2 and len(chunks[-1]) < chunk_size // 4 and overlap == 0:
        tail = chunks.pop()
        chunks[-1] = chunks[-1] + tail
    return [" ".join(c) for c in chunks]
