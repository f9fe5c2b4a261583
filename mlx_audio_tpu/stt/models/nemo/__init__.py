"""Shared NeMo-style token alignment utilities.

Parity target: /root/reference/mlx_audio/stt/models/nemo/alignment.py
(AlignedToken/AlignedSentence/AlignedResult containers, sentence
segmentation, and the two overlap-merge strategies used by parakeet /
canary chunked long-audio transcription).

Host-side post-processing only — no device compute. The LCS dynamic
program runs on the small chunk-overlap windows (tens of tokens), so a
NumPy DP table is plenty.
"""

from .alignment import (
    AlignedResult,
    AlignedSentence,
    AlignedToken,
    merge_longest_common_subsequence,
    merge_longest_contiguous,
    sentences_to_result,
    tokens_to_sentences,
)

__all__ = [
    "AlignedToken",
    "AlignedSentence",
    "AlignedResult",
    "tokens_to_sentences",
    "sentences_to_result",
    "merge_longest_contiguous",
    "merge_longest_common_subsequence",
]
