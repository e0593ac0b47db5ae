"""L0 text layer: invertible tokenization and subword vocabularies.

Rebuilds the capability of the reference's ``tokenizer.py`` /
``text_encoder.py`` (tensor2tensor-lineage subword encoder; SURVEY.md §2.1)
as a clean-room implementation of the published algorithm. Pure CPU / pure
Python by design — vocabulary construction is a one-time offline step
(SURVEY.md §3.5), not a TPU problem.
"""

from sse_tpu.text.tokenizer import tokenize, detokenize
from sse_tpu.text.subword import SubwordVocab, PAD_ID, EOS_ID, RESERVED_TOKENS

__all__ = [
    "tokenize",
    "detokenize",
    "SubwordVocab",
    "PAD_ID",
    "EOS_ID",
    "RESERVED_TOKENS",
]
