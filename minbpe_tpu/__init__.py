"""minbpe_tpu — TPU-native byte-level BPE framework.

Public API mirrors the reference package surface (minbpe/__init__.py:1-4).
"""

from .base import Tokenizer
from .basic import BasicTokenizer
from .regex import RegexTokenizer, GPT2_SPLIT_PATTERN, GPT4_SPLIT_PATTERN
from .utils.precompile import precompile

__all__ = [
    "precompile",
    "Tokenizer",
    "BasicTokenizer",
    "RegexTokenizer",
    "GPT2_SPLIT_PATTERN",
    "GPT4_SPLIT_PATTERN",
]

try:  # GPT4Tokenizer needs the cl100k_base ranks (vendored or tiktoken cache)
    from .gpt4 import GPT4Tokenizer  # noqa: F401
    __all__.append("GPT4Tokenizer")
except ImportError:
    pass
