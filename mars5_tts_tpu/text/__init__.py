from .minbpe import (CodebookTokenizer, GPT4_SPLIT_PATTERN, RegexTokenizer,
                     Tokenizer, render_token)

__all__ = [
    "CodebookTokenizer",
    "GPT4_SPLIT_PATTERN",
    "RegexTokenizer",
    "Tokenizer",
    "render_token",
]
