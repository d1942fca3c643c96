from .tokenizer import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    StandardAnalyzer,
    analyze_batch,
    analyze_with_positions,
)
