from .analyzer import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    TOKEN_REGEX,
    standard_tokenize,
    token_array,
    tokens_with_positions,
    doc_length_col,
    tokenize_fidelity_udf,
)
