from .norms import (  # noqa: F401
    float_to_byte315,
    byte315_to_float,
    encode_norm,
    decode_norm_doclen,
    NORM_DOCLEN_TABLE,
    quantized_doclen_sql,
)
