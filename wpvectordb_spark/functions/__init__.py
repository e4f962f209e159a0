from wpvectordb_spark.functions.kernels import (
    magnitude,
    normalize,
    sign_bits,
    sign_code,
    hamming,
    dot,
    cosine_similarity,
    code_to_hex,
)

__all__ = [
    "magnitude",
    "normalize",
    "sign_bits",
    "sign_code",
    "hamming",
    "dot",
    "cosine_similarity",
    "code_to_hex",
]
