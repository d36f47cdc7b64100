from veri_spark.functions.vector import (
    SCORE_FUNCTIONS,
    angular_distance,
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l1_distance,
    score_fn,
)

__all__ = [
    "SCORE_FUNCTIONS",
    "angular_distance",
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "l1_distance",
    "score_fn",
]
