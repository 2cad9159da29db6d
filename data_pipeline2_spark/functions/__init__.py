from data_pipeline2_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    query_vector_lit,
)
