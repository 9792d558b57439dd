from .fad import (  # noqa: F401
    CLAPEmbedder,
    embedding_stats,
    fad_between,
    frechet_distance,
)
