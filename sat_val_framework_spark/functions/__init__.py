from sat_val_framework_spark.functions import (
    asof,
    bloom,
    dedup,
    multimodal,
    packing,
    sampling,
    similarity,
    sketch,
    text,
)

__all__ = [
    "bloom",
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "asof",
    "sketch",
    "sampling",
    "packing",
]
