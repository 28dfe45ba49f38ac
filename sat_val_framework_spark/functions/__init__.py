from sat_val_framework_spark.functions import (
    asof,
    dedup,
    multimodal,
    packing,
    sampling,
    similarity,
    sketch,
    text,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "asof",
    "sketch",
    "sampling",
    "packing",
]
