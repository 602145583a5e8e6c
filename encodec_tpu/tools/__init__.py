"""User tools (layer L7): batch token extraction, diagnostics, benchmarks."""

from .inference import (  # noqa: F401
    extract_codes,
    process_dataset,
    code_distribution,
    decode_most_frequent,
)
from .visualize import (  # noqa: F401
    reconstruction_figure,
    hierarchy_ablation,
)
