"""Training runtime (layer L6): optax state, pjit train steps, schedulers,
metrics, checkpointing, config system."""

from .config import ConfigNamespace, load_config, config_to_dict  # noqa: F401
from .schedulers import linear_warmup_cosine  # noqa: F401
from .steps import (  # noqa: F401
    TrainState,
    LossWeights,
    create_train_state,
    make_train_steps,
)
from .metrics import Metrics  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
