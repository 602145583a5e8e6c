"""Utility subpackage: weight conversion, audio IO, overlap-add."""

from .convert import (  # noqa: F401
    conv1d_params_from_torch,
    conv_transpose1d_params_from_torch,
    lstm_params_from_torch,
    linear_from_torch,
)


def honor_platform_env() -> None:
    """Honor ``JAX_PLATFORMS=cpu`` even when a sitecustomize pre-registered
    a TPU plugin (the env var alone is not reliably applied after
    interpreter start). Call at the top of every CLI ``main()``."""
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
