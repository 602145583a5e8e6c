"""Network architectures and the codec model API (layers L1/L3)."""

from .seanet import (  # noqa: F401
    SEANetConfig,
    init_seanet_encoder,
    init_seanet_decoder,
    seanet_encoder,
    seanet_decoder,
)
from .model import (  # noqa: F401
    EncodecModel,
    encodec_model_24khz,
    encodec_model_48khz,
    breathing_model,
    build_model,
    MODELS,
)
from .lm import LMModel, LMConfig, get_lm_model  # noqa: F401
from .streaming import StreamingCodec  # noqa: F401
from .msstftd import MSSTFTConfig, init_msstftd, msstftd_forward  # noqa: F401
