from llavamod_tpu.interop.hf import (
    decoder_params_from_hf,
    decoder_params_to_hf,
    vision_params_from_hf,
    projector_params_from_hf,
    decoder_config_from_hf,
)
