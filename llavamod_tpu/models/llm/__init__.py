from llavamod_tpu.models.llm.config import DecoderConfig, llm_configs, tiny_config
from llavamod_tpu.models.llm import decoder
