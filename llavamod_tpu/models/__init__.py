from llavamod_tpu.models.llm.config import DecoderConfig, llm_configs
from llavamod_tpu.models.vision.vit import VisionConfig, vision_configs
from llavamod_tpu.models.projector import build_projector
from llavamod_tpu.models.llava import LlavaConfig, MultimodalBatch
