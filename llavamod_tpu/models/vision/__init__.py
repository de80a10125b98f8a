from llavamod_tpu.models.vision.vit import (
    VisionConfig,
    vision_configs,
    tiny_vision_config,
)
from llavamod_tpu.models.vision import vit
