from llavamod_tpu.data.splice import expand_image_tokens, SplicedSample
from llavamod_tpu.data.preprocess import (
    preprocess_conversations,
    preprocess_plain,
    preprocess_two_style,
    preprocess_multimodal_text,
)
from llavamod_tpu.data.collator import (
    SupervisedCollator,
    DPOCollator,
)
from llavamod_tpu.data.dataset import (
    SupervisedJsonDataset,
    PreferenceJsonDataset,
)
