"""Stage-1 pretrain / SFT / MoE-SFT entry point.

Mirror of the reference `llavamod/train/train.py:19` driver:
    python -m llavamod_tpu.train.train --model_name_or_path ... \
        --data_path ... --tune_mm_mlp_adapter true --output_dir ...
Set --moe_enable true --moe_finetune false for MoE-SFT upcycling.
"""

from llavamod_tpu.train.run import main

if __name__ == "__main__":
    main(stage="pretrain")
