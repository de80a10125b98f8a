"""Preference-distillation (DPO/KTO-pair) entry point.

Mirror of the reference `llavamod/train/dpo_train.py:543-556` driver:
    python -m llavamod_tpu.train.dpo_train \
        --policy_model_name_or_path <student> --ref_model_name_or_path <teacher> \
        --loss_type kto_pair --data_path rlaif_pairs.json --output_dir ...
"""

from llavamod_tpu.train.run import main

if __name__ == "__main__":
    main(stage="dpo")
