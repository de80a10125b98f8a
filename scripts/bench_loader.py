"""Host input-pipeline throughput at flagship shapes (VERDICT round-3 #3).

The device consumes ~2.3 microbatches/s at the record recipe (4 733
tok/s/chip over B=1 x T=2048 microbatches, BENCH_NOTES round-8); the host
loader must beat that with margin or it becomes the bottleneck no TPU
optimization can hide.  This bench drives the REAL path — JSON dataset ->
conversation template -> tokenizer -> JPEG decode -> CLIP preprocess ->
static-shape collator -> fold_microbatches — over synthetic 640x480 JPEGs,
and sweeps the thread count (the loader replaces the reference's 8 worker
PROCESSES, pretrain.sh:55, with a thread pool on the grounds that PIL and
numpy release the GIL).

Run on any host (no TPU needed):
    python scripts/bench_loader.py [--samples 512] [--batches 96]

Prints one JSON line per config; paste the table into BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(root: str, n: int, img_side=(640, 480)) -> str:
    """n samples: a JPEG each + conversations JSON (reference data layout:
    LazySupervisedDataset JSON list with 'image' + 'conversations')."""
    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    w, h = img_side
    # realistic JPEG complexity: smooth gradient + moderate noise (pure
    # noise JPEGs decode unrealistically slowly, flat ones trivially)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // w).astype(np.uint8)
    for i in range(n):
        arr = np.stack([
            base,
            np.roll(base, i * 7, axis=1),
            (yy * 255 // h).astype(np.uint8)], -1)
        arr = np.clip(arr.astype(np.int16)
                      + rng.randint(-20, 20, arr.shape), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(
            os.path.join(img_dir, f"{i}.jpg"), quality=85)
    recs = []
    words = ["describe", "the", "scene", "in", "detail", "object", "color",
             "texture", "relation", "count", "left", "right", "image"]
    for i in range(n):
        ans = " ".join(rng.choice(words, size=rng.randint(80, 320)))
        recs.append({
            "id": str(i), "image": f"{i}.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nDescribe this image "
                                           "in detail."},
                {"from": "gpt", "value": ans}]})
    data_path = os.path.join(root, "data.json")
    with open(data_path, "w") as fh:
        json.dump(recs, fh)
    return data_path, img_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--batches", type=int, default=96,
                    help="microbatches to time per config")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--workers", type=str, default="0,2,8,16")
    args = ap.parse_args()

    from tests.util_tokenizer import make_tiny_tokenizer
    from transformers import AutoTokenizer

    from llavamod_tpu.data.collator import SupervisedCollator
    from llavamod_tpu.data.dataset import SupervisedJsonDataset
    from llavamod_tpu.models.builder import make_image_preprocessor
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import QWEN1_5_1_8B
    from llavamod_tpu.models.vision.vit import CLIP_VIT_L_336
    from llavamod_tpu.train.loader import DataLoader, fold_microbatches, \
        infinite_batches

    tmp = tempfile.mkdtemp(prefix="loaderbench_")
    data_path, img_dir = make_corpus(tmp, args.samples)
    tok_dir = make_tiny_tokenizer(os.path.join(tmp, "tok"))
    tokenizer = AutoTokenizer.from_pretrained(tok_dir)

    cfg = LlavaConfig(llm=QWEN1_5_1_8B, vision=CLIP_VIT_L_336,
                      projector_type="mlp2x_gelu", max_images=1)
    dataset = SupervisedJsonDataset(
        [data_path], tokenizer, make_image_preprocessor(cfg),
        image_folder=img_dir, template_name="qwen",
        model_max_length=args.seq)
    collator = SupervisedCollator(
        max_len=args.seq, num_image_tokens=cfg.num_image_tokens,
        image_size=cfg.vision.image_size, max_images=1,
        pad_id=tokenizer.pad_token_id or 0)

    rows = cfg.max_images * cfg.num_image_tokens
    device_mb_per_s = 4733.0 / args.seq  # record-recipe device consumption
    for nw in [int(x) for x in args.workers.split(",")]:
        loader = DataLoader(dataset, args.batch_size, collator,
                            num_workers=nw, prefetch=max(4, 2 * nw))
        stream = fold_microbatches(infinite_batches(loader), args.accum,
                                   rows_per_sample=rows)
        next(stream)  # warm caches / thread pool
        n_folds = max(1, args.batches // args.accum)
        t0 = time.time()
        for _ in range(n_folds):
            batch = next(stream)
        elapsed = time.time() - t0
        mb = n_folds * args.accum
        mb_per_s = mb / elapsed
        tok_per_s = mb_per_s * args.batch_size * args.seq
        print(json.dumps({
            "metric": "host_loader_microbatches_per_sec",
            "workers": nw,
            "value": round(mb_per_s, 2),
            "tokens_per_sec": round(tok_per_s, 1),
            "margin_over_device": round(mb_per_s / device_mb_per_s, 2),
            "unit": f"microbatches/s (B={args.batch_size} T={args.seq} "
                    f"jpeg 640x480, fold x{args.accum})",
        }))
        assert batch["input_ids"].shape == (args.batch_size * args.accum,
                                            args.seq)


if __name__ == "__main__":
    main()
