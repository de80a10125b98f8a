"""Interactive multimodal chat CLI.

Mirror of the reference's `serve/cli.py:26-123` user experience (load model,
infer conversation template from the name, one image, chat loop, streaming
print), on the TPU-native stack: one jitted prefill + jitted decode loop with
a KV cache — no deepspeed launcher needed (reference docs/INFERENCE.md:6-9
requires `deepspeed llavamod/serve/cli.py ...`).

Usage:
  python -m llavamod_tpu.serve.cli --model-path <dir> --image-file <img>
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_image(image_file: str):
    from PIL import Image

    if image_file.startswith(("http://", "https://")):
        raise RuntimeError("zero-egress environment: use a local image path")
    return Image.open(image_file).convert("RGB")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--model-base", default=None)
    ap.add_argument("--image-file", required=True)
    ap.add_argument("--conv-mode", default=None)
    ap.add_argument("--temperature", type=float, default=0.2)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--stream-chunk", type=int, default=8,
                    help="tokens decoded per jitted chunk between prints "
                         "(0 = print only the full reply)")
    ap.add_argument("--quant", default="", choices=["", "int8"],
                    help="int8 = W8A8 serving (TPU answer to the "
                         "reference's --load-8bit)")
    ap.add_argument("--kv-cache-dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8"])
    args = ap.parse_args()

    from llavamod_tpu import conversation as conv_lib
    from llavamod_tpu.constants import DEFAULT_IMAGE_TOKEN
    from llavamod_tpu.eval.generate import VQARunner
    from llavamod_tpu.generation import (GenerationConfig, decode_texts,
                                         generate, generate_stream,
                                         truncate_at_stops)
    from llavamod_tpu.models.builder import load_pretrained_model

    tokenizer, params, cfg, pp, _ = load_pretrained_model(
        args.model_path, args.model_base)
    if args.quant == "int8":
        from llavamod_tpu.models.builder import quantize_for_serving

        params = quantize_for_serving(params, cfg)
        print("[load] int8-W8A8 serving quantization applied")
    template = args.conv_mode or conv_lib.infer_template_name(args.model_path)
    print(f"[conv template: {template}]")

    conv = conv_lib.get_template(template)
    image = load_image(args.image_file)
    pixels = pp(image)
    runner = VQARunner(params, cfg, tokenizer, pp, template_name=template,
                       batch_size=1)
    eos_ids, stop_seqs = runner.stopping(())
    gcfg = GenerationConfig(
        max_new_tokens=args.max_new_tokens, temperature=args.temperature,
        eos_token_ids=eos_ids, stop_sequences=stop_seqs,
        pad_token_id=tokenizer.pad_token_id or 0,
        cache_dtype=args.kv_cache_dtype)

    first_turn = True
    while True:
        try:
            user = input(f"{conv.roles[0]}: ")
        except EOFError:
            break
        if not user:
            break
        if first_turn:
            user = DEFAULT_IMAGE_TOKEN + "\n" + user
            first_turn = False
        conv.append(conv.roles[0], user)
        conv.append(conv.roles[1], None)
        prompt = conv.render()

        batch = runner._encode_batch([prompt], [pixels])
        if args.stream_chunk <= 0:
            gen_ids = generate(params, cfg, batch, gcfg)
            text = decode_texts(tokenizer, gen_ids,
                                pad_token_id=gcfg.pad_token_id)[0].strip()
            print(f"{conv.roles[1]}: {text}")
        else:
            # Streaming decode (TextStreamer parity, reference
            # serve/cli.py:99-108): print incrementally per jitted chunk.
            # Hold back `win` trailing tokens (the longest stop string)
            # so a stop sequence is never partially printed; the held-back
            # tail is printed after final stop-truncation.
            win = max([len(s) for s in gcfg.stop_sequences], default=0)
            print(f"{conv.roles[1]}: ", end="", flush=True)
            chunks = []
            printed = ""
            for toks in generate_stream(params, cfg, batch, gcfg,
                                        chunk=args.stream_chunk):
                chunks.append(toks)
                ids = np.concatenate(chunks, axis=1)
                visible = ids[:, :max(ids.shape[1] - win, 0)]
                cur = decode_texts(tokenizer, visible,
                                   pad_token_id=gcfg.pad_token_id)[0]
                if cur.startswith(printed):
                    print(cur[len(printed):], end="", flush=True)
                    printed = cur
            gen_ids = truncate_at_stops(np.concatenate(chunks, axis=1), gcfg)
            full = decode_texts(tokenizer, gen_ids,
                                pad_token_id=gcfg.pad_token_id)[0]
            # remainder beyond what was streamed (held-back stop window)
            if full.startswith(printed):
                print(full[len(printed):], flush=True)
            else:
                # rare BPE boundary mismatch: reprint the clean final text
                print(f"\n[full reply] {full.strip()}")
            text = full.strip()
        conv.messages[-1][1] = text


if __name__ == "__main__":
    main()
