"""Serving-throughput datapoint: the dynamic-batching engine on one chip.

Measures requests/s through serve/server.py's BatchingEngine (queue ->
power-of-two batch buckets -> batched cached decode) with the 2B-activated
MoE student in int8-W8A8 serving form — the production shape of the
serving stack, one level above bench.py's raw images/s decode number.

Usage:  python scripts/bench_server.py   (runs on the default jax device)
Env:    SRV_REQUESTS (default 64), SRV_MAX_BATCH (16), SRV_NEW_TOKENS (64),
        SRV_PROMPT_LEN (640), SRV_QUANT (int8|'' default int8)
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from llavamod_tpu.eval.generate import VQARunner
    from llavamod_tpu.models import llava
    from llavamod_tpu.models.builder import make_image_preprocessor
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm import decoder
    from llavamod_tpu.models.llm.config import QWEN1_5_1_8B
    from llavamod_tpu.models.llm.upcycle import upcycle
    from llavamod_tpu.models.vision.vit import CLIP_VIT_L_336
    from llavamod_tpu.serve.server import BatchingEngine

    n_req = int(os.environ.get("SRV_REQUESTS", "64"))
    max_batch = int(os.environ.get("SRV_MAX_BATCH", "16"))
    new_tokens = int(os.environ.get("SRV_NEW_TOKENS", "64"))
    prompt_len = int(os.environ.get("SRV_PROMPT_LEN", "640"))
    quant = os.environ.get("SRV_QUANT", "int8")

    print(f"devices: {jax.devices()}", file=sys.stderr)
    llm = QWEN1_5_1_8B.replace(scan_layers=True)
    cfg = LlavaConfig(llm=llm, vision=CLIP_VIT_L_336,
                      projector_type="mlp2x_gelu", max_images=1)
    params = llava.init(cfg, jax.random.PRNGKey(0), dtype="bfloat16")
    mcfg, mparams = upcycle(cfg.llm, params["llm"], moe_mode="sparse",
                            num_experts=4, top_k=2, capacity_factor=1.5,
                            eval_capacity_factor=2.0)
    cfg = cfg.replace(llm=mcfg)
    params["llm"] = mparams
    if quant == "int8":
        params["llm"] = decoder.quantize_decoder_int8(
            params["llm"], include_lm_head=True, include_experts=True)
        print("int8-W8A8 serving quantization applied", file=sys.stderr)
    # no stack_layers: the cached decode path consumes per-layer trees

    class _Tok:  # synthetic ids in/out — tokenization is not the subject
        pad_token_id = 0
        eos_token_id = None

        def __call__(self, text):
            import types

            rng = np.random.RandomState(abs(hash(text)) % 2**31)
            n = min(prompt_len - cfg.num_image_tokens - 1, 64)
            return types.SimpleNamespace(
                input_ids=rng.randint(10, 1000, n).tolist())

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    runner = VQARunner(params=params, cfg=cfg, tokenizer=_Tok(),
                       image_preprocessor=make_image_preprocessor(cfg),
                       template_name="qwen", max_prompt_len=prompt_len)
    engine = BatchingEngine(runner, max_batch=max_batch,
                            batch_window=0.05,
                            default_max_new=new_tokens)

    img = np.zeros((1, 3, cfg.vision.image_size, cfg.vision.image_size),
                   np.float32)

    def fire(i, out):
        out[i] = engine.submit(f"<image>\nquestion {i}?", img, new_tokens,
                               timeout=1200)

    # warmup: compile the bucket programs (full bucket + a size-1)
    print("compiling bucket programs (warmup)...", file=sys.stderr)
    t0 = time.time()
    warm = [None] * max_batch
    ths = [threading.Thread(target=fire, args=(i, warm))
           for i in range(max_batch)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    engine.submit("<image>\nwarm solo", img, new_tokens, timeout=1200)
    print(f"warmup {time.time() - t0:.1f}s", file=sys.stderr)

    results = [None] * n_req
    t0 = time.time()
    threads = [threading.Thread(target=fire, args=(i, results))
               for i in range(n_req)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - t0
    assert all(r is not None for r in results)
    rps = n_req / elapsed
    tok_s = sum(r["usage"]["completion_tokens"] for r in results) / elapsed
    stats = engine.stats
    engine.shutdown()
    print(f"{n_req} requests in {elapsed:.2f}s; batches={stats['batches']} "
          f"hist={stats['bucket_hist']}", file=sys.stderr)
    print(json.dumps({
        "metric": "serve_requests_per_sec_batched",
        "value": round(rps, 2),
        "unit": f"requests/s (2B-activated MoE student{' int8-W8A8' if quant else ''}, "
                f"prompt {prompt_len}, {new_tokens} new tokens, "
                f"max_batch {max_batch}, dynamic batching engine)",
        "tokens_per_sec": round(tok_s, 1),
    }))


if __name__ == "__main__":
    main()
