"""Tests: benchmark task adapters, full GQA suite, eval CLI, stop strings."""

import base64
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from llavamod_tpu.eval.gqa_eval import score_gqa_full
from llavamod_tpu.eval.tasks import (
    get_options,
    is_none,
    mmbench_questions,
    mmhal_questions,
    objhal_questions,
    qbench_questions,
    sqa_questions,
)


def _b64_image(color=(200, 10, 10)) -> str:
    img = Image.new("RGB", (16, 16), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


# ---------------------------------------------------------------------------
# MMBench
# ---------------------------------------------------------------------------

def _write_mmbench_tsv(path, n=2, n_options=3):
    cols = ["index", "question", "hint", "image", "A", "B", "C", "D"]
    with open(path, "w") as fh:
        fh.write("\t".join(cols) + "\n")
        for i in range(n):
            row = [str(i), f"What color is object {i}?", "a hint" if i == 0 else "nan",
                   _b64_image(), "red", "green", "blue", "nan"][:len(cols)]
            fh.write("\t".join(row) + "\n")
    return path


def test_mmbench_prompt_construction(tmp_path):
    tsv = _write_mmbench_tsv(str(tmp_path / "q.tsv"))
    qs = mmbench_questions(tsv, all_rounds=False)
    assert len(qs) == 2
    q0 = qs[0]["text"]
    assert q0.startswith("a hint\nWhat color is object 0?")
    assert "\nA. red" in q0 and "\nB. green" in q0 and "\nC. blue" in q0
    assert "D." not in q0  # NaN cuts the option list
    assert q0.endswith("Answer with the option's letter from the given choices directly.")
    assert qs[0]["_pil_image"] is not None
    # row 1 has hint 'nan' -> no prepend
    assert qs[1]["text"].startswith("What color is object 1?")


def test_mmbench_circular_rounds(tmp_path):
    tsv = _write_mmbench_tsv(str(tmp_path / "q.tsv"), n=1)
    qs = mmbench_questions(tsv, all_rounds=True)
    assert len(qs) == 3  # one per option
    assert qs[0]["_extra"]["options"] == ["red", "green", "blue"]
    assert qs[1]["_extra"]["options"] == ["green", "blue", "red"]
    assert qs[2]["_extra"]["options"] == ["blue", "red", "green"]
    assert qs[1]["_extra"]["option_char"] == ["B", "C", "A"]
    assert qs[1]["_extra"]["round_id"] == 1
    # the rendered option letters stay A./B./C. with rotated contents
    assert "\nA. green" in qs[1]["text"]


def test_is_none_and_get_options():
    assert is_none(float("nan")) and is_none("nan") and is_none(None)
    assert not is_none("red")
    row = {"A": "x", "B": float("nan"), "C": "y"}
    assert get_options(row) == ["x"]  # stops at first empty


# ---------------------------------------------------------------------------
# SQA / MMHal / ObjHal / QBench
# ---------------------------------------------------------------------------

def test_sqa_questions(tmp_path):
    data = [{"id": "123", "image": "123/image.png", "conversations": [
        {"from": "human", "value": "<image>\nQuestion: which?\nOptions:\nA. x\nB. y"},
        {"from": "gpt", "value": "The answer is A."}]}]
    p = tmp_path / "sqa.json"
    p.write_text(json.dumps(data))
    qs = sqa_questions(str(p))
    assert qs[0]["question_id"] == "123"
    assert qs[0]["image"] == "123/image.png"
    assert "<image>" not in qs[0]["text"]
    assert qs[0]["text"].endswith("directly.")


def test_mmhal_objhal_qbench(tmp_path):
    mmhal = tmp_path / "mmhal.jsonl"
    mmhal.write_text(json.dumps({
        "question_id": 7, "question": "Is there a dog?", "image_file": "d.jpg",
        "gt_answer": "no", "question_type": "adversarial"}) + "\n")
    qs = mmhal_questions(str(mmhal))
    assert qs[0]["image"] == "d.jpg"
    assert qs[0]["_extra"]["gt_answer"] == "no"

    objhal = tmp_path / "objhal.jsonl"
    objhal.write_text(json.dumps({
        "question_id": 3, "question": "Describe.", "image": _b64_image()}) + "\n")
    qs = objhal_questions(str(objhal))
    assert qs[0]["_pil_image"] is not None

    qbench = tmp_path / "qbench.json"
    qbench.write_text(json.dumps([{
        "img_path": "x.jpg", "question": "How sharp?",
        "candidates": ["very", "meh"], "correct_ans": "very"}]))
    qs = qbench_questions(str(qbench))
    assert "Choose between one of the options" in qs[0]["text"]
    assert "A. very\nB. meh\n" in qs[0]["text"]


# ---------------------------------------------------------------------------
# full GQA suite
# ---------------------------------------------------------------------------

def _gqa_question(qid, answer, structural="query", entailed=(), balanced=True,
                  group="colorQ"):
    return {
        "question": f"what color is thing {qid} ?",
        "answer": answer,
        "isBalanced": balanced,
        "types": {"structural": structural, "semantic": "attr",
                  "detailed": "queryAttr"},
        "groups": {"global": group},
        "entailed": list(entailed),
        "semantic": [{"operation": "select", "argument": "thing"},
                     {"operation": "query", "argument": "color"}],
        "imageId": "img0",
    }


def test_gqa_full_suite_metrics():
    questions = {
        "q1": _gqa_question("q1", "red", entailed=["q2"]),
        "q2": _gqa_question("q2", "yes", structural="verify"),
        "q3": _gqa_question("q3", "blue"),
        "q4": _gqa_question("q4", "green", balanced=False),  # excluded
    }
    predictions = {"q1": "red", "q2": "yes", "q3": "wrong", "q4": "green"}
    choices = {qid: {"valid": ["red", "blue", "yes", "wrong"],
                     "plausible": ["red", "yes"]} for qid in questions}
    out = score_gqa_full(questions, predictions, choices=choices)
    assert out["count"] == 3  # balanced only
    assert out["accuracy"] == pytest.approx(100 * 2 / 3)
    assert out["binary"] == pytest.approx(100.0)      # q2
    assert out["open"] == pytest.approx(50.0)         # q1 right, q3 wrong
    # consistency: q1 correct and entails q2 (also correct) -> 100
    assert out["consistency"] == pytest.approx(100.0)
    assert out["validity"] == pytest.approx(100.0)
    assert out["plausibility"] == pytest.approx(100 * 2 / 3)
    assert out["distribution"] > 0  # q3 mispredicted shifts the histogram
    assert out["accuracyPerStructuralType"]["query"][1] == 2


def test_gqa_full_perfect_distribution():
    questions = {"q1": _gqa_question("q1", "red"),
                 "q2": _gqa_question("q2", "blue")}
    preds = {"q1": "red", "q2": "blue"}
    out = score_gqa_full(questions, preds)
    assert out["accuracy"] == 100.0
    assert out["distribution"] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# eval CLI (merge/convert/score plumbing on fixtures)
# ---------------------------------------------------------------------------

def test_cli_merge_convert_score(tmp_path):
    from llavamod_tpu.eval.cli import main

    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text(json.dumps({"question_id": "g1", "text": "Red."}) + "\n")
    b.write_text(json.dumps({"question_id": "g2", "text": "no"}) + "\n")
    merged = tmp_path / "m.jsonl"
    main(["merge", "--inputs", str(a), str(b), "--output", str(merged)])
    rows = [json.loads(l) for l in open(merged)]
    assert len(rows) == 2

    conv = tmp_path / "gqa_pred.json"
    main(["convert", "--benchmark", "gqa", "--answers", str(merged),
          "--output", str(conv)])
    preds = json.load(open(conv))
    assert {"questionId": "g1", "prediction": "red"} in preds

    qfile = tmp_path / "gqa_questions.json"
    qfile.write_text(json.dumps({
        "g1": _gqa_question("g1", "red"),
        "g2": _gqa_question("g2", "no", structural="verify"),
    }))
    out = tmp_path / "score.json"
    main(["score", "--benchmark", "gqa", "--question-file", str(qfile),
          "--answers", str(conv), "--full", "--output", str(out)])
    scored = json.load(open(out))
    assert scored["accuracy"] == 100.0


# ---------------------------------------------------------------------------
# multi-token stop sequences in generation
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_generation_multi_token_stop():
    import jax

    from llavamod_tpu.generation import GenerationConfig, generate
    from llavamod_tpu.models import llava as llava_mod
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import tiny_config
    from llavamod_tpu.models.vision.vit import tiny_vision_config
    from llavamod_tpu.train.steps import batch_from_arrays

    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu", max_images=1)
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    b, t = 2, 8
    s = cfg.vision.image_size
    batch = batch_from_arrays({
        "input_ids": np.ones((b, t), np.int32),
        "segment_ids": np.ones((b, t), np.int32),
        "image_mask": np.zeros((b, t), bool),
        "image_pos": np.zeros((b, t), np.int32),
        "pixels": np.zeros((b, 1, 3, s, s), np.float32),
        "pixel_valid": np.zeros((b, 1), bool),
        "labels": np.zeros((b, t), np.int32),
    })
    gcfg = GenerationConfig(max_new_tokens=12, pad_token_id=0)
    base = generate(params, cfg, batch, gcfg)
    # device path accepts stop_sequences (greedy tiny models repeat tokens,
    # so just assert it runs and truncates no later than the base output)
    stop = (int(base[0, 1]), int(base[0, 2]))
    gcfg2 = GenerationConfig(max_new_tokens=12, pad_token_id=0,
                             stop_sequences=(stop,))
    out = generate(params, cfg, batch, gcfg2)
    n_out = int(np.sum(out[0] != 0))
    assert n_out <= 1  # stop pair occurs by position 1 at the latest


def test_truncate_at_stops_semantics():
    from llavamod_tpu.generation import GenerationConfig, truncate_at_stops

    gen = np.array([[5, 6, 7, 8, 9, 10],
                    [5, 6, 2, 8, 9, 10]], dtype=np.int32)
    gcfg = GenerationConfig(pad_token_id=0, eos_token_ids=(2,),
                            stop_sequences=((8, 9),))
    out = truncate_at_stops(gen, gcfg)
    # row 0: stop sequence (8,9) at pos 3 -> keep [5,6,7]
    np.testing.assert_array_equal(out[0], [5, 6, 7, 0, 0, 0])
    # row 1: EOS id 2 at pos 2 wins over the later stop pair
    np.testing.assert_array_equal(out[1], [5, 6, 0, 0, 0, 0])


# ---------------------------------------------------------------------------
# VQARunner end-to-end (tiny MoE model) + router-prob dump
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_vqa_runner_end_to_end_with_gating_dump(tmp_path):
    import jax

    from llavamod_tpu.eval.generate import VQARunner
    from llavamod_tpu.mm_utils import ImagePreprocessor
    from llavamod_tpu.models import llava as llava_mod
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import tiny_config
    from llavamod_tpu.models.llm.upcycle import upcycle
    from llavamod_tpu.models.vision.vit import tiny_vision_config

    class Tok:
        bos_token_id = None
        pad_token_id = 0
        eos_token_id = None

        def __call__(self, text):
            class R:
                pass

            r = R()
            r.input_ids = [ord(c) % 500 for c in text]
            return r

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr((int(i) % 80) + 40) for i in ids)

    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu", max_images=1)
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    mcfg, mparams = upcycle(cfg.llm, params["llm"], moe_mode="sparse",
                            num_experts=2, top_k=2)
    cfg = cfg.replace(llm=mcfg)
    params["llm"] = mparams

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.new("RGB", (32, 32), (10 * i, 5, 5)).save(img_dir / f"q{i}.png")
    questions = [{"question_id": i, "text": "what?", "image": f"q{i}.png"}
                 for i in range(3)]

    gating_path = str(tmp_path / "gating.npz")
    runner = VQARunner(params, cfg, Tok(),
                       ImagePreprocessor(size=cfg.vision.image_size),
                       template_name="qwen", batch_size=2,
                       max_prompt_len=256, dump_gating=gating_path)
    from llavamod_tpu.generation import GenerationConfig

    rows = runner.run(questions, str(img_dir), str(tmp_path / "ans.jsonl"),
                      GenerationConfig(max_new_tokens=4, pad_token_id=0))
    assert len(rows) == 3
    assert all(isinstance(r["text"], str) for r in rows)
    data = np.load(gating_path)
    assert set(data.files) >= {"0", "1", "2"}
    l, s, e = data["0"].shape  # [moe_layers, seq, experts]
    assert e == 2 and l == len(cfg.llm.moe_layers)
    np.testing.assert_allclose(data["0"].sum(-1), 1.0, rtol=1e-4)


def test_mme_rows_join_and_score():
    from llavamod_tpu.eval.scorers import mme_rows_from_answers, score_mme

    questions = [
        {"question_id": "OCR/0001.jpg-1", "image": "0001.jpg",
         "category": "OCR", "text": "Is the word 'stop'? ...", "answer": "Yes"},
        {"question_id": "OCR/0001.jpg-2", "image": "0001.jpg",
         "category": "OCR", "text": "Is the word 'go'? ...", "answer": "No"},
    ]
    answers = [
        {"question_id": "OCR/0001.jpg-1", "text": "Yes, it is."},
        {"question_id": "OCR/0001.jpg-2", "text": "no"},
    ]
    rows = mme_rows_from_answers(answers, questions)
    assert len(rows) == 2 and rows[0]["task"] == "OCR"
    out = score_mme(rows)
    assert out["OCR/acc"] == 100.0
    assert out["OCR/acc_plus"] == 100.0  # both questions of the image correct
