"""Tests for the LLM-judge machinery (stubbed completion function)."""

import pytest

from llavamod_tpu.eval.gpt_judge import (
    build_mmhal_prompt,
    build_review_content,
    compute_chair,
    load_rules,
    parse_mmhal_rating,
    parse_object_list,
    parse_score_pair,
    review_answers,
    summarize_mmhal,
    summarize_reviews,
)


def test_rules_load_and_review_prompt():
    rules = load_rules()
    assert "default" in rules and "prompt" in rules["default"]
    q = {"question_id": 1, "text": "What is shown?", "category": "detail"}
    a1 = {"answer_id": "a", "text": "a cat"}
    a2 = {"answer_id": "b", "text": "a dog"}
    content = build_review_content(q, a1, a2, rules["detail"])
    assert "[Question]\nWhat is shown?" in content
    assert "a cat" in content and "a dog" in content
    assert rules["detail"]["prompt"] in content


def test_parse_score_pair():
    assert parse_score_pair("8 9\ngood answers") == [8.0, 9.0]
    assert parse_score_pair("7, 6.5\nfoo") == [7.0, 6.5]
    assert parse_score_pair("no scores here") == [-1.0, -1.0]


def test_review_and_summarize_pipeline():
    qs = [{"question_id": i, "text": f"q{i}",
           "category": "conv" if i % 2 else "detail"} for i in range(4)]
    a1 = [{"answer_id": f"x{i}", "text": "ans1"} for i in range(4)]
    a2 = [{"answer_id": f"y{i}", "text": "ans2"} for i in range(4)]
    rows = review_answers(qs, a1, a2, complete_fn=lambda c: "8 6\nreasoning")
    assert len(rows) == 4 and rows[0]["tuple"] == [8.0, 6.0]
    summary = summarize_reviews(rows)
    assert summary["all"]["relative"] == 75.0
    assert summary["all"]["score1"] == 80.0
    assert set(summary) == {"all", "conv", "detail"}


def test_mmhal_prompt_and_rating():
    record = {"image_content": ["Tree", "Dog"], "question": "What animal?",
              "gt_answer": "a dog", "model_answer": "a dog under a tree"}
    prompt = build_mmhal_prompt(record)
    assert "Tree, Dog" in prompt and "a dog under a tree" in prompt
    assert "Rating: 6" in prompt  # rubric enumerates the scale
    assert parse_mmhal_rating("some analysis...\nRating: 5, very informative") == 5
    assert parse_mmhal_rating("Rating: 2 ... rating: 4") == 0  # ambiguous


def test_summarize_mmhal():
    scores = [6, 5, 1, 0, 4, 3, 2, 6] * 2
    out = summarize_mmhal(scores)
    assert out["average_score"] == pytest.approx(3.38, abs=0.01)
    # ratings < 3 are hallucinations: 1,0,2 per cycle -> 6/16
    assert out["hallucination_rate"] == pytest.approx(0.38, abs=0.01)
    assert len(out["scores_per_type"]) == 8


def test_chair_metrics():
    records = [
        {"pred_objects": ["dog", "frisbee"], "gt_objects": ["dog", "person"]},
        {"pred_objects": ["car"], "gt_objects": ["car", "road"]},
        {"pred_objects": [], "gt_objects": ["cat"]},
    ]
    out = compute_chair(records)
    assert out["CHAIRs"] == pytest.approx(1 / 3)   # only caption 0 hallucinates
    assert out["CHAIRi"] == pytest.approx(1 / 3)   # 1 bad / 3 mentions
    assert out["records"][0]["hallucinated"] == ["frisbee"]


def test_parse_object_list():
    assert parse_object_list('["Dog", "Tree"]') == ["dog", "tree"]
    assert parse_object_list("objects: dog, tree , car") == ["dog", "tree", "car"]
    assert parse_object_list("") == []


def test_qa_baseline_threaded_generation():
    """qa_baseline (reference qa_baseline_gpt35.py): per-question completion,
    retry-to-sentinel on failure, question_id-sorted output."""
    from llavamod_tpu.eval.gpt_judge import qa_baseline

    calls = {}

    def complete(text):
        calls[text] = calls.get(text, 0) + 1
        if "boom" in text:
            raise RuntimeError("api down")
        return f"answer to: {text}"

    questions = [{"question_id": i, "text": f"q{i}"} for i in (3, 1, 2)]
    questions.append({"question_id": 0, "text": "boom"})
    rows = qa_baseline(questions, complete, max_workers=2, retries=2)
    assert [r["question_id"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["text"] == "#ERROR#"
    assert calls["boom"] == 2  # retried
    assert rows[1]["text"] == "answer to: q1"
    assert all(r["model_id"] for r in rows)


def test_review_variants_context_blocks():
    """bench/visual review variants (eval_gpt_review_bench/visual.py):
    [Context] block content and category naming."""
    from llavamod_tpu.eval.gpt_judge import review_answers, review_context

    q = {"question_id": 1, "text": "what?", "image": "img.jpg",
         "category": "conv"}
    contexts = {"img.jpg": {
        "caption": ["a cat", "on a mat"],
        "captions": ["a cat", "on a mat"],
        "instances": [{"category": "cat", "bbox": [1, 2, 3, 4]}],
    }}
    ctx, cat = review_context(q, contexts, "bench")
    assert ctx == "a cat\non a mat" and cat == "llava_bench_conv"
    ctx, cat = review_context(q, contexts, "visual")
    assert ctx == "a cat\non a mat\n\ncat: [1, 2, 3, 4]" and cat == "conv"
    ctx, cat = review_context(q, contexts, "default")
    assert ctx is None and cat == "conv"

    seen = []

    def complete(content):
        seen.append(content)
        return "5 4\nok"

    rules = {"llava_bench_conv": {"role": "Assistant", "prompt": "judge!"},
             "default": {"role": "Assistant", "prompt": "judge!"}}
    a = {"question_id": 1, "answer_id": "x", "text": "A1"}
    b = {"question_id": 1, "answer_id": "y", "text": "A2"}
    rows = review_answers([q], [a], [b], complete, rules=rules,
                          contexts=contexts, variant="bench")
    assert seen[0].startswith("[Context]\na cat\non a mat\n\n[Question]")
    assert rows[0]["tuple"] == [5.0, 4.0]
    # resume: pre-existing rows are not re-judged
    rows2 = review_answers([q], [a], [b], complete, rules=rules,
                           contexts=contexts, variant="bench",
                           resume_rows=rows)
    assert rows2 == rows and len(seen) == 1


def test_sqa_gpt4_ensemble_scorers():
    """eval_science_qa_gpt4(.py/_requery.py) ensemble semantics."""
    from llavamod_tpu.eval.scorers import score_sqa_requery, score_sqa_vs_gpt4

    problems = {
        "p1": {"choices": ["x", "y"], "answer": 0},
        "p2": {"choices": ["x", "y", "z"], "answer": 2},
        "p3": {"choices": ["x", "y"], "answer": 1},
    }
    split = ["p1", "p2", "p3"]
    ours = {"p1": {"text": "The answer is A."},
            "p2": {"text": "The answer is C."},
            "p3": {"text": "The answer is A."}}
    gpt4 = {"p1": "The answer is B.",   # wrong; ours right -> upperbound
            "p2": "no idea",            # FAILED -> falls back to ours (right)
            "p3": "The answer is B."}   # right; ours wrong
    m = score_sqa_vs_gpt4(problems, split, ours, gpt4)
    assert m["total"] == 3 and m["gpt4_failed"] == 1
    assert m["correct"] == 2           # p2 via fallback, p3 via gpt4
    assert m["correct_upperbound"] == 3

    req = {"p1": {"text": "The answer is A."},  # fixes p1
           "p3": {"text": "gibberish"}}          # FAILED -> ours (wrong)
    m2, result_map = score_sqa_requery(problems, split, ours, gpt4, req)
    assert m2["total"] == 3 and m2["missing_requery"] == 1
    assert m2["our_correct"] == 2
    assert result_map["p1"] == 0       # requery answer used
