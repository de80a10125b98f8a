"""SQA base-prompt builder vs the reference script as a live oracle.

The reference's scripts/convert_sqa_to_llava_base_prompt.py is a plain
dependency-free python file — import it straight from disk and pin byte
parity of our single-engine port (llavamod_tpu/eval/sqa_prompt.py)
across every input format x output format x builder style.
"""

import importlib.util
import os
import types

import pytest

from llavamod_tpu.eval import sqa_prompt

REF = "/root/reference/scripts/convert_sqa_to_llava_base_prompt.py"

INPUT_FORMATS = ["CQM", "QCM", "QCML", "QCME", "QCMLE", "QCLM", "QCEM",
                 "QCLEM"]
OUTPUT_FORMATS = ["A", "AL", "AE", "ALE", "AEL", "LA", "EA", "LEA", "ELA"]


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF):
        pytest.skip("reference checkout not present")
    spec = importlib.util.spec_from_file_location("ref_sqa_prompt", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PROBLEMS = {
    "q1": {"question": "Which is a mammal?", "hint": "Think of fur.",
           "caption": "a photo of animals",
           "choices": ["whale", "trout", "sparrow"], "answer": 0,
           "lecture": "Mammals nurse their young.\nBirds lay eggs.",
           "solution": "A whale nurses its young.\nSo it is a mammal."},
    "q2": {"question": "What color?", "hint": "", "caption": "",
           "choices": ["red", "blue"], "answer": 1,
           "lecture": "", "solution": "Blue because sky."},
    "q3": {"question": "Pick  one.", "hint": "double  spaces here",
           "caption": "cap", "choices": ["a", "b", "c", "d"], "answer": 3,
           "lecture": "L text", "solution": ""},
}


@pytest.mark.parametrize("use_caption", [False, True])
@pytest.mark.parametrize("ifmt", INPUT_FORMATS)
@pytest.mark.parametrize("ofmt", ["A", "ALE", "LEA", "EA"])
def test_build_prompt_plain_parity(ref, use_caption, ifmt, ofmt):
    fmt = f"{ifmt}-{ofmt}"
    args = types.SimpleNamespace(prompt_format=fmt, use_caption=use_caption,
                                 options=list(sqa_prompt.DEFAULT_OPTIONS))
    want = ref.build_prompt(PROBLEMS, ["q1", "q2"], "q3", args)
    got = sqa_prompt.build_prompt(PROBLEMS, ["q1", "q2"], "q3", fmt,
                                  use_caption=use_caption)
    assert got == want, fmt


@pytest.mark.parametrize("ofmt", OUTPUT_FORMATS + ["LEPA"])
@pytest.mark.parametrize("is_test", [False, True])
def test_build_prompt_chatbot_parity(ref, ofmt, is_test):
    fmt = f"QCM-{ofmt}"
    want = ref.build_prompt_chatbot(PROBLEMS, list(PROBLEMS), fmt,
                                    use_caption=False, is_test=is_test)
    got = sqa_prompt.build_prompt_chatbot(PROBLEMS, list(PROBLEMS), fmt,
                                          use_caption=False, is_test=is_test)
    assert got == want, fmt


@pytest.mark.parametrize("ifmt", INPUT_FORMATS)
@pytest.mark.parametrize("ofmt", ["A", "AEL", "ELA"])
def test_build_prompt_gpt4_parity(ref, ifmt, ofmt):
    fmt = f"{ifmt}-{ofmt}"
    args = types.SimpleNamespace(prompt_format=fmt, use_caption=True,
                                 options=list(sqa_prompt.DEFAULT_OPTIONS))
    want = ref.build_prompt_gpt4(PROBLEMS, ["q2", "q1"], "q3", args)
    got = sqa_prompt.build_prompt_gpt4(PROBLEMS, ["q2", "q1"], "q3", fmt,
                                       use_caption=True)
    assert got == want, fmt


def test_webpage_data_roundtrip(tmp_path):
    """webpage_data.py joins question/answers/reviews into the reference
    webpage schema (generate_webpage_data_from_table.py:45-111) with the
    score-line trim + Assistant bolding cleanup."""
    import json

    from llavamod_tpu.eval import webpage_data

    def jsonl(name, rows):
        p = tmp_path / name
        p.write_text("\n".join(json.dumps(r) for r in rows))
        return str(p)

    q = jsonl("q.jsonl", [
        {"question_id": 2, "text": "Q two", "category": "math"},
        {"question_id": 1, "text": "Q one", "category": "common"}])
    ours = jsonl("ours.jsonl", [{"question_id": i, "text": f"ours {i}"}
                                for i in (1, 2)])
    base = jsonl("base.jsonl", [{"question_id": i, "text": f"base {i}"}
                                for i in (1, 2)])
    rev = jsonl("rev.jsonl", [
        {"question_id": 1, "content": "7, 9\nAssistant 1 was terse.",
         "tuple": [7, 9]},
        {"question_id": 2, "content": "Assistant 2 hallucinated.",
         "tuple": [8, 4]}])
    out = str(tmp_path / "data.json")
    webpage_data.main(["--questions", q, "--ours", ours,
                       "--answers", f"base={base}",
                       "--reviews", f"base={rev}", "--output", out])
    data = json.loads(open(out).read())
    assert data["models"] == ["base"]
    recs = data["questions"]
    assert [r["id"] for r in recs] == [1, 2]
    assert recs[0]["answers"] == {"ours": "ours 1", "base": "base 1"}
    # the leading "7, 9" score line is trimmed, Assistant mentions bolded
    assert recs[0]["evaluations"]["base"] == "**Assistant 1** was terse."
    assert recs[0]["scores"]["base"] == [7, 9]
    assert recs[1]["evaluations"]["base"] == "**Assistant 2** hallucinated."
