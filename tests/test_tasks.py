"""Few-shot prompt rendering + MC task driver."""

from dreamllm_tpu.eval.tasks import (
    MCSample,
    evaluate_multiple_choice,
    render_cloze_prompt,
    render_mc_prompt,
)


S = MCSample(question="2+2=?", choices=["3", "4", "5"], answer=1, subject="college_math")
FS = MCSample(question="1+1=?", choices=["2", "7"], answer=0, subject="college_math")


def test_mc_prompt_zero_shot():
    ctx, conts = render_mc_prompt(S)
    assert "college math" in ctx
    assert ctx.endswith("Answer:")
    assert "A. 3" in ctx and "B. 4" in ctx
    assert conts == [" A", " B", " C"]


def test_mc_prompt_few_shot_includes_answers():
    ctx, _ = render_mc_prompt(S, few_shot=[FS])
    assert "1+1=?" in ctx
    assert "Answer: A" in ctx          # shot answered
    assert ctx.count("Answer:") == 2   # shot + query
    assert ctx.endswith("Answer:")


def test_cloze_prompt():
    ctx, conts = render_cloze_prompt(S, few_shot=[FS])
    assert ctx.startswith("1+1=? 2")
    assert conts == [" 3", " 4", " 5"]


def test_evaluate_mc():
    samples = [
        MCSample("q1", ["a", "b"], 0, subject="x"),
        MCSample("q2", ["a", "b"], 1, subject="x"),
        MCSample("q3", ["a", "b"], 0, subject="y"),
    ]

    def oracle(ctx, conts):  # always picks index 0
        return 0

    out = evaluate_multiple_choice(oracle, samples)
    assert out["accuracy"] == 2 / 3
    assert out["by_subject"]["x"] == 0.5
    assert out["by_subject"]["y"] == 1.0
