"""Language-eval drivers: MMLU/BBH loaders, answer matching, end-to-end runs."""

import csv
import json
import os

import jax
import numpy as np
import pytest

from dreamllm_tpu.eval.language import (
    answers_match,
    extract_generated_answer,
    load_bbh_fewshot_prefix,
    load_bbh_tasks,
    load_mmlu_csv,
    local_scorers,
    normalize_answer,
    online_scorers,
    run_bbh,
    run_mmlu,
    smoke_bbh,
    smoke_mmlu,
)
from dreamllm_tpu.eval.tasks import MCSample


class TestLoaders:
    def test_mmlu_csv_roundtrip(self, tmp_path):
        d = tmp_path / "test"
        d.mkdir()
        with open(d / "astronomy_test.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["What orbits Earth?", "Sun", "Moon", "Mars", "Venus", "B"])
            w.writerow(["Star nearest Earth?", "Sun", "Sirius", "Vega", "Deneb", "A"])
        data = load_mmlu_csv(str(tmp_path), "test")
        assert list(data) == ["astronomy"]
        assert data["astronomy"][0].answer == 1
        assert data["astronomy"][1].choices[0] == "Sun"
        assert data["astronomy"][0].subject == "astronomy"

    def test_mmlu_flat_layout_and_missing(self, tmp_path):
        with open(tmp_path / "law_dev.csv", "w", newline="") as f:
            csv.writer(f).writerow(["Q?", "a", "b", "c", "d", "D"])
        data = load_mmlu_csv(str(tmp_path), "dev")
        assert data["law"][0].answer == 3
        with pytest.raises(FileNotFoundError):
            load_mmlu_csv(str(tmp_path), "test")

    def test_bbh_tasks_and_prompts(self, tmp_path):
        with open(tmp_path / "boolean_expressions.json", "w") as f:
            json.dump({"examples": [{"input": "True and False is", "target": "False"}]}, f)
        tasks = load_bbh_tasks(str(tmp_path))
        assert tasks["boolean_expressions"][0]["target"] == "False"

        pd = tmp_path / "prompts"
        pd.mkdir()
        with open(pd / "boolean_expressions.txt", "w") as f:
            f.write("BENCHMARK DATA SHOULD NEVER APPEAR... canary GUID x\n"
                    "Evaluate the expression.\n\nQ: not True is\nA: False")
        prefix = load_bbh_fewshot_prefix(str(pd), "boolean_expressions")
        assert "canary" not in prefix.lower()
        assert prefix.startswith("Evaluate the expression.")
        assert load_bbh_fewshot_prefix(str(pd), "absent_task") == ""


class TestAnswerMatching:
    def test_normalize(self):
        assert normalize_answer("The  Answer, is: 42.") == "answer is 42"
        assert normalize_answer("  False.  ") == "false"

    @pytest.mark.parametrize(
        "gen,expected",
        [
            ("the answer is (B).", "(B)"),
            (" False\n\nQ: next question", "False"),
            ("Let's think. So the answer is 42.", "42"),
            ("yes", "yes"),
        ],
    )
    def test_extract(self, gen, expected):
        assert extract_generated_answer(gen) == expected

    @pytest.mark.parametrize(
        "pred,target,ok",
        [
            ("False", "False", True),
            ("false.", "False", True),
            ("(a)", "(A)", True),
            ("A", "(A)", True),
            ("(B) 01/02/2020", "(B)", True),
            ("(B)", "(A)", False),
            ("True", "False", False),
        ],
    )
    def test_match(self, pred, target, ok):
        assert answers_match(pred, target) is ok


class TestDrivers:
    def test_run_mmlu_perfect_oracle(self, tmp_path):
        test, dev = smoke_mmlu()
        # oracle: look up the right answer from the rendered context
        answers = {s.question: s.answer for ss in test.values() for s in ss}

        def choose(ctx, conts):
            for q, a in answers.items():
                if q in ctx:
                    return a
            return 0

        out = run_mmlu(choose, test, dev, k_shot=1,
                       out_path=str(tmp_path / "mmlu.json"))
        assert out["accuracy"] == 1.0
        assert out["n"] == 3
        assert set(out["by_subject"]) == {"elementary_arithmetic", "geography"}
        saved = json.loads((tmp_path / "mmlu.json").read_text())
        assert len(saved["results"]) == 3

    def test_run_mmlu_fewshot_in_context(self):
        test, dev = smoke_mmlu()
        seen = []

        def choose(ctx, conts):
            seen.append(ctx)
            return 0

        run_mmlu(choose, test, dev, k_shot=1)
        arith_ctx = [c for c in seen if "2 + 2" in c][0]
        assert "What is 1 + 1?" in arith_ctx       # few-shot from SAME subject
        assert "Answer: B" in arith_ctx            # dev answer revealed
        assert arith_ctx.rstrip().endswith("Answer:")

    def test_run_bbh_oracle_and_prompts(self, tmp_path):
        tasks = smoke_bbh()
        targets = {ex["input"]: ex["target"]
                   for exs in tasks.values() for ex in exs}
        prompts = []

        def gen(prompt):
            prompts.append(prompt)
            q = prompt.split("Q: ")[-1].split("\nA:")[0]
            return f" the answer is {targets[q]}."

        out = run_bbh(gen, tasks, out_path=str(tmp_path / "bbh.json"))
        assert out["accuracy"] == 1.0
        assert out["n"] == 3
        assert all(p.endswith("\nA:") for p in prompts)

    def test_run_bbh_scores_wrong_answers(self):
        out = run_bbh(lambda p: " the answer is banana.", smoke_bbh())
        assert out["accuracy"] == 0.0


class TestEndToEnd:
    def test_local_scorers_smoke(self):
        """mmlu_smoke + bbh_smoke through the real jitted scorer/decoder."""
        from dreamllm_tpu.data.tokenization import ToyTokenizer
        from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig(
            vocab_size=32000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512,
        )
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        choose, generate = local_scorers(
            params, cfg, ToyTokenizer(), max_new_tokens=8
        )
        test, dev = smoke_mmlu()
        out = run_mmlu(choose, test, dev, k_shot=1)
        assert 0.0 <= out["accuracy"] <= 1.0 and out["n"] == 3

        out = run_bbh(generate, {"boolean_expressions": smoke_bbh()["boolean_expressions"][:1]})
        assert out["n"] == 1  # random model: just verify the path runs end-to-end

    def test_online_scorers_roundtrip(self):
        """run_mmlu/run_bbh against a live ModelServer over HTTP."""
        from dreamllm_tpu.serve.server import ModelServer

        def gen_fn(prompt, kw):
            return " the answer is False."

        def lp_fn(context, continuations):
            # prefer " B" deterministically
            return [1.0 if c.strip() == "B" else 0.0 for c in continuations]

        server = ModelServer(gen_fn, lp_fn, port=0).start()
        try:
            choose, generate = online_scorers(f"http://127.0.0.1:{server.port}")
            test, dev = smoke_mmlu()
            out = run_mmlu(choose, test, dev, k_shot=1)
            # oracle prefers B: arithmetic q1 answer=B, geography answer=B
            assert out["accuracy"] == pytest.approx(2 / 3)
            bbh = run_bbh(generate, smoke_bbh())
            assert bbh["by_task"]["boolean_expressions"] == 0.5
        finally:
            server.stop()


class TestCLI:
    def test_eval_nlp_mmlu_smoke_cli(self, tmp_path):
        """The VERDICT's 'runnable command producing a scored JSON'."""
        from projects.dreamllm.eval_nlp import main

        result = main([
            "--config_file", "projects/dreamllm/configs/smoke.py",
            f"run_dir={tmp_path}", "+task=mmlu_smoke", "+k_shot=1",
        ])
        assert result["n"] == 3
        files = [f for r, _, fs in os.walk(tmp_path) for f in fs]
        assert "mmlu_smoke.json" in files


class TestBaseMCTasks:
    """Base MC task renderers (BoolQ/PIQA/.../RACE — reference BASE_TASKS,
    llama_evaluation task_utils.py:428-433)."""

    def test_renderers_shapes_and_answers(self):
        from dreamllm_tpu.eval.language import MC_TASK_RENDERERS

        rows = {
            "boolq": {"question": "is water wet", "passage": "Water is wet.",
                      "answer": True},
            "piqa": {"goal": "dry hands", "sol1": "use a towel",
                     "sol2": "use a fork", "label": 0},
            "siqa": {"context": "Alex helped.", "question": "Why?",
                     "answerA": "kindness", "answerB": "anger", "answerC": "fear",
                     "label": "1"},
            "hellaswag": {"ctx": "A man sits down", "endings": ["a", "b", "c", "d"],
                          "label": 2},
            "winogrande": {"sentence": "The cup fell because _ was fragile.",
                           "option1": "the cup", "option2": "the table",
                           "answer": "1"},
            "arc_e": {"question": "2+2?", "answerKey": "B",
                      "choices": {"text": ["3", "4"], "label": ["A", "B"]}},
            "obqa": {"question_stem": "the sun is a", "answerKey": "A",
                     "choices": {"text": ["star", "planet"], "label": ["A", "B"]}},
            "sciq": {"question": "H2O is?", "correct_answer": "water",
                     "distractor1": "fire", "distractor2": "air",
                     "distractor3": "rock"},
            "race_m": {"article": "Tom ran.", "question": "Who ran?",
                       "options": ["Tom", "Ann", "Sam", "Joe"], "answer": "A"},
        }
        expect_answer = {"boolq": 1, "piqa": 0, "siqa": 0, "hellaswag": 2,
                         "winogrande": 0, "arc_e": 1, "obqa": 0, "sciq": 3,
                         "race_m": 0}
        for task, row in rows.items():
            ctx, conts, ans = MC_TASK_RENDERERS[task](row)
            assert isinstance(ctx, str) and len(conts) >= 2
            assert ans == expect_answer[task], task
            assert 0 <= ans < len(conts)

    def test_boolq_prompt_matches_reference_format(self):
        from dreamllm_tpu.eval.language import MC_TASK_RENDERERS

        ctx, conts, ans = MC_TASK_RENDERERS["boolq"](
            {"question": "did it rain", "passage": "It rained all day.",
             "answer": False})
        # submission_dev_boolq.py:49-50 make_test_prompt
        assert ctx == ("Choose yes or no to answer the question.\n\n"
                       "It rained all day.\n\nDid it rain?\nAnswer:")
        assert conts == [" no", " yes"] and ans == 0

    def test_winogrande_partial_eval(self):
        from dreamllm_tpu.eval.language import MC_TASK_RENDERERS

        ctx, conts, ans = MC_TASK_RENDERERS["winogrande"](
            {"sentence": "Ann thanked Sue because _ helped her.",
             "option1": "Sue", "option2": "Ann", "answer": "1"})
        assert ctx == "Ann thanked Sue because "
        assert conts == ["Sue helped her.", "Ann helped her."]

    def test_run_mc_task_and_jsonl(self, tmp_path):
        import json

        from dreamllm_tpu.eval.language import load_jsonl, run_mc_task

        rows = [
            {"goal": f"g{i}", "sol1": "short", "sol2": "the much longer one",
             "label": 1} for i in range(4)
        ]
        p = tmp_path / "piqa.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        loaded = load_jsonl(str(p))
        assert len(loaded) == 4

        def choose_longest(ctx, conts):
            return max(range(len(conts)), key=lambda i: len(conts[i]))

        out = run_mc_task(choose_longest, "piqa", loaded,
                          out_path=str(tmp_path / "out.json"))
        assert out["accuracy"] == 1.0 and out["n"] == 4
        assert (tmp_path / "out.json").exists()


class TestGenQATasks:
    """Generation-scored QA (TriviaQA/NaturalQA/DROP, reference BASE_TASKS)."""

    def test_squad_em_f1(self):
        from dreamllm_tpu.eval.language import squad_em_f1

        assert squad_em_f1("The Eiffel Tower", ["eiffel tower"]) == (1.0, 1.0)
        em, f1 = squad_em_f1("tower of eiffel", ["eiffel tower"])
        assert em == 0.0 and 0.7 < f1 <= 1.0
        assert squad_em_f1("paris", ["london", "paris"]) == (1.0, 1.0)
        assert squad_em_f1("nothing", ["relevant answer"])[1] == 0.0

    def test_renderers(self):
        from dreamllm_tpu.eval.language import GEN_QA_RENDERERS

        p, golds = GEN_QA_RENDERERS["triviaqa"](
            {"question": "capital of France?",
             "answer": {"aliases": ["Paris", "paris"], "value": "Paris"}})
        assert p.endswith("Answer:") and golds == ["Paris", "paris"]
        p, golds = GEN_QA_RENDERERS["naturalqa"](
            {"question": "who wrote hamlet", "answer": ["Shakespeare"]})
        assert golds == ["Shakespeare"]
        p, golds = GEN_QA_RENDERERS["drop_gen"](
            {"passage": "There were 3 cats and 2 dogs.",
             "question": "How many cats?",
             "answers_spans": {"spans": ["3"]}})
        assert "Passage:" in p and golds == ["3"]

    def test_run_gen_qa(self, tmp_path):
        from dreamllm_tpu.eval.language import run_gen_qa

        rows = [
            {"question": "q1", "answer": {"aliases": ["alpha"], "value": "alpha"}},
            {"question": "q2", "answer": {"aliases": ["beta"], "value": "beta"}},
        ]

        def fake_generate(prompt):
            return " alpha\nextra line" if "q1" in prompt else " gamma"

        out = run_gen_qa(fake_generate, "triviaqa", rows,
                         out_path=str(tmp_path / "o.json"))
        assert out["em"] == 0.5 and out["n"] == 2
        assert (tmp_path / "o.json").exists()
