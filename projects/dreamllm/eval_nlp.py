"""Language-eval entry point: MMLU (few-shot logprob MC) + BBH (generation).

TPU-native equivalent of the reference's llama_evaluation task CLIs
(omni/eval/language_eval/llama_evaluation_main/llama_evaluation/tasks/
{mmlu,multich}.py + evaluator/{local,online}_evaluator.py). Runs against
in-process params (local jitted scorers) or a running serve/ ModelServer
(``server=http://host:port``) — the reference's online-evaluator path.

    # zero-download smoke (scored JSON in the run dir; random params unless
    # checkpoint= points at a trained run)
    python -m projects.dreamllm.eval_nlp --config_file \
        projects/dreamllm/configs/smoke.py +task=mmlu_smoke

    # real runs: point data_dir at the standard public layouts
    python -m projects.dreamllm.eval_nlp --config_file <cfg> +task=mmlu \
        +data_dir=/data/mmlu +k_shot=5
    python -m projects.dreamllm.eval_nlp --config_file <cfg> +task=bbh \
        +data_dir=/data/bbh +prompts_dir=/data/bbh/cot-prompts
"""

from __future__ import annotations

import json
import os

import jax

from dreamllm_tpu.config import LazyArgumentParser, default_setup
from dreamllm_tpu.eval.code_math import (
    run_gsm8k,
    run_humaneval,
    run_math,
    smoke_gsm8k,
    smoke_humaneval,
    smoke_math,
)
from dreamllm_tpu.eval.language import (
    GEN_QA_CN_TASKS,
    GEN_QA_RENDERERS,
    MC_TASK_RENDERERS,
    load_bbh_tasks,
    load_jsonl,
    load_mmlu_csv,
    local_scorers,
    online_scorers,
    run_bbh,
    run_gen_qa,
    run_mc_task,
    run_mmlu,
    smoke_bbh,
    smoke_mmlu,
)
from dreamllm_tpu.train.checkpoints import latest_checkpoint, load_params
from dreamllm_tpu.utils.logging import get_logger

from projects.dreamllm.train import build_model_cfg, make_tokenizer

logger = get_logger("projects.dreamllm.eval_nlp")


def main(argv=None):
    args, config = LazyArgumentParser().parse(argv)
    run_dir = default_setup(args, config)
    task = config.get("task", "mmlu_smoke")
    out_path = os.path.join(run_dir, f"{task}.json")

    # Concat-style evaluators length-normalize choice logprob by CHARACTER
    # count (reference local_evaluator.py:55; wsc_concat likewise divides by
    # len(choice)) — without it clue_wsc's longer substituted reading is
    # systematically penalized. Other MC tasks use summed logprob.
    norm_len = config.get("normalize_by_length", task in ("clue_c3", "clue_wsc"))

    server = config.get("server")
    if server:
        choose, generate = online_scorers(
            server, max_new_tokens=config.get("max_new_tokens", 100),
            normalize_by_length=norm_len,
        )
    else:
        cfg, _ = build_model_cfg(config)
        tokenizer = make_tokenizer(config, cfg)
        from dreamllm_tpu.models.dreamllm import init_dreamllm_params

        params = jax.jit(lambda r: init_dreamllm_params(r, cfg))(jax.random.PRNGKey(0))
        ck = latest_checkpoint(config.get("checkpoint", config["trainer"]["output_dir"]))
        if ck:
            loaded = load_params(ck)
            for k in params:
                if k in loaded:
                    params[k] = loaded[k]
            logger.info("loaded %s", ck)
        else:
            logger.warning("no checkpoint found — scoring with random params")
        choose, generate = local_scorers(
            params["llm"], cfg.llm, tokenizer,
            max_new_tokens=config.get("max_new_tokens", 100),
            normalize_by_length=norm_len,
        )

    k_shot = config.get("k_shot", 5)
    max_n = config.get("max_samples")  # per subject/task cap for quick runs
    if task == "mmlu_smoke":
        test, dev = smoke_mmlu()
        result = run_mmlu(choose, test, dev, k_shot=k_shot, out_path=out_path)
    elif task == "mmlu":
        test = load_mmlu_csv(config["data_dir"], "test")
        try:
            dev = load_mmlu_csv(config["data_dir"], "dev")
        except FileNotFoundError:
            dev = None
        result = run_mmlu(
            choose, test, dev, k_shot=k_shot,
            max_samples_per_subject=max_n, out_path=out_path,
        )
    elif task == "bbh_smoke":
        result = run_bbh(generate, smoke_bbh(), out_path=out_path)
    elif task == "bbh":
        tasks = load_bbh_tasks(config["data_dir"], config.get("bbh_tasks"))
        result = run_bbh(
            generate, tasks,
            prompts_dir=config.get("prompts_dir"),
            max_samples_per_task=max_n, out_path=out_path,
        )
    elif task in ("ceval", "cmmlu"):
        # C-Eval / CMMLU: MMLU-style per-subject letter MC over headered csv
        from dreamllm_tpu.eval.language import load_ceval_csv

        split = config.get("split", "val")
        test = load_ceval_csv(config["data_dir"], split)
        try:
            dev = load_ceval_csv(config["data_dir"], "dev")
        except FileNotFoundError:
            dev = None
        result = run_mmlu(
            choose, test, dev, k_shot=k_shot,
            max_samples_per_subject=max_n, out_path=out_path, task_name=task,
        )
    elif task in ("math", "math_smoke", "gsm8k", "gsm8k_smoke"):
        # quantitative reasoning (reference tasks/math_eval.py): few-shot CoT,
        # final-answer extraction + Minerva normalization, optional vote=k
        votes = config.get("votes", 1)
        if task.endswith("smoke"):
            rows = smoke_math() if task.startswith("math") else smoke_gsm8k()
        else:
            name = "math" if task == "math" else "gsm8k"
            path = config.get("data_file") or os.path.join(config["data_dir"], f"{name}.jsonl")
            rows = load_jsonl(path)
        runner = run_math if task.startswith("math") else run_gsm8k
        result = runner(generate, rows, votes=votes, max_samples=max_n, out_path=out_path)
    elif task in ("humaneval", "humaneval_smoke"):
        # codegen functional correctness (reference tasks/codegen.py): sampled
        # completions executed in isolated subprocesses, unbiased pass@k
        if task == "humaneval_smoke":
            problems = smoke_humaneval()
        else:
            path = config.get("data_file") or os.path.join(config["data_dir"], "humaneval.jsonl")
            problems = load_jsonl(path)
        result = run_humaneval(
            generate, problems,
            samples_per_task=config.get("samples_per_task", 1),
            ks=tuple(config.get("pass_ks", (1,))),
            max_samples=max_n, out_path=out_path,
        )
    elif task in ("agieval", "agieval_smoke"):
        # generation-scored AGIEval (reference agi_utils): letter extraction
        # for MC subsets, math-equivalence for cloze, per-subset + average
        from dreamllm_tpu.eval.agieval import load_agieval, run_agieval, smoke_agieval

        if task == "agieval_smoke":
            subsets = smoke_agieval()
        else:
            subsets = load_agieval(config["data_dir"], config.get("subsets"))
        result = run_agieval(
            generate, subsets, max_samples_per_subset=max_n, out_path=out_path
        )
    elif task in GEN_QA_CN_TASKS:
        # Chinese short-generation QA (reference short_generation_cn_evaluator)
        from dreamllm_tpu.eval.language import run_gen_qa_cn

        path = config.get("data_file") or os.path.join(config["data_dir"], f"{task}.jsonl")
        result = run_gen_qa_cn(generate, task, load_jsonl(path),
                               max_samples=max_n, out_path=out_path)
    elif task in GEN_QA_RENDERERS:
        # generation-scored QA (triviaqa/naturalqa/drop_gen): EM + token-F1
        path = config.get("data_file") or os.path.join(config["data_dir"], f"{task}.jsonl")
        result = run_gen_qa(generate, task, load_jsonl(path),
                            max_samples=max_n, out_path=out_path)
    elif task in MC_TASK_RENDERERS:
        # base MC tasks (boolq/piqa/siqa/hellaswag/winogrande/arc/obqa/sciq/
        # race) from their standard jsonl layouts: data_dir/<task>.jsonl or an
        # explicit +data_file=
        path = config.get("data_file") or os.path.join(config["data_dir"], f"{task}.jsonl")
        result = run_mc_task(choose, task, load_jsonl(path),
                             max_samples=max_n, out_path=out_path)
    else:
        raise ValueError(f"unknown task {task!r}")

    logger.info("%s accuracy=%.4f n=%d -> %s", task, result["accuracy"], result["n"], out_path)

    db_path = config.get("db")
    if db_path:
        # accumulate scores across runs/models (reference metrics_to_database)
        from dreamllm_tpu.eval.results_db import (
            JsonlMirror, ResultsDB, export_dashboard_html,
        )

        # +db_mirror=runs.jsonl: push each run to a shared-fs JSONL mirror
        # (reference redis/influx writers, db_utils.py)
        mirrors = [JsonlMirror(config["db_mirror"])] if config.get("db_mirror") else []
        model_name = config.get("model_name") or config.get("checkpoint") or "dreamllm"
        with ResultsDB(db_path, mirrors=mirrors) as db:
            count = db.record_result(str(model_name), result)
            logger.info("recorded run #%d for %s in %s", count, model_name, db_path)
            print(db.compare())
            if config.get("db_dashboard"):
                # +db_dashboard=index.html: static HTML leaderboard
                # (reference streamlit display, tools/fe_display.py)
                out = export_dashboard_html(db, config["db_dashboard"])
                logger.info("dashboard -> %s", out)

    print(json.dumps({k: v for k, v in result.items() if k != "results"}))
    return result


if __name__ == "__main__":
    main()
