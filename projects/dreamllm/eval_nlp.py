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
from dreamllm_tpu.eval.language import (
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

    server = config.get("server")
    if server:
        choose, generate = online_scorers(
            server, max_new_tokens=config.get("max_new_tokens", 100)
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
    print(json.dumps({k: v for k, v in result.items() if k != "results"}))
    return result


if __name__ == "__main__":
    main()
