"""LLaVA training entry point (reference projects/llava/train.py):
comprehension-only variant — same pipeline as projects/dreamllm/train.py with
the creation path disabled and LLaVA freeze presets.

    python -m projects.llava.train --config_file projects/llava/configs/pretrain_smoke.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import dreamllm_tpu.data.catalog  # noqa: F401
from dreamllm_tpu.config import LazyArgumentParser, default_setup, instantiate
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, param_freeze_mask
from dreamllm_tpu.models.llava import init_llava_params
from dreamllm_tpu.parallel import MeshConfig, batch_shardings, create_mesh, param_shardings
from dreamllm_tpu.train import OptimizerConfig, init_train_state, make_optimizer, make_train_step
from dreamllm_tpu.train.trainer import Trainer, TrainerConfig
from dreamllm_tpu.utils.logging import get_logger
from dreamllm_tpu.utils.metrics_logger import MetricsLogger

from projects.dreamllm.train import data_stream, make_tokenizer

logger = get_logger("projects.llava.train")


def main(argv=None):
    args, config = LazyArgumentParser().parse(argv)
    run_dir = default_setup(args, config)

    m = instantiate(config["model"])
    frozen = tuple(m.pop("frozen", ()))
    cfg = DreamLLMConfig(**m, frozen=frozen, loss_weight_vm=0.0)
    tokenizer = make_tokenizer(config, cfg)

    mesh = create_mesh(MeshConfig(**config.get("mesh", {})))
    params = jax.jit(lambda r: init_llava_params(r, cfg))(
        jax.random.PRNGKey(config.get("seed", 0))
    )
    params = jax.tree.map(jax.device_put, params, param_shardings(params, mesh))

    ocfg = OptimizerConfig(**config["optimizer"])
    mask = param_freeze_mask(params, cfg)
    tx = make_optimizer(ocfg, trainable_mask=mask)
    state = init_train_state(params, tx)
    step = make_train_step(
        cfg, tx, head_in_params=False,
        grad_accum=config.get("grad_accum", 1), remat=True,
        use_flash=jax.default_backend() == "tpu",
        trainable_mask=mask,
    )

    from dreamllm_tpu.data.stream import MappedStream, PrefetchStream

    def _shard(batch):
        batch.pop("images_dm", None)
        batch.pop("dream_positions", None)
        batch.pop("add_time_ids", None)
        return jax.tree.map(jax.device_put, batch, batch_shardings(batch, mesh))

    stream = MappedStream(data_stream(config, cfg, tokenizer), _shard)
    depth = int(config["data"].get("prefetch", 2))
    if depth > 0:
        stream = PrefetchStream(stream, depth=depth)

    tcfg = TrainerConfig(**config["trainer"])
    mlog = MetricsLogger(run_dir, project="llava_tpu")
    trainer = Trainer(tcfg, step, stream, state, callbacks=[mlog])
    final = trainer.train()
    mlog.finish()
    return final


if __name__ == "__main__":
    main()
