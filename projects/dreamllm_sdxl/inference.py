"""DreamLLM-SDXL inference entry point (reference projects/dreamllm_sdxl/
inf.py — the SDXL twin of projects/dreamllm/inference.py). The SDXL head is
a config switch (``head_type="sdxl"`` in the config file); the shared entry
routes t2i through ``sdxl_head_pipeline`` (dual conditioning: pooled
text_embeds + add_time_ids) and interleaved generation auto-dispatches on
the head-config type.

    python -m projects.dreamllm_sdxl.inference \
        --config_file projects/dreamllm_sdxl/configs/smoke.py \
        prompt="a photo of a corgi" mode="t2i"
"""

from projects.dreamllm.inference import main


if __name__ == "__main__":
    main()
