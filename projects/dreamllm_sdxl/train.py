"""DreamLLM-SDXL training entry point (reference projects/dreamllm_sdxl/
train.py — same flow as projects/dreamllm with use_sdxl_head=True + the SDXL
collator). Here the SDXL head is a config switch: ``head_type="sdxl"``.

    python -m projects.dreamllm_sdxl.train --config_file projects/dreamllm_sdxl/configs/smoke.py
"""

from projects.dreamllm.train import main


if __name__ == "__main__":
    main()
