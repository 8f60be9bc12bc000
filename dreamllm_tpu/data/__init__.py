from dreamllm_tpu.data.dataset_types import (
    DatasetType,
    ImageTextPair,
    InstructInterleavedImageText,
    InterleavedImageText,
    ConversationSample,
    Message,
)
from dreamllm_tpu.data.builder import (
    BuilderConfig,
    DreamLLMBuilder,
)
from dreamllm_tpu.data.collator import collate
from dreamllm_tpu.data.mixed import MixedDataset
from dreamllm_tpu.data.registry import DataManager, DatasetInfo, DATASETS
