"""utils package (reference: `DeepFlows/utils/`)."""

from . import data  # noqa: F401
from .evaluate import (  # noqa: F401
    Accumulator,
    accuracy,
    evaluate_accuracy,
    softmax,
    topk_accuracy,
)
from .model_configs import (  # noqa: F401
    IMAGENET_STATS,
    MOBILENET_V1_CONFIG,
    MODEL_METADATA,
    RESNET_BLOCK_CONFIG,
    VGG_CONFIG,
    get_model_config,
    get_model_metadata,
    get_normalization_stats,
    is_model_supported,
)
from .model_utils import (  # noqa: F401
    AsyncCheckpointer,
    load_checkpoint,
    save_checkpoint,
)
from .hf_gpt2 import (  # noqa: F401
    build_gpt2_from_hf_config,
    convert_hf_gpt2,
    load_hf_gpt2_state,
)
from .hf_llama import (  # noqa: F401
    build_llama_from_hf_config,
    build_mixtral_from_hf_config,
    convert_hf_llama,
    convert_hf_mixtral,
    load_hf_llama_state,
    load_hf_mixtral_state,
)
from .text import BPETokenizer, LMDataset, SFTDataset  # noqa: F401
from .trainer import Trainer  # noqa: F401
from .visual import Animator  # noqa: F401
from . import profiling  # noqa: F401,E402
from .data import transforms  # noqa: F401,E402
