"""open_clip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) contrastive vision-language-audio
framework with the capability surface of mlfoundations/open_clip.

Public API mirrors the reference's ``src/open_clip/__init__.py``.
"""

from .config import (
    CLIPModelCfg,
    CLIPTextCfg,
    CLIPVisionCfg,
    MultimodalCfg,
    add_model_config,
    get_model_config,
    list_models,
)
from .constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    INCEPTION_MEAN,
    INCEPTION_STD,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)
from .factory import (
    create_model,
    create_model_and_transforms,
    create_model_from_pretrained,
    get_tokenizer,
    load_checkpoint,
)
from .config import CLIPAudioCfg
from .loss import ClipLoss, CoCaLoss, DistillClipLoss, GenLipLoss, SigLipLoss, create_loss
from .models.clip import (
    CLIPModel,
    clamp_logit_scale,
    clip_forward,
    encode_image,
    encode_text,
    get_logits,
    init_clip,
)
from .pretrained import (
    get_pretrained_cfg,
    get_pretrained_url,
    is_pretrained_cfg,
    list_pretrained,
    list_pretrained_models_by_tag,
    list_pretrained_tags_by_model,
)
from .models.clip import forward_intermediates
from .data.audio import (
    AUDIO_AVAILABLE,
    AudioAugmentationCfg,
    audio_transform_v2,
    require_audio,
)
from .models.clap import AudioTower
from .models.modern_text import ModernTextTransformer
from .convert import convert_params_dtype, convert_weights_to_fp16, convert_weights_to_lp
from .pretrained import download_pretrained, download_pretrained_from_hf, download_pretrained_from_url
from .task import (
    CLAPTask,
    CLIPTask,
    CoCaTask,
    DistillCLIPTask,
    GenLapTask,
    GenLipTask,
    ImageTextTask,
    SigLIPTask,
    TrainingTask,
    create_task,
    get_model_from_task,
)
from .export import export_encoders, load_exported, save_exported
from .push_to_hf_hub import push_pretrained_to_hf_hub, push_to_hf_hub, save_for_hf
from .tokenizer import (
    DEFAULT_CONTEXT_LENGTH,
    HFTokenizer,
    SigLipTokenizer,
    SimpleTokenizer,
    TikTokenTokenizer,
    decode,
    tokenize,
)
from .transform import AugmentationCfg, PreprocessCfg, image_transform, image_transform_v2
from .version import __version__
from .zero_shot_classifier import build_zero_shot_classifier, build_zero_shot_classifier_legacy
from .zero_shot_metadata import (
    IMAGENET_CLASSNAMES,
    OPENAI_IMAGENET_TEMPLATES,
    SIMPLE_IMAGENET_TEMPLATES,
)

# Reference model-class names (reference __init__.py:3-5,28): in this functional
# design the CLIPModel facade serves CoCa and CLAP configs (dispatch happens on the
# model config), and GenLIP/GenLAP have dedicated facades.
from .models.genlip import GenLipModel as NaFlexGenLip
from .models.genlap import GenLapModel as NaFlexGenLap

CoCa = CLIPModel
CLAP = CLIPModel

__all__ = [
    "__version__",
    "GenLipLoss",
    "CLIPAudioCfg",
    "AudioTower",
    "TrainingTask",
    "ImageTextTask",
    "CLIPTask",
    "SigLIPTask",
    "CoCaTask",
    "DistillCLIPTask",
    "CLAPTask",
    "GenLipTask",
    "GenLapTask",
    "create_task",
    "get_model_from_task",
    "ModernTextTransformer",
    "convert_params_dtype",
    "convert_weights_to_lp",
    "convert_weights_to_fp16",
    "download_pretrained",
    "download_pretrained_from_hf",
    "download_pretrained_from_url",
    "NaFlexGenLip",
    "NaFlexGenLap",
    "CoCa",
    "CLAP",
    "CLIPModelCfg",
    "CLIPTextCfg",
    "CLIPVisionCfg",
    "MultimodalCfg",
    "CLIPModel",
    "add_model_config",
    "get_model_config",
    "list_models",
    "create_model",
    "create_model_and_transforms",
    "create_model_from_pretrained",
    "get_tokenizer",
    "load_checkpoint",
    "create_loss",
    "ClipLoss",
    "SigLipLoss",
    "CoCaLoss",
    "DistillClipLoss",
    "clip_forward",
    "encode_image",
    "encode_text",
    "get_logits",
    "init_clip",
    "clamp_logit_scale",
    "list_pretrained",
    "list_pretrained_models_by_tag",
    "list_pretrained_tags_by_model",
    "is_pretrained_cfg",
    "get_pretrained_cfg",
    "get_pretrained_url",
    "SimpleTokenizer",
    "HFTokenizer",
    "tokenize",
    "decode",
    "DEFAULT_CONTEXT_LENGTH",
    "PreprocessCfg",
    "AugmentationCfg",
    "image_transform",
    "image_transform_v2",
    "forward_intermediates",
    "save_for_hf",
    "push_to_hf_hub",
    "export_encoders",
    "save_exported",
    "load_exported",
    "SigLipTokenizer",
    "TikTokenTokenizer",
    "build_zero_shot_classifier",
    "build_zero_shot_classifier_legacy",
    "IMAGENET_CLASSNAMES",
    "OPENAI_IMAGENET_TEMPLATES",
    "SIMPLE_IMAGENET_TEMPLATES",
    "OPENAI_DATASET_MEAN",
    "OPENAI_DATASET_STD",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "INCEPTION_MEAN",
    "INCEPTION_STD",
]
