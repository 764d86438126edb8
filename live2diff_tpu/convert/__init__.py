from .torch_to_flax import (  # noqa: F401
    convert_state_dict,
    load_state_dict_file,
    unet_torch_to_flax,
    vae_torch_to_flax,
    clip_torch_to_flax,
    taesd_torch_to_flax,
)
from .lora import merge_lora_into_state_dict  # noqa: F401
from .ldm import convert_ldm_checkpoint  # noqa: F401
