from .unet import UNet3DConditionModel, UNetConfig  # noqa: F401
from .vae import AutoencoderKL, TinyAutoencoder, VAEConfig  # noqa: F401
