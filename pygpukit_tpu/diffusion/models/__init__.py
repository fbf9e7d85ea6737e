from .dit import DiT, DiTConfig
from .flux import FluxConfig, FluxTransformer
from .vae import VAE, VAEConfig

__all__ = ["DiT", "DiTConfig", "FluxConfig", "FluxTransformer", "VAE",
           "VAEConfig"]
