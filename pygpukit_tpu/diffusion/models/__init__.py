from .dit import DiT, DiTConfig
from .flux import FluxConfig, FluxTransformer
from .pixart import PixArtConfig, PixArtTransformer
from .vae import VAE, VAEConfig

__all__ = ["DiT", "DiTConfig", "FluxConfig", "FluxTransformer",
           "PixArtConfig", "PixArtTransformer", "VAE", "VAEConfig"]
