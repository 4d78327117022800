from . import reaper_jax

__all__ = ["reaper_jax"]
