"""Model architectures: hparams, functional forwards, loader.

The analog of the reference's src/llama-model.cpp + src/models/* (100
arch files), built as functional JAX programs with stacked-layer scan.
"""

from .hparams import HParams
from .loader import LoadedModel, load_model

__all__ = ["HParams", "LoadedModel", "load_model"]
