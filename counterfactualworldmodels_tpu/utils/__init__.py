from . import torch_convert, checkpoint, profiling
from .cache import enable_persistent_cache
