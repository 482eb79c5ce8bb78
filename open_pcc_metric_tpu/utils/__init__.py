from .cache import enable_compile_cache
from .logging import get_logger

__all__ = ["get_logger", "enable_compile_cache"]
