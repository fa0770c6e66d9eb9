"""Utilities: timing, profiling, debug modes, compile cache."""

from .timer import benchmark  # noqa: F401
from .debug import debug_mode, check_backends_agree  # noqa: F401
from .profile import trace  # noqa: F401
from .cache import enable_persistent_cache  # noqa: F401
