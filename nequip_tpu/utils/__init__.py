from .dtype import default_dtype, dtype_from_name, dtype_to_name, get_default_dtype, model_tolerance
from .global_state import set_global_state, global_dtype, set_tf32, get_latest_global_state
from .config import instantiate, resolve, load_config, register_resolver, locate
from .logger import RankedLogger
from .versions import get_current_code_versions, check_version_compatibility

__all__ = [
    "default_dtype",
    "dtype_from_name",
    "dtype_to_name",
    "get_default_dtype",
    "model_tolerance",
    "set_global_state",
    "global_dtype",
    "set_tf32",
    "get_latest_global_state",
    "instantiate",
    "resolve",
    "load_config",
    "register_resolver",
    "locate",
    "RankedLogger",
    "get_current_code_versions",
    "check_version_compatibility",
]
