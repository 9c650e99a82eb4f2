from tcresnet_tpu.utils.logging import get_logger
from tcresnet_tpu.utils.timing import Timer

__all__ = ["get_logger", "Timer"]
