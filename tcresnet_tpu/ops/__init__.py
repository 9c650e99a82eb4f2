from tcresnet_tpu.ops import dsp
from tcresnet_tpu.ops import augment

__all__ = ["dsp", "augment"]
