from tcresnet_tpu.utils.logging import get_logger
from tcresnet_tpu.utils.timing import Timer


def next_pow2(x: int, floor: int = 1) -> int:
    """Smallest power of two >= x (and >= floor).

    The ONE definition of the dataset-row pow2-padding law: DeviceDataset
    stores wavs as [N, P/128, 128] with P = next_pow2(clip_len, 128), and
    the fused kernels' gather_fusable check requires exactly that layout
    — the two must never drift.
    """
    p = floor
    while p < x:
        p *= 2
    return p


__all__ = ["get_logger", "Timer", "next_pow2"]
