from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc, fused_mfcc_available

__all__ = ["fused_mfcc", "fused_mfcc_available"]
