from tcresnet_tpu.train.trainer import Trainer

__all__ = ["Trainer"]
