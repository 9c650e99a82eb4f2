from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.data.speech_commands import load_speech_commands
from tcresnet_tpu.data.synthetic import make_synthetic_dataset

__all__ = ["DeviceDataset", "load_speech_commands", "make_synthetic_dataset"]
