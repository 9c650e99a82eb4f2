from tcresnet_tpu.serve.export import build_inference_fn, export_serialized
from tcresnet_tpu.serve.benchmark import benchmark_compiled

__all__ = ["build_inference_fn", "export_serialized", "benchmark_compiled"]
