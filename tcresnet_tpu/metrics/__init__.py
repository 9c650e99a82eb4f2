from tcresnet_tpu.metrics.host_metrics import compute_classification_metrics
from tcresnet_tpu.metrics.writers import MetricWriter

__all__ = ["compute_classification_metrics", "MetricWriter"]
