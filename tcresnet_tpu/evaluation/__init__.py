from tcresnet_tpu.evaluation.best_keeper import BestKeeper
from tcresnet_tpu.evaluation.evaluator import Evaluator

__all__ = ["Evaluator", "BestKeeper"]
