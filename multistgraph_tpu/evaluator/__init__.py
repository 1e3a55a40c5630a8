from multistgraph_tpu.evaluator.evaluator import (
    EVALUATOR_REGISTRY,
    TrafficStateEvaluator,
    evaluate_model,
    get_evaluator,
)

__all__ = [
    "EVALUATOR_REGISTRY",
    "TrafficStateEvaluator",
    "evaluate_model",
    "get_evaluator",
]
