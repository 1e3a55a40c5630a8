from multistgraph_tpu.evaluator.evaluator import (
    EVALUATOR_REGISTRY,
    TrafficStateEvaluator,
    get_evaluator,
)

__all__ = ["EVALUATOR_REGISTRY", "TrafficStateEvaluator", "get_evaluator"]
