"""gRPC serving prototype (reference: `DeepFlows/DF_serving/`)."""

from .serving import MyDLPWServicer, PredictClient, PredictService

__all__ = ["MyDLPWServicer", "PredictClient", "PredictService"]
