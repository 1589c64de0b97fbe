from atq_tpu.train.classifier import train_classifier, ClassifierConfig
from atq_tpu.train.retrieval import train_retrieval, RetrievalConfig

__all__ = [
    "train_classifier",
    "ClassifierConfig",
    "train_retrieval",
    "RetrievalConfig",
]
