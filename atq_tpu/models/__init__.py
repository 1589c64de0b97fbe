from atq_tpu.models.image_classifier import ATQImageClassifier
from atq_tpu.models.text_encoder import ATQTextEncoder
from atq_tpu.models.fusion import MultimodalFusion, ModalitySpecificQuantization
from atq_tpu.models.retrieval import ATQMultimodalRetrieval, ImageEncoder
from atq_tpu.models.legacy import ATQMultimodalClassifier, MultimodalATQ

__all__ = [
    "ATQImageClassifier",
    "ATQTextEncoder",
    "MultimodalFusion",
    "ModalitySpecificQuantization",
    "ATQMultimodalRetrieval",
    "ImageEncoder",
    "ATQMultimodalClassifier",
    "MultimodalATQ",
]
