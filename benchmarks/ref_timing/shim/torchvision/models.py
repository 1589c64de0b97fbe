"""Shim torchvision.models — import-time surface only.

The reference's models/multimodal_classifier.py:10 imports this module
at package-import time, but the classification driver being timed
(train.py) never constructs a backbone. Pretrained weights cannot
exist on this box (zero egress), so the constructors raise if actually
called; that path is out of scope for the timing run.
"""


class _Weights:
    IMAGENET1K_V1 = "IMAGENET1K_V1"


ResNet18_Weights = _Weights
ResNet50_Weights = _Weights


def _unavailable(name):
    def ctor(*args, **kwargs):
        raise RuntimeError(
            f"torchvision shim: {name} pretrained backbone is not "
            "available on this zero-egress box (shim provides "
            "import-time surface only; see "
            "benchmarks/ref_timing/shim/torchvision)")
    return ctor


resnet18 = _unavailable("resnet18")
resnet50 = _unavailable("resnet50")
