"""End-to-end model parity through the torch checkpoint converter: load a
reference ATQImageClassifier's state_dict into our Flax model and compare
full-model logits on shared inputs (eval mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atq_tpu.models.image_classifier import ATQImageClassifier
from atq_tpu.utils.torch_interop import (
    export_classifier_params,
    import_classifier_state_dict,
)


@pytest.fixture(scope="module")
def ref_classifier(reference_modules):
    del reference_modules  # ensures /root/reference importable via conftest
    import importlib.util
    import sys

    # Load the module file directly — the reference models/__init__.py
    # imports torchvision (absent here) transitively.
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_image_classifier",
            "/root/reference/models/image_classifier.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod.ATQImageClassifier
    finally:
        sys.path.remove("/root/reference")


def test_full_model_logit_parity(ref_classifier):
    import torch

    torch.manual_seed(0)
    ref = ref_classifier(use_rpb=True, sparsity_target=0.3, hidden_size=128)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params, quant, stats = import_classifier_state_dict(sd, use_rpb=True)
    model = ATQImageClassifier(use_rpb=True, sparsity_target=0.3,
                               hidden_size=128)

    x = np.random.RandomState(0).randn(4, 1, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.tensor(x)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    logits = model.apply(
        {"params": params, "quant": quant, "batch_stats": stats},
        x_nhwc, train=False,
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=1e-3, atol=1e-3)


def test_export_round_trip(ref_classifier):
    import torch

    torch.manual_seed(1)
    ref = ref_classifier(use_rpb=True, hidden_size=128)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, quant, stats = import_classifier_state_dict(sd, use_rpb=True)
    sd2 = export_classifier_params(params, quant, stats)
    for key in sd:
        if "num_batches_tracked" in key:
            continue
        np.testing.assert_allclose(sd2[key], sd[key], rtol=1e-6,
                                   err_msg=key)
