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


@pytest.fixture(scope="module")
def ref_text_encoder(reference_modules):
    del reference_modules
    import importlib.util
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_text_encoder", "/root/reference/models/text_encoder.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod.ATQTextEncoder
    finally:
        sys.path.remove("/root/reference")


def test_text_encoder_stack_parity(ref_text_encoder):
    """Import a reference ATQTextEncoder checkpoint and compare pooled text
    features — validates the whole ternary attention / transformer /
    double-softmax-pooling chain end to end."""
    import torch

    from atq_tpu.models.text_encoder import ATQTextEncoder
    from atq_tpu.utils.torch_interop import import_text_encoder_state_dict

    torch.manual_seed(0)
    vocab, dim, heads, layers, ff = 120, 32, 4, 2, 64
    ref = ref_text_encoder(vocab_size=vocab, embed_dim=dim, num_heads=heads,
                           num_layers=layers, dim_feedforward=ff,
                           use_rpb=True, sparsity_target=0.3,
                           max_seq_length=24)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, quant, constants = import_text_encoder_state_dict(
        sd, num_layers=layers, sparsity_target=0.3)

    model = ATQTextEncoder(vocab_size=vocab, embed_dim=dim, num_heads=heads,
                           num_layers=layers, dim_feedforward=ff,
                           use_rpb=True, sparsity_target=0.3,
                           max_seq_length=24)

    rng = np.random.RandomState(0)
    x = rng.randint(0, vocab, (3, 12))
    lengths = np.asarray([5, 9, 12])

    with torch.no_grad():
        ref_out = ref(torch.tensor(x),
                      torch.tensor(lengths)).numpy()
    out = model.apply(
        {"params": params, "quant": quant, "constants": constants},
        jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3,
                               atol=2e-3)

    # and without a mask
    with torch.no_grad():
        ref_out2 = ref(torch.tensor(x)).numpy()
    out2 = model.apply(
        {"params": params, "quant": quant, "constants": constants},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out2), ref_out2, rtol=2e-3,
                               atol=2e-3)
