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

pytestmark = pytest.mark.slow  # model-compile-heavy; excluded from the fast gate


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


@pytest.fixture(scope="module")
def ref_fusion(reference_modules):
    del reference_modules
    import importlib.util
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_fusion", "/root/reference/models/fusion.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod.MultimodalFusion
    finally:
        sys.path.remove("/root/reference")


def test_fusion_stack_parity(ref_fusion):
    """Import a reference MultimodalFusion checkpoint and compare fused
    embeddings — validates modality projections, bidirectional cross
    attention, alignment layers, and the final fusion head."""
    import torch

    from atq_tpu.models.fusion import MultimodalFusion
    from atq_tpu.utils.torch_interop import import_fusion_state_dict

    torch.manual_seed(0)
    ref = ref_fusion(input_dims={"image": 48, "text": 32}, output_dim=32,
                     fusion_method="cross_attention", num_heads=4,
                     use_rpb=True)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, quant = import_fusion_state_dict(sd)

    model = MultimodalFusion(input_dims={"image": 48, "text": 32},
                             output_dim=32,
                             fusion_method="cross_attention", num_heads=4,
                             use_rpb=True)
    rng = np.random.RandomState(0)
    img = rng.randn(3, 48).astype(np.float32)
    txt = rng.randn(3, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"image": torch.tensor(img),
                       "text": torch.tensor(txt)}).numpy()
    out = model.apply({"params": params, "quant": quant},
                      {"image": jnp.asarray(img), "text": jnp.asarray(txt)})
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3,
                               atol=2e-3)


def _make_retrieval_sd(ref_text_encoder, ref_fusion):
    """Synthesize a reference-style ATQMultimodalRetrieval state_dict (real
    reference text-encoder + fusion submodules, generated ResNet tensors,
    projector heads). Returns (sd, dim, hidden)."""
    import torch

    torch.manual_seed(0)
    dim, hidden = 32, 64
    sd = {}

    # ResNet18 tensors with torchvision Sequential naming.
    rng = np.random.RandomState(0)

    def add_conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32)

    def add_bn(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)
        sd[name + ".running_mean"] = np.zeros(c, np.float32)
        sd[name + ".running_var"] = np.ones(c, np.float32)

    pfx = "image_encoder.base_model."
    add_conv(pfx + "0", 64, 3, 7)
    add_bn(pfx + "1", 64)
    widths = [64, 128, 256, 512]
    for stage in range(4):
        w = widths[stage]
        for b in range(2):
            base = f"{pfx}{stage + 4}.{b}"
            cin = widths[stage - 1] if stage > 0 and b == 0 else w
            add_conv(base + ".conv1", w, cin, 3)
            add_bn(base + ".bn1", w)
            add_conv(base + ".conv2", w, w, 3)
            add_bn(base + ".bn2", w)
            if stage > 0 and b == 0:
                add_conv(base + ".downsample.0", w, widths[stage - 1], 1)
                add_bn(base + ".downsample.1", w)

    # Image encoder heads.
    def add_ln(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)

    def add_rpb(name, out_f, in_f):
        sd[name + ".weight"] = rng.randn(out_f, in_f).astype(np.float32)
        sd[name + ".alpha"] = np.ones(1, np.float32)
        sd[name + ".bias"] = np.zeros(out_f, np.float32)
        sd[name + ".precision_mask"] = (
            rng.rand(out_f, in_f) < 0.1).astype(np.float32)

    add_ln("image_encoder.feature_norm", 512)
    add_rpb("image_encoder.projector", dim, 512)
    add_ln("image_encoder.proj_norm", dim)
    sd["image_encoder.scaling"] = np.asarray([4.0], np.float32)

    # Real reference text encoder + fusion, prefixed.
    ref_te = ref_text_encoder(vocab_size=60, embed_dim=dim, num_heads=4,
                              num_layers=4, dim_feedforward=hidden,
                              use_rpb=True, sparsity_target=0.2,
                              max_seq_length=50)
    for k, v in ref_te.state_dict().items():
        sd[f"text_encoder.{k}"] = v.detach().numpy()
    ref_fu = ref_fusion(input_dims={"image": dim, "text": dim},
                        output_dim=dim, fusion_method="cross_attention",
                        num_heads=4, use_rpb=True)
    for k, v in ref_fu.state_dict().items():
        sd[f"fusion.{k}"] = v.detach().numpy()

    add_rpb("text_projector", dim, dim)
    add_rpb("image_projector", dim, dim)
    add_ln("img_norm", dim)
    add_ln("text_norm", dim)
    sd["temperature"] = np.asarray(0.07, np.float32)
    return sd, dim, hidden


def test_full_retrieval_import_structure(ref_text_encoder, ref_fusion):
    """Import the synthesized reference-style retrieval state_dict and
    check the trees match our model's init structure leaf-for-leaf."""
    import jax

    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.utils.torch_interop import import_retrieval_state_dict

    sd, dim, hidden = _make_retrieval_sd(ref_text_encoder, ref_fusion)
    params, quant, constants, stats = import_retrieval_state_dict(
        sd, num_text_layers=4
    )

    model = ATQMultimodalRetrieval(vocab_size=60, embed_dim=dim,
                                   hidden_dim=hidden, use_residual=True,
                                   max_seq_length=50)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)),
                      jnp.zeros((1, 50), jnp.int32),
                      jnp.asarray([5], jnp.int32))

    def shapes(tree):
        return {jax.tree_util.keystr(path): leaf.shape
                for path, leaf in jax.tree_util.tree_leaves_with_path(tree)}

    for name, ours, ref in [("params", params, init["params"]),
                            ("quant", quant, init["quant"]),
                            ("constants", constants, init["constants"]),
                            ("batch_stats", stats, init["batch_stats"])]:
        s_ours, s_ref = shapes(ours), shapes(ref)
        missing = set(s_ref) - set(s_ours)
        extra = set(s_ours) - set(s_ref)
        assert not missing, f"{name} missing: {sorted(missing)[:5]}"
        assert not extra, f"{name} extra: {sorted(extra)[:5]}"
        for k in s_ref:
            assert s_ours[k] == s_ref[k], (name, k, s_ours[k], s_ref[k])

    # And the imported model actually runs.
    out = model.apply(
        {"params": params, "quant": quant, "constants": constants,
         "batch_stats": stats},
        jnp.zeros((2, 64, 64, 3)), jnp.zeros((2, 50), jnp.int32),
        jnp.asarray([5, 5], jnp.int32),
    )
    assert out.shape == (2, 2)


def test_retrieval_export_round_trip(ref_text_encoder, ref_fusion):
    """import -> export -> import must be bitwise on every tensor, and the
    exported dict must carry exactly the reference's key set
    (export_retrieval_params inverting import_retrieval_state_dict;
    reference checkpoint naming per train_multimodal.py:645-669)."""
    from atq_tpu.utils.torch_interop import (
        export_retrieval_params,
        import_retrieval_state_dict,
    )

    sd, dim, hidden = _make_retrieval_sd(ref_text_encoder, ref_fusion)
    params, quant, constants, stats = import_retrieval_state_dict(
        sd, num_text_layers=4
    )
    exported = export_retrieval_params(params, quant, constants, stats,
                                       num_text_layers=4)

    missing = set(sd) - set(exported)
    extra = set(exported) - set(sd)
    assert not missing, f"export missing keys: {sorted(missing)[:8]}"
    assert not extra, f"export extra keys: {sorted(extra)[:8]}"
    for key in sd:
        got = np.asarray(exported[key], np.float32)
        want = np.asarray(sd[key], np.float32).reshape(got.shape)
        np.testing.assert_array_equal(
            got, want, err_msg=f"round-trip mismatch at {key}")

    # Second import of the export must equal the first import bitwise.
    params2, quant2, constants2, stats2 = import_retrieval_state_dict(
        exported, num_text_layers=4
    )
    for a, b in [(params, params2), (quant, quant2),
                 (constants, constants2), (stats, stats2)]:
        flat_a = jax.tree_util.tree_leaves_with_path(a)
        flat_b = dict(
            (jax.tree_util.keystr(p), l)
            for p, l in jax.tree_util.tree_leaves_with_path(b))
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[jax.tree_util.keystr(path)]),
                err_msg=f"re-import mismatch at {jax.tree_util.keystr(path)}")
