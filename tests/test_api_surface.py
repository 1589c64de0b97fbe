"""API-surface parity: every public reference symbol has a home here.

Walks the reference's ``__all__`` lists (parsed with ast — the reference is
never imported, let alone copied) plus the symbols its drivers import
directly, and asserts each one maps to an importable attribute of this
package per the table in docs/MIGRATION.md. Also asserts CLI flag parity:
every ``add_argument`` option string in the reference drivers
(train.py:411-429, train_multimodal.py:822-872) is accepted by the
corresponding driver here.
"""

import ast
import importlib
import pathlib
import re

import pytest

REFERENCE = pathlib.Path("/root/reference")

# reference module -> {reference symbol: (atq_tpu module, attribute)}
# Renames are deliberate and documented in docs/MIGRATION.md.
SYMBOL_MAP = {
    "atq": {
        "adaptive_ternary_quantization": ("atq_tpu", "adaptive_ternary_quantization"),
        "TernaryLinear": ("atq_tpu", "TernaryLinear"),
        # torch autograd.Function -> jax custom_vjp function (renamed).
        "SelectiveGradientRouting": ("atq_tpu.nn", "selective_gradient_routing"),
        "apply_selective_routing": ("atq_tpu", "apply_selective_routing"),
        "ResidualPrecisionBoostLinear": ("atq_tpu", "ResidualPrecisionBoostLinear"),
    },
    "models": {
        "ATQImageClassifier": ("atq_tpu.models", "ATQImageClassifier"),
        "ATQMultimodalClassifier": ("atq_tpu.models", "ATQMultimodalClassifier"),
        "ATQTextEncoder": ("atq_tpu.models", "ATQTextEncoder"),
        "MultimodalFusion": ("atq_tpu.models", "MultimodalFusion"),
    },
    "utils": {
        "count_parameters": ("atq_tpu.utils", "count_parameters"),
        "measure_model_memory": ("atq_tpu.utils", "measure_model_memory"),
        "measure_inference_time": ("atq_tpu.utils", "measure_inference_time"),
        "estimate_flops": ("atq_tpu.utils", "estimate_flops"),
        "plot_weight_distribution": ("atq_tpu.utils", "plot_weight_distribution"),
        "visualize_ternary_weights": ("atq_tpu.utils", "visualize_ternary_weights"),
        "compare_model_efficiency": ("atq_tpu.utils", "compare_model_efficiency"),
    },
    "data": {
        "get_mnist_data": ("atq_tpu.data", "get_mnist_data"),
        "get_fashion_mnist_data": ("atq_tpu.data", "get_fashion_mnist_data"),
    },
}

# Symbols the reference's drivers / modules import directly without
# re-exporting through an __init__ (SURVEY.md §1 public interfaces).
DIRECT_IMPORTS = {
    # train.py:14
    "TernaryBitPacking": ("atq_tpu.core", "TernaryBitPacking"),
    # train_multimodal.py:14-18
    "ATQMultimodalRetrieval": ("atq_tpu.models", "ATQMultimodalRetrieval"),
    "MixedPrecisionATQ": ("atq_tpu.core.schedules", "MixedPrecisionATQ"),
    "GradualQuantizationScheduler": (
        "atq_tpu.core.schedules",
        "GradualQuantizationScheduler",
    ),
    "HardNegativeMiningInfoNCE": ("atq_tpu.losses", "HardNegativeMiningInfoNCE"),
    "ContrastiveLearningManager": ("atq_tpu.losses", "ContrastiveLearningManager"),
    "MultiPositiveInfoNCE": ("atq_tpu.losses", "MultiPositiveInfoNCE"),
    "prepare_flickr8k_dataloaders": ("atq_tpu.data", "prepare_flickr8k_dataloaders"),
    "visualize_flickr8k_samples": ("atq_tpu.data", "visualize_flickr8k_samples"),
    "Flickr8kDataset": ("atq_tpu.data.flickr8k", "Flickr8kDataset"),
    # models/__init__ neighbours used by other reference modules
    "TernaryMultiheadAttention": ("atq_tpu.nn", "TernaryMultiheadAttention"),
    "TernaryTransformerLayer": ("atq_tpu.nn", "TernaryTransformerLayer"),
    "TernaryCrossAttention": ("atq_tpu.nn", "TernaryCrossAttention"),
    "ModalitySpecificQuantization": (
        "atq_tpu.models",
        "ModalitySpecificQuantization",
    ),
    "ImageEncoder": ("atq_tpu.models", "ImageEncoder"),
    "MultimodalATQ": ("atq_tpu.models", "MultimodalATQ"),
    "PrecisionControlledLinear": (
        "atq_tpu.nn.mixed_precision",
        "PrecisionControlledLinear",
    ),
    "EnhancedATQTransformerLayer": (
        "atq_tpu.nn.mixed_precision",
        "EnhancedATQTransformerLayer",
    ),
    "MultimodalDataset": ("atq_tpu.data.multimodal_dataset", "MultimodalDataset"),
    # models/text_utils.py:19-143
    "build_vocabulary": ("atq_tpu.data.text_utils", "build_vocabulary"),
    "clean_text": ("atq_tpu.data.text_utils", "clean_text"),
    "tokenize_texts": ("atq_tpu.data.text_utils", "tokenize_texts"),
    "create_embedding_matrix": ("atq_tpu.data.text_utils", "create_embedding_matrix"),
}


def _reference_all(init_path: pathlib.Path):
    tree = ast.parse(init_path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for target in node.targets:
                if getattr(target, "id", None) == "__all__":
                    return [elt.value for elt in node.value.elts]
    return []


def _resolve(module_name: str, attr: str):
    mod = importlib.import_module(module_name)
    assert hasattr(mod, attr), f"{module_name} has no attribute {attr!r}"
    return getattr(mod, attr)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not available")
@pytest.mark.parametrize("pkg", sorted(SYMBOL_MAP))
def test_reference_public_api_covered(pkg):
    names = _reference_all(REFERENCE / pkg / "__init__.py")
    assert names, f"reference {pkg}/__init__.py has no __all__"
    for name in names:
        assert name in SYMBOL_MAP[pkg], (
            f"reference {pkg}.{name} has no mapping — update SYMBOL_MAP and "
            f"docs/MIGRATION.md"
        )
        module_name, attr = SYMBOL_MAP[pkg][name]
        assert callable(_resolve(module_name, attr))


def test_driver_direct_imports_covered():
    for name, (module_name, attr) in DIRECT_IMPORTS.items():
        assert callable(_resolve(module_name, attr)), name


def _reference_flags(driver: pathlib.Path):
    flags = set()
    for match in re.finditer(r"add_argument\(\s*['\"](--[\w-]+)['\"]", driver.read_text()):
        flags.add(match.group(1))
    return flags


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not available")
@pytest.mark.parametrize("driver", ["train.py", "train_multimodal.py"])
def test_driver_flag_parity(driver):
    ref_flags = _reference_flags(REFERENCE / driver)
    assert ref_flags, f"no flags parsed from reference {driver}"
    spec = importlib.util.spec_from_file_location(
        f"_driver_{driver[:-3]}", pathlib.Path(__file__).parent.parent / driver
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ours = set(mod.build_parser()._option_string_actions)
    missing = ref_flags - ours
    assert not missing, f"{driver} missing reference flags: {sorted(missing)}"


def test_serve_default_retrieval_config_is_int8_trunk():
    """The default serving configuration must be the safe-and-faster one
    (BENCHMARKS.md config-4 chase): int8 trunk ON, crash-prone 2-bit
    packed path opt-in, with --no_int8_trunk as the dense opt-out."""
    spec = importlib.util.spec_from_file_location(
        "_driver_serve", pathlib.Path(__file__).parent.parent / "serve.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    base = ["--task", "retrieval", "--checkpoint", "x.npz"]
    args = mod.build_parser().parse_args(base)
    assert args.int8_trunk is True
    assert args.packed is False
    args = mod.build_parser().parse_args(base + ["--no_int8_trunk"])
    assert args.int8_trunk is False
