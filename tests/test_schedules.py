"""Golden parity for the mixed-precision heuristics and the 3-phase
gradual quantization schedule vs /root/reference/atq/mixed_precision_atq.py."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.core.schedules import (
    GradualQuantizationScheduler,
    MixedPrecisionATQ,
    epoch_progress,
    set_quant_sparsity,
)


@pytest.fixture(scope="module")
def ref_mp():
    sys.path.insert(0, "/root/reference")
    try:
        import atq.mixed_precision_atq as ref
        yield ref
    finally:
        sys.path.remove("/root/reference")


LAYER_NAMES = [
    "fusion/final_fusion",
    "text_encoder/layers_0/self_attn/q_proj",
    "image_encoder/projector",
    "text_projector",
    "text_encoder/layers_1/linear1",
    "some/random/layer",
    "model/ffn_block/dense",
    "embed_tokens",
    "attention_pool_0",
]


def test_layer_importance_parity(ref_mp):
    for name in LAYER_NAMES:
        ours = MixedPrecisionATQ.get_layer_importance(name)
        theirs = ref_mp.MixedPrecisionATQ.get_layer_importance(None, name)
        assert ours == theirs, name


def test_precision_and_sparsity_formulas(ref_mp):
    for imp in [0.8, 1.0, 1.5, 2.0, 5.0]:
        assert MixedPrecisionATQ.get_precision_ratio(imp) == \
            ref_mp.MixedPrecisionATQ.get_precision_ratio(imp)
        assert MixedPrecisionATQ.get_sparsity_target(imp) == \
            ref_mp.MixedPrecisionATQ.get_sparsity_target(imp)


def test_calculate_quantization_params_parity(ref_mp):
    for name in LAYER_NAMES[:4]:
        for epoch in [0, 3, 9, 20]:
            ours = MixedPrecisionATQ.calculate_quantization_params(
                name, epoch, 20, 0.3
            )
            theirs = ref_mp.MixedPrecisionATQ.calculate_quantization_params(
                None, name, epoch, 20, 0.3
            )
            np.testing.assert_allclose(ours, theirs, rtol=1e-9)


@pytest.mark.parametrize("total,warmup", [(10, 2), (25, 5), (6, 2)])
def test_schedule_table_parity(ref_mp, total, warmup):
    class _Dummy:  # reference scheduler wants a model; only attrs used
        pass

    theirs = ref_mp.GradualQuantizationScheduler(
        _Dummy(), total, vision_sparsity=0.3, text_sparsity=0.2,
        warmup_epochs=warmup,
    )
    ours = GradualQuantizationScheduler(total, vision_sparsity=0.3,
                                        text_sparsity=0.2,
                                        warmup_epochs=warmup)
    np.testing.assert_allclose(ours.vision_sparsity_schedule,
                               theirs.vision_sparsity_schedule, rtol=1e-9)
    np.testing.assert_allclose(ours.text_sparsity_schedule,
                               theirs.text_sparsity_schedule, rtol=1e-9)


def test_update_model_quantization_vision_rule():
    quant = {
        "image_encoder": {"projector": {"sparsity_target": jnp.float32(0.1),
                                        "precision_mask": jnp.zeros((2, 2))}},
        "text_projector": {"sparsity_target": jnp.float32(0.1)},
    }
    out = MixedPrecisionATQ.update_model_quantization(
        quant, epoch=20, total_epochs=20,
        vision_threshold=0.4, text_threshold=0.2,
    )
    # image path -> vision threshold 0.4, importance 2.0 ('projector')
    # -> final = max(0.1, 0.4/2.0) = 0.2; full progress -> 0.2
    assert abs(float(
        out["image_encoder"]["projector"]["sparsity_target"]) - 0.2) < 1e-6
    # text path, importance 2.0 ('projector') -> max(0.1, 0.2/2) = 0.1
    assert abs(float(out["text_projector"]["sparsity_target"]) - 0.1) < 1e-6
    # masks untouched
    assert out["image_encoder"]["projector"]["precision_mask"].shape == (2, 2)


def test_set_quant_sparsity_plan():
    quant = {"text_projector": {"sparsity_target": jnp.float32(0.1)},
             "other": {"sparsity_target": jnp.float32(0.07)}}
    plan = {"text_projector": (0.1, 0.2)}
    out = set_quant_sparsity(quant, plan, epoch_progress(10, 25))
    # progress = 10/20 = 0.5 -> 0.15
    assert abs(float(out["text_projector"]["sparsity_target"]) - 0.15) < 1e-6
    assert abs(float(out["other"]["sparsity_target"]) - 0.07) < 1e-7
