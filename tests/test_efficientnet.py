import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.models.efficientnet import (
    EfficientNetAPRConfig, efficientnet_apr_forward, efficientnet_structure,
    init_efficientnet_apr, round_filters, round_repeats,
)


def test_scaling_rules_match_reference_widths():
    # b0: stem 32, final block 320, head 1280; b3: stem 40, head 1536
    stem0, blocks0, last0, head0 = efficientnet_structure("b0")
    assert stem0 == 32 and last0 == 320 and head0 == 1280
    assert len(blocks0) == 16
    stem3, blocks3, last3, head3 = efficientnet_structure("b3")
    assert stem3 == 40 and head3 == 1536
    assert round_filters(32, 1.2) == 40
    assert round_repeats(3, 1.4) == 5


def test_efficientnet_apr_forward():
    cfg = EfficientNetAPRConfig(variant="b0")
    params, state = init_efficientnet_apr(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)),
                    jnp.float32)
    pose, _ = efficientnet_apr_forward(params, state, x, cfg)
    assert pose.shape == (2, 12)
    assert np.isfinite(np.asarray(pose)).all()
