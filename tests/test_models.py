"""Model-level tests: shapes, and the streaming ≡ non-streaming invariant
for full MixedNet / Inception models (reference README design claim,
verified per SURVEY.md §3.5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.mixednet import MixedNetConfig, tail_length
from microwakeword_tpu.models.inception import InceptionConfig


def small_mixednet(**kw):
    base = dict(
        pointwise_filters=(16, 16),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        stride=1,
        spectrogram_length=29,
    )
    base.update(kw)
    return MixedNetConfig(**base)


def test_mixednet_forward_shape():
    cfg = small_mixednet()
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.spectrogram_length, 40))
    probs = bundle.forward(variables, x)
    assert probs.shape == (4, 1)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_mixednet_default_config_shapes():
    # Default (reference-default) config: 194-frame input with defaults
    # dropped = 2 + (4+8+12+20) = 46 -> tail = 148.
    cfg = MixedNetConfig(spectrogram_length=194)
    from microwakeword_tpu.models.mixednet import spectrogram_slices_dropped

    assert spectrogram_slices_dropped(cfg) == 46
    assert tail_length(cfg) == 148
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    probs = bundle.forward(variables, jnp.zeros((2, 194, 40)))
    assert probs.shape == (2, 1)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"stride": 3, "spectrogram_length": 33},
        {"residual_connection": (True, True)},
        {"repeat_in_block": (2, 1), "spectrogram_length": 31},
        {"mixconv_kernel_sizes": ((3, 5), (5, 9)), "spectrogram_length": 33},
        {"pooled": True},
        {"first_conv_filters": 0, "spectrogram_length": 27},
    ],
)
def test_mixednet_stream_parity(kw):
    """probs from a streamed scan (zero-init ring buffers) must equal the
    non-streaming forward over each trailing window once warm."""
    cfg = small_mixednet(**kw)
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    T = cfg.spectrogram_length
    s = cfg.stride
    # Long stream: 3 windows worth of audio.
    total = ((3 * T) // s) * s
    x = jax.random.normal(jax.random.PRNGKey(2), (2, total, 40))
    probs_stream = bundle.stream_scan(variables, x)  # [B, total//s, 1]
    assert probs_stream.shape == (2, total // s, 1)
    # Steps whose trailing window [end-T, end) is fully real:
    for step in range(total // s - 1, total // s - 4, -1):
        end = (step + 1) * s
        if end - T < T:  # need warm ring buffers: end-T >= receptive warmup
            break
        window = x[:, end - T : end]
        full = bundle.forward(variables, window)
        np.testing.assert_allclose(
            probs_stream[:, step], full, atol=2e-4,
            err_msg=f"parity failed at step {step} (kw={kw})",
        )


def test_mixednet_stream_parity_strided_phase():
    """Stride=3 with first_conv kernel 3: ring=0, exact block alignment."""
    cfg = small_mixednet(stride=3, spectrogram_length=33)
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 99, 40))
    ps = bundle.stream_scan(variables, x)
    full = bundle.forward(variables, x[:, -33:])
    np.testing.assert_allclose(ps[:, -1], full, atol=2e-4)


def test_inception_forward_and_parity():
    cfg = InceptionConfig(
        cnn1_filters=(8,),
        cnn1_kernel_sizes=(3,),
        cnn1_subspectral_groups=(2,),
        cnn2_filters1=(6, 6),
        cnn2_filters2=(8, 8),
        cnn2_kernel_sizes=(3, 3),
        cnn2_subspectral_groups=(1, 1),
        cnn2_dilation=(1, 1),
        spectrogram_length=25,
    )
    bundle = build_model("inception", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 75, 40))
    probs = bundle.forward(variables, x[:, -25:])
    assert probs.shape == (2, 1)
    ps = bundle.stream_scan(variables, x)
    np.testing.assert_allclose(ps[:, -1], probs, atol=2e-4)


def test_batchnorm_updates_during_training():
    cfg = small_mixednet()
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(5), (8, cfg.spectrogram_length, 40)) * 3
    probs, updates = bundle.forward_train(variables, x)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(b, a) for b, a in zip(before, after)
    ), "batch stats did not update"


def test_param_count_is_tiny():
    # Reference-scale models are ~10^4 params (SURVEY.md §2.3).
    bundle = build_model("mixednet", MixedNetConfig(spectrogram_length=194))
    variables = bundle.init(jax.random.PRNGKey(0))
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 5_000 < n < 100_000, n
