"""Data pipeline tests: toy generators, image transforms, trajectory tools.

Shape/dtype/statistics invariants in the spirit of the reference's
datamodule tests (runner/tests/test_datamodule.py:11-50).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu.data import two_dim_data
from cfm_tpu.data.images import (
    infinite_batches,
    load_cifar10,
    load_mnist,
    normalize_images,
    random_hflip,
)
from cfm_tpu.data.toy import _REGISTRY
from cfm_tpu.data.trajectory import (
    circle_population,
    leaveout_adjusted_targets,
    resample_to_trajectory,
    sample_segment_pairs,
    tree_population,
    whiten,
)


def test_all_toy_generators_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    for name in _REGISTRY:
        gen = two_dim_data(name)
        a = gen(key, 128)
        b = gen(key, 128)
        assert a.shape == (128, 2), name
        assert bool(jnp.all(jnp.isfinite(a))), name
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # keyed determinism


def test_moons_and_8gaussians_reference_scaling():
    key = jax.random.PRNGKey(1)
    m = two_dim_data("moons")(key, 4096)
    g = two_dim_data("8gaussians")(key, 4096)
    # torchcfm scalings: moons*3-1 spans roughly [-4, 2]^2; 8gaussians radius
    # 5*sqrt(2)/2 ~ 3.5.
    assert float(jnp.abs(m).max()) < 6.0
    radius = jnp.sqrt(jnp.sum(jnp.square(g), axis=1))
    assert 3.0 < float(jnp.median(radius)) < 4.0


def test_synthetic_image_loaders():
    x, y = load_cifar10(synthetic=True)
    assert x.shape[1:] == (32, 32, 3) and x.dtype == np.uint8
    x, y = load_mnist(synthetic=True)
    assert x.shape[1:] == (28, 28, 1) and y.dtype == np.int32


def test_normalize_and_flip():
    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (8, 32, 32, 3), np.uint8))
    n = normalize_images(x)
    assert float(n.min()) >= -1.0 and float(n.max()) <= 1.0
    f = random_hflip(jax.random.PRNGKey(0), n)
    assert f.shape == n.shape
    # Each sample is either identical or exactly mirrored.
    for i in range(8):
        same = np.array_equal(np.asarray(f[i]), np.asarray(n[i]))
        flipped = np.array_equal(np.asarray(f[i]), np.asarray(n[i, :, ::-1, :]))
        assert same or flipped


def test_infinite_batches_covers_dataset():
    data = np.arange(100)[:, None]
    it = infinite_batches(data, None, 10, seed=0)
    seen = set()
    for _ in range(10):
        batch = next(it)
        seen.update(batch[:, 0].tolist())
    assert seen == set(range(100))


def test_segment_pairs_basic():
    X = jnp.arange(5)[None, :, None] * jnp.ones((64, 1, 1))
    x0, x1, tsel = sample_segment_pairs(jax.random.PRNGKey(0), X)
    np.testing.assert_allclose(np.asarray(x1 - x0), 1.0)
    assert int(tsel.min()) >= 0 and int(tsel.max()) <= 3


def test_segment_pairs_leaveout():
    X = jnp.arange(5)[None, :, None] * jnp.ones((256, 1, 1))
    x0, x1, tsel = sample_segment_pairs(
        jax.random.PRNGKey(0), X, leaveout_timepoint=2, training=True
    )
    # No segment starts at the left-out timepoint; segments ending there jump.
    assert 2 not in set(np.asarray(tsel).tolist())
    gaps = np.asarray(x1 - x0)[:, 0]
    starts = np.asarray(tsel)
    assert set(np.unique(gaps[starts == 1])) == {2.0}  # 1 -> 3 straddles
    assert set(np.unique(gaps[starts != 1])) == {1.0}


def test_leaveout_adjusted_targets():
    ut = jnp.ones((4, 2))
    t = jnp.full((4,), 0.3)
    tsel = jnp.array([0, 1, 2, 3])
    ut2, t2 = leaveout_adjusted_targets(ut, t, tsel, leaveout_timepoint=2)
    np.testing.assert_allclose(np.asarray(ut2[1]), 0.5)  # straddling pair halves
    np.testing.assert_allclose(np.asarray(t2[1]), 0.6)
    np.testing.assert_allclose(np.asarray(ut2[0]), 1.0)


def test_populations_and_resample():
    key = jax.random.PRNGKey(2)
    X = tree_population(key, 64, T=4)
    assert X.shape == (64, 4, 2)
    X = circle_population(key, 64, T=3)
    assert X.shape == (64, 3, 2)
    marg = [np.random.default_rng(i).normal(size=(50 + i * 10, 3)) for i in range(3)]
    batch = resample_to_trajectory(key, marg, 32)
    assert batch.shape == (32, 3, 3)
    white, mu, std = whiten(marg)
    full = np.concatenate(white)
    np.testing.assert_allclose(full.mean(0), 0.0, atol=1e-6)
    np.testing.assert_allclose(full.std(0), 1.0, atol=1e-2)


def test_cycle_population():
    from cfm_tpu.data.trajectory import cycle_population

    X = cycle_population(jax.random.PRNGKey(3), 64, T=5)
    assert X.shape == (64, 5, 2)
    # Half-cycle phase step: marginals two timepoints apart coincide.
    np.testing.assert_allclose(
        np.asarray(X[:, 0]).mean(0), np.asarray(X[:, 2]).mean(0), atol=0.1
    )


def test_eight_normal_sample_layout():
    """Reference-layout generator: radius-scale centers in dims 0:2, general dim."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from cfm_tpu.data.toy import eight_normal_sample

    x = eight_normal_sample(jax.random.PRNGKey(0), 8192, dim=5, scale=4.0, var=0.01)
    assert x.shape == (8192, 5)
    # First-two-coordinate radii concentrate near the scale.
    r = jnp.linalg.norm(x[:, :2], axis=-1)
    np.testing.assert_allclose(float(r.mean()), 4.0, rtol=0.02)
    # Remaining dims are pure zero-mean noise with std sqrt(var).
    np.testing.assert_allclose(float(x[:, 2:].std()), 0.1, rtol=0.05)
    assert abs(float(x[:, 2:].mean())) < 0.01
    with pytest.raises(ValueError):
        eight_normal_sample(jax.random.PRNGKey(0), 4, dim=1)
