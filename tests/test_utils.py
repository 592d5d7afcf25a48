"""utils package tests: MLP / MonotonicMLP behavior and profiling helpers."""

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.utils import MLP, MonotonicMLP, StepTimer


def test_mlp_shapes_and_nonlinearity():
    mlp = MLP(4, 8, 2, num_layers=3)
    p = mlp.init(jax.random.PRNGKey(0))
    x = jnp.ones((5, 4))
    y = mlp.apply(p, x)
    assert y.shape == (5, 2)
    # relu breaks odd symmetry (zero biases keep positive homogeneity, so
    # test f(-x) != -f(x) rather than scaling along a ray)
    y2 = mlp.apply(p, -x)
    assert not np.allclose(np.asarray(y2), -np.asarray(y))


def test_monotonic_mlp_is_monotone():
    m = MonotonicMLP(1, 1, 8)
    p = m.init(jax.random.PRNGKey(1))
    xs = jnp.linspace(-3, 3, 101)[:, None]
    ys = np.asarray(m.apply(p, xs))[:, 0]
    assert (np.diff(ys) >= -1e-6).all()


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            sum(range(1000))
    assert t.rate(100.0) > 0
    assert t.mean_ms >= 0
