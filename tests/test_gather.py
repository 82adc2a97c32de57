"""Central take-vs-matmul gather policy (ops/gather).

The policy lives in ONE place (ops/gather._use_matmul + the PT_GATHER env
knob); these tests pin (a) bit-identical values on both paths, (b) the knob
and the auto policy actually selecting paths — a silent regression in
either path or in the policy plumbing fails here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.ops import gather


@pytest.fixture
def table_idx():
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    table = jax.random.normal(k1, (37, 9), jnp.float32) * 100.0
    idx = jax.random.randint(k2, (256,), 0, 37)
    return table, idx


def test_take_and_matmul_bit_identical(table_idx, monkeypatch):
    table, idx = table_idx
    monkeypatch.setenv("PT_GATHER", "take")
    a = np.asarray(gather.exact_rows(table, idx))
    monkeypatch.setenv("PT_GATHER", "matmul")
    b = np.asarray(gather.exact_rows(table, idx))
    ref = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(a, ref)
    np.testing.assert_array_equal(b, ref)


def test_policy_env_knob(monkeypatch):
    monkeypatch.setenv("PT_GATHER", "take")
    assert not gather._use_matmul(10, force_matmul=True)
    monkeypatch.setenv("PT_GATHER", "matmul")
    assert gather._use_matmul(10 ** 9, force_matmul=False)


def test_policy_auto(monkeypatch):
    monkeypatch.delenv("PT_GATHER", raising=False)
    on_tpu = jax.default_backend() == "tpu"
    # sites without a measured matmul win stay takes everywhere
    assert not gather._use_matmul(10, force_matmul=False)
    # site preference honored on TPU only, capped by MATMUL_MAX_ROWS
    assert gather._use_matmul(10, force_matmul=True) == on_tpu
    assert not gather._use_matmul(gather.MATMUL_MAX_ROWS + 1,
                                  force_matmul=True)


def test_matmul_path_differentiable(table_idx, monkeypatch):
    """The one-hot matmul's VJP is a scatter-add to the table (gradients to
    scene geometry/materials ride it)."""
    table, idx = table_idx
    monkeypatch.setenv("PT_GATHER", "matmul")

    def loss(t):
        return jnp.sum(gather.exact_rows(t, idx) ** 2)

    g = np.asarray(jax.grad(loss)(table))
    # expected: 2 * table[r] summed per row occurrence
    expected = np.zeros_like(np.asarray(table))
    tn, idxn = np.asarray(table), np.asarray(idx)
    for r in idxn:
        expected[r] += 2.0 * tn[r]
    np.testing.assert_allclose(g, expected, rtol=1e-5, atol=1e-4)
