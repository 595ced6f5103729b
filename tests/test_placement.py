"""utils/placement.py: packed host->device tree placement must be
value/shape/dtype-identical to plain jax.device_put."""

import jax
import jax.numpy as jnp
import numpy as np

from damc_tpu.utils.placement import device_put_packed


def _tree():
    rng = np.random.RandomState(0)
    return {
        "a": rng.randn(3, 4).astype(np.float32),
        "nested": {
            "b": rng.randn(7).astype(np.float32),
            "c": rng.randint(0, 10, (2, 2, 2)).astype(np.int32),
            "scalar": np.float32(2.5),
        },
        "d": rng.rand(5, 1).astype(np.float32),
        "mask": np.array([True, False, True]),
        "empty": np.zeros((0, 3), np.float32),
    }


def test_packed_put_matches_device_put():
    t = _tree()
    packed = device_put_packed(t)
    plain = jax.device_put(t)
    flat_p, td_p = jax.tree.flatten(packed)
    flat_q, td_q = jax.tree.flatten(plain)
    assert td_p == td_q
    for p, q in zip(flat_p, flat_q):
        assert isinstance(p, jax.Array)
        assert p.shape == q.shape and p.dtype == q.dtype
        np.testing.assert_array_equal(np.asarray(p), np.asarray(q))


def test_packed_put_passes_through_existing_arrays():
    dev_leaf = jnp.arange(4.0)
    t = {"host": np.ones((2, 2), np.float32), "dev": dev_leaf}
    out = device_put_packed(t)
    assert out["dev"] is dev_leaf  # no host round-trip
    np.testing.assert_array_equal(np.asarray(out["host"]), 1.0)


def test_packed_put_usable_in_jit():
    t = device_put_packed({"w": np.full((4, 4), 3.0, np.float32)})
    y = jax.jit(lambda p, x: x @ p["w"])(t, jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(y), 12.0)


def test_cast_float_leaves_keeps_weak_bf16_promotion():
    """Casting numpy trees must yield JAX arrays: a numpy-bf16 leaf follows
    numpy promotion (bf16 * python-float -> f32), which broke conv dtype
    uniformity in un-jitted generator_apply (regression)."""
    from damc_tpu.utils.placement import cast_float_leaves

    t = {"w": np.ones((2, 2), np.float32), "i": np.arange(3, dtype=np.int32)}
    c = cast_float_leaves(t, jnp.bfloat16)
    assert isinstance(c["w"], jax.Array) and c["w"].dtype == jnp.bfloat16
    assert c["i"].dtype == np.int32  # non-float leaves untouched
    assert (c["w"] * 2.0).dtype == jnp.bfloat16  # stays bf16 under py-float
    assert cast_float_leaves(t, None) is t  # identity when no dtype
