"""einsum_f32acc: values match the plain einsum; backward stays bf16."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_modal_video_engine_tpu.ops.mixed_precision import einsum_f32acc
from cross_modal_video_engine_tpu.utils.roofline import op_costs

PATTERNS = [("bhld,bhsd->bhls", (2, 3, 5, 4), (2, 3, 7, 4)),
            ("bhls,bhsd->bhld", (2, 3, 5, 7), (2, 3, 7, 4))]


@pytest.mark.parametrize("pattern,sa,sb", PATTERNS)
def test_forward_matches_plain_einsum(pattern, sa, sb):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(sa), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(sb), jnp.bfloat16)
    got = einsum_f32acc(pattern, a, b)
    want = jnp.einsum(pattern, a, b, preferred_element_type=jnp.float32)
    assert got.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("pattern,sa,sb", PATTERNS)
def test_grads_match_f32_autodiff(pattern, sa, sb):
    """In f32 the autocast casts are no-ops, so grads must equal plain
    AD exactly; in bf16 they match to cotangent-rounding tolerance."""
    rng = np.random.default_rng(1)
    af = jnp.asarray(rng.standard_normal(sa), jnp.float32)
    bf = jnp.asarray(rng.standard_normal(sb), jnp.float32)

    def loss_ours(a, b):
        return jnp.sum(jnp.sin(einsum_f32acc(pattern, a, b)))

    def loss_plain(a, b):
        return jnp.sum(jnp.sin(jnp.einsum(
            pattern, a, b, preferred_element_type=jnp.float32)))

    ga, gb = jax.grad(loss_ours, (0, 1))(af, bf)
    pa, pb = jax.grad(loss_plain, (0, 1))(af, bf)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(pa), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(pb), rtol=1e-6)

    a16, b16 = af.astype(jnp.bfloat16), bf.astype(jnp.bfloat16)
    ga, gb = jax.grad(loss_ours, (0, 1))(a16, b16)
    np.testing.assert_allclose(np.asarray(ga, np.float32), np.asarray(pa),
                               rtol=0.06, atol=0.06)
    assert ga.dtype == jnp.bfloat16 and gb.dtype == jnp.bfloat16


def test_backward_dots_are_bf16():
    pattern, sa, sb = PATTERNS[0]
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal(sa), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(sb), jnp.bfloat16)

    def loss(a, b):
        return jnp.sum(einsum_f32acc(pattern, a, b).astype(jnp.bfloat16)
                       .astype(jnp.float32))

    costs = [c for c in op_costs(jax.grad(loss, (0, 1)), a, b) if c.flops]
    assert costs and all(c.dtypes == ("bfloat16",) for c in costs), \
        [(c.label, c.dtypes) for c in costs]


def test_rejects_sum_only_indices():
    with pytest.raises(AssertionError):
        einsum_f32acc("ij,jk->i", jnp.ones((2, 3)), jnp.ones((3, 4)))
