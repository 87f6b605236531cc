"""Pallas patch kernels checked against the XLA reference in interpret mode.

The kernels in `ops/patch_pallas.py` are the Pallas DMA formulation of the
reference's `convolution.cu` patch gather/scatter; on CPU they run in
interpreter mode, which validates the kernel logic without TPU hardware
(the production path on TPU is the aligned-tile XLA program in
`ops/patch.py`, which benchmarks at speed-of-light for this op).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tike_tpu.ops.patch import patch_adj, patch_fwd


@pytest.fixture
def setup():
    rng = np.random.default_rng(3)
    hw, p, n = 96, 16, 11
    images = jnp.asarray(
        (rng.standard_normal((hw, hw)) + 1j * rng.standard_normal((hw, hw)))
        .astype(np.complex64)
    )
    positions = jnp.asarray(
        rng.uniform(1, hw - p - 2, (n, 2)).astype(np.float32)
    )
    patches = jnp.asarray(
        (rng.standard_normal((n, p, p)) + 1j * rng.standard_normal((n, p, p)))
        .astype(np.complex64)
    )
    return images, positions, patches, (hw, hw), p


@pytest.mark.slow
def test_patch_fwd_pallas_interpret(setup, monkeypatch):
    import tike_tpu.ops.patch_pallas as pp
    from jax.experimental import pallas as pl

    images, positions, patches, shape, p = setup
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k)
    )
    got = pp.patch_fwd_pallas(images, positions, p)
    want = patch_fwd(images, positions, p)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_patch_fwd_pallas_elem_interpret(setup):
    """Element-indexed (dynamic-DMA-free) forward matches the XLA path.

    This is the formulation targeted at the relay's Mosaic compiler, which
    rejects dynamic-offset DMA but compiles scalar-prefetch index maps
    (PALLAS_VERDICT.md); ``pl.Element`` block dims move the data-dependent
    addressing into the pipeline's own block fetch.
    """
    import tike_tpu.ops.patch_pallas as pp

    images, positions, patches, shape, p = setup
    got = pp.patch_fwd_pallas_elem(images, positions, p, interpret=True)
    want = patch_fwd(images, positions, p)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_patch_fwd_pallas_elem_bottom_edge_zero_reads(setup):
    """Windows past the bottom/right edge read zeros (reference semantics)."""
    import tike_tpu.ops.patch_pallas as pp

    images, positions, patches, shape, p = setup
    h, w = shape
    edge = jnp.asarray(
        [[h - p / 2, w - p / 2], [float(h - 1), float(w - 1)]],
        dtype=jnp.float32,
    )
    got = pp.patch_fwd_pallas_elem(images, edge, p, interpret=True)
    want = patch_fwd(images, edge, p)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_patch_adj_pallas_interpret(setup, monkeypatch):
    import tike_tpu.ops.patch_pallas as pp
    from jax.experimental import pallas as pl

    images, positions, patches, shape, p = setup
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k)
    )
    got = pp.patch_adj_pallas(patches, positions, shape, images)
    want = patch_adj(patches, positions, shape, images)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )
