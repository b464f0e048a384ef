"""bin_gather primitive: values and autodiff rules on every transform path.

On CPU the primitive lowers to XLA gather/segment-sum, so these tests pin
the *calculus* (JVP under ``jax.linearize``, transpose, batching) that the
TPU Pallas path shares; kernel-vs-gather numerical identity is additionally
exercised on TPU by the benchmark harness.
"""

import jax
import numpy as np
import pytest
from jax import numpy as jnp

from nifty_tpu.ops.pallas_gather import SMALL_TABLE_MAX_BINS, bin_gather

pmp = pytest.mark.parametrize


@pmp("shape", [(13,), (5, 6), (3, 4, 5)])
def test_bin_gather_value(shape):
    rng = np.random.default_rng(42)
    nb = 17
    idx = jnp.asarray(rng.integers(0, nb, shape))
    t = jnp.asarray(rng.standard_normal(nb))
    np.testing.assert_allclose(bin_gather(t, idx), t[idx])


def test_bin_gather_linearize_and_transpose():
    rng = np.random.default_rng(3)
    nb = 11
    idx = jnp.asarray(rng.integers(0, nb, (7, 5)))
    t = jnp.asarray(rng.standard_normal(nb))
    f = lambda tt: bin_gather(tt, idx)

    y, lin = jax.linearize(f, t)
    dt = jnp.asarray(rng.standard_normal(nb))
    np.testing.assert_allclose(lin(dt), dt[idx])

    ct = jnp.asarray(rng.standard_normal((7, 5)))
    (g,) = jax.linear_transpose(lin, t)(ct)
    ref = jax.ops.segment_sum(ct.ravel(), idx.ravel(), num_segments=nb)
    np.testing.assert_allclose(g, ref, rtol=1e-13)


def test_bin_gather_grad():
    rng = np.random.default_rng(4)
    nb = 9
    idx = jnp.asarray(rng.integers(0, nb, (6, 4)))
    t = jnp.asarray(rng.standard_normal(nb))
    g = jax.grad(lambda tt: (bin_gather(tt, idx) ** 2).sum())(t)
    np.testing.assert_allclose(g, 2 * t * jnp.bincount(idx.ravel(), length=nb))


def test_bin_gather_vmap_table():
    rng = np.random.default_rng(5)
    nb, B = 8, 3
    idx = jnp.asarray(rng.integers(0, nb, (5, 6)))
    tb = jnp.asarray(rng.standard_normal((B, nb)))
    out = jax.vmap(lambda tt: bin_gather(tt, idx))(tb)
    np.testing.assert_allclose(out, jnp.stack([tb[i][idx] for i in range(B)]))


def test_bin_gather_nested_vmap_and_hvp():
    rng = np.random.default_rng(6)
    nb = 8
    idx = jnp.asarray(rng.integers(0, nb, (5, 6)))
    tbb = jnp.asarray(rng.standard_normal((2, 3, nb)))
    out = jax.vmap(jax.vmap(lambda tt: bin_gather(tt, idx)))(tbb)
    assert out.shape == (2, 3, 5, 6)

    # vmap(linearize(grad)) — the CG-over-samples hessp composition
    def loss(tt):
        return (bin_gather(tt, idx) ** 2).sum()

    tb = tbb[0]
    hv = jax.jit(
        jax.vmap(lambda tt, v: jax.jvp(jax.grad(loss), (tt,), (v,))[1])
    )(tb, tb)
    expect = 2 * tb * jnp.bincount(idx.ravel(), length=nb)[None]
    np.testing.assert_allclose(hv, expect, rtol=1e-12)


def test_bin_gather_vmap_idx():
    rng = np.random.default_rng(7)
    nb = 8
    t = jnp.asarray(rng.standard_normal(nb))
    idxb = jnp.asarray(rng.integers(0, nb, (4, 5)))
    out = jax.vmap(lambda ii: bin_gather(t, ii))(idxb)
    np.testing.assert_allclose(out, t[idxb])


def test_small_table_threshold_is_static():
    assert isinstance(SMALL_TABLE_MAX_BINS, int) and SMALL_TABLE_MAX_BINS >= 1024


def test_bin_gather_vmap_both_table_and_idx():
    """Simultaneous table+index batching (arises when linearize residualizes
    the index map per sample inside a vmapped metric-CG)."""
    rng = np.random.default_rng(3)
    tables = jnp.asarray(rng.normal(size=(3, 7)))
    idxs = jnp.asarray(rng.integers(0, 7, size=(3, 4, 5)))
    out = jax.vmap(bin_gather, in_axes=(0, 0))(tables, idxs)
    want = np.stack([np.asarray(t)[np.asarray(i)]
                     for t, i in zip(tables, idxs)])
    np.testing.assert_allclose(np.asarray(out), want)


def test_bin_gather_vmap_both_grad():
    rng = np.random.default_rng(4)
    tables = jnp.asarray(rng.normal(size=(2, 5)))
    idxs = jnp.asarray(rng.integers(0, 5, size=(2, 6)))

    def loss(t, i):
        return (bin_gather(t, i) ** 2).sum()

    g = jax.vmap(jax.grad(loss), in_axes=(0, 0))(tables, idxs)
    for b in range(2):
        gw = jax.grad(loss)(tables[b], idxs[b])
        np.testing.assert_allclose(np.asarray(g[b]), np.asarray(gw))


def test_vmapped_metric_cg_with_forced_primitive(monkeypatch):
    """End-to-end regression: a vmapped fused geoVI draw over a binned
    correlated field must trace (this hit the simultaneous-batching case)."""
    import nifty_tpu as jft
    import nifty_tpu.models.correlated_field as cfm_mod
    from nifty_tpu.evi import draw_linear_residual

    monkeypatch.setattr(
        cfm_mod, "distribute_power",
        lambda table, idx, sorted_aux=None: bin_gather(table, jnp.asarray(idx))
        if table.ndim == 1 else table[idx],
    )
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        (8, 8), distances=1.0 / 8, fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2), n_bins=4,
    )
    cf = cfm.finalize()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    truth = cf(cf.init(k1))
    data = truth + 0.1 * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, noise_cov_inv=lambda x: x / 0.01).amend(cf)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
    keys = jax.random.split(k2, 2)

    draw = jax.jit(jax.vmap(
        lambda k: draw_linear_residual(lh, pos, k, cg_kwargs=dict(maxiter=3))[0]
    ))
    out = draw(keys)
    # must match the plain-gather (XLA take) model exactly
    monkeypatch.undo()
    cfm2 = jft.CorrelatedFieldMaker("cf")
    cfm2.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm2.add_fluctuations(
        (8, 8), distances=1.0 / 8, fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2), n_bins=4,
    )
    cf2 = cfm2.finalize()
    lh2 = jft.Gaussian(data, noise_cov_inv=lambda x: x / 0.01).amend(cf2)
    draw2 = jax.jit(jax.vmap(
        lambda k: draw_linear_residual(lh2, pos, k, cg_kwargs=dict(maxiter=3))[0]
    ))
    out2 = draw2(keys)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(out2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)


def test_kernels_interpret_mode_match_xla(monkeypatch):
    """Run the actual Pallas kernel bodies (interpret mode) against the XLA
    lowering — covers the kernels' select-loop, static bin ranges, and the
    scatter's deferred cross-lane reduction without TPU hardware."""
    from nifty_tpu.ops import pallas_gather as pg

    rng = np.random.default_rng(11)
    nb = 96
    # > one grid block (block = 32*128 = 4096) incl. a ragged tail
    idx = rng.integers(0, nb, size=9000)
    # make block ranges genuinely narrow for some blocks (sorted half)
    idx[:4096] = np.sort(idx[:4096])
    idx = jnp.asarray(idx)
    t = jnp.asarray(rng.standard_normal(nb))
    ct = jnp.asarray(rng.standard_normal(9000))

    monkeypatch.setattr(pg, "_INTERPRET", True)
    got_fwd = pg.bin_gather(t, idx)
    got_adj = pg.bin_scatter_p.bind(ct[None], idx, nb=nb)[0]
    monkeypatch.setattr(pg, "_INTERPRET", False)
    ref_fwd = t[idx]
    ref_adj = jax.ops.segment_sum(ct, idx, num_segments=nb)
    np.testing.assert_allclose(got_fwd, ref_fwd, rtol=1e-13)
    np.testing.assert_allclose(got_adj, ref_adj, rtol=1e-12)


def test_static_idx_no_per_sample_residualization(monkeypatch):
    """With the index map as a primitive parameter, vmapped
    ``jax.linearize`` cannot residualize it per sample: the jaxpr contains
    only the static primitives (single table operand), so the shared-index
    TPU kernels stay applicable under batching."""
    from nifty_tpu.ops import pallas_gather as pg

    monkeypatch.setattr(pg, "_INTERPRET", True)

    rng = np.random.default_rng(23)
    nb = 40
    idx = rng.integers(0, nb, size=(12, 13))
    w = jnp.asarray(rng.standard_normal((12, 13)))

    def metric_like(t):
        # forward (gather) followed by its vjp (scatter), as in a
        # Gaussian metric J^T N^-1 J
        def fwd(tt):
            return pg.distribute_power(tt, idx) * w

        y, vjp = jax.vjp(fwd, t)
        return vjp(y)[0]

    tb = jnp.asarray(rng.standard_normal((4, nb)))

    def lin_apply(t):
        _, jvp = jax.linearize(metric_like, t)
        return jvp(t)

    jaxpr = jax.make_jaxpr(jax.vmap(lin_apply))(tb)
    prims = {e.primitive.name for e in jaxpr.jaxpr.eqns}

    def all_prims(jx, acc):
        for e in jx.eqns:
            acc.add(e.primitive.name)
            for sub in jax.core.jaxprs_in_params(e.params):
                all_prims(sub, acc)
        return acc

    prims = all_prims(jaxpr.jaxpr, set())
    assert "bin_gather_static" in prims or "bin_scatter_static" in prims
    assert "bin_gather" not in prims and "bin_scatter" not in prims

    got = jax.vmap(lin_apply)(tb)
    want = jnp.stack([lin_apply(t) for t in tb])
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # and plain grad/value correctness through the static primitives
    g = jax.grad(lambda t: jnp.sum(metric_like(t)))(tb[0])
    assert g.shape == (nb,) and bool(jnp.all(jnp.isfinite(g)))


def test_kernels_interpret_mode_mxu_midsize(monkeypatch):
    """The one-hot MXU chunk kernels for wide-span mid-size tables
    (1024 < nb <= 4096): gather and its transpose against XLA references,
    unbatched and batched, on an unbinned-style sorted-ish index map."""
    from nifty_tpu.ops import pallas_gather as pg

    rng = np.random.default_rng(17)
    nb, n = 2000, 70000  # > one 4096-lane block, ragged tail
    idx = np.sort(rng.integers(0, nb, size=n))  # wide spans per block
    idx[::7] = rng.integers(0, nb, size=len(idx[::7]))  # roughen
    idx = jnp.asarray(idx)
    t = jnp.asarray(rng.standard_normal(nb).astype(np.float32))
    tb = jnp.asarray(rng.standard_normal((5, nb)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ctb = jnp.asarray(rng.standard_normal((5, n)).astype(np.float32))

    monkeypatch.setattr(pg, "_INTERPRET", True)
    assert pg._use_mxu(nb, n, t.dtype, False)
    got_fwd = pg.bin_gather_p.bind(t[None], idx)[0]
    got_fwd_b = pg.bin_gather_p.bind(tb, idx)
    got_adj = pg.bin_scatter_p.bind(ct[None], idx, nb=nb)[0]
    got_adj_b = pg.bin_scatter_p.bind(ctb, idx, nb=nb)
    monkeypatch.setattr(pg, "_INTERPRET", False)

    np.testing.assert_allclose(got_fwd, t[idx], rtol=1e-6)
    np.testing.assert_allclose(got_fwd_b, tb[:, idx], rtol=1e-6)
    ref_adj = jax.ops.segment_sum(ct, idx, num_segments=nb)
    np.testing.assert_allclose(got_adj, ref_adj, rtol=1e-4, atol=1e-4)
    ref_adj_b = jax.vmap(
        lambda c: jax.ops.segment_sum(c, idx, num_segments=nb)
    )(ctb)
    np.testing.assert_allclose(got_adj_b, ref_adj_b, rtol=1e-4, atol=1e-4)


def test_kernels_interpret_mode_batched_idx(monkeypatch):
    """The native per-batch-index kernels (shared=False: per-batch block
    ranges, streamed table rows) against per-member XLA references — the
    path taken when vmapped linearize residualizes the index map per
    posterior sample."""
    from nifty_tpu.ops import pallas_gather as pg

    rng = np.random.default_rng(13)
    nb, bv, n = 96, 3, 9000
    idxs = jnp.asarray(rng.integers(0, nb, size=(bv, n)))
    tables = jnp.asarray(rng.standard_normal((bv, nb)))
    cts = jnp.asarray(rng.standard_normal((bv, n)))

    monkeypatch.setattr(pg, "_INTERPRET", True)
    got_fwd = pg.bin_gather_p.bind(tables, idxs, batched_idx=True)
    got_adj = pg.bin_scatter_p.bind(cts, idxs, nb=nb, batched_idx=True)
    # and the full vmap(bin_gather, in_axes=(0, 0)) route that produces it
    got_vmap = jax.vmap(pg.bin_gather, in_axes=(0, 0))(tables, idxs)
    monkeypatch.setattr(pg, "_INTERPRET", False)
    ref_fwd = jnp.stack([t[i] for t, i in zip(tables, idxs)])
    ref_adj = jnp.stack([
        jax.ops.segment_sum(c, i, num_segments=nb)
        for c, i in zip(cts, idxs)
    ])
    np.testing.assert_allclose(got_fwd, ref_fwd, rtol=1e-13)
    np.testing.assert_allclose(got_vmap, ref_fwd, rtol=1e-13)
    np.testing.assert_allclose(got_adj, ref_adj, rtol=1e-12)


def test_sorted_adjoint_gather_matches_xla(rng):
    """sorted_bin_gather: forward == table[idx] bitwise; transpose == the
    per-bin segment sum; survives jit/vmap/linearize (the metric path)."""
    from nifty_tpu.ops.pallas_gather import (
        sorted_bin_gather,
        sorted_scatter_aux,
    )

    nb, shape = 57, (12, 17)
    table = jnp.asarray(rng.normal(size=nb))
    idx_np = rng.integers(0, nb, size=shape).astype(np.int32)
    aux_np = sorted_scatter_aux(idx_np)
    idx = jnp.asarray(idx_np)
    perm = jnp.asarray(aux_np["perm"])
    sids = jnp.asarray(aux_np["sorted_ids"])

    f = jax.jit(lambda t, i, p, s: sorted_bin_gather(t, i, p, s))
    out = f(table, idx, perm, sids)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))

    # transpose: scatter-add
    cot = jnp.asarray(rng.normal(size=shape))
    g = jax.jit(jax.grad(
        lambda t: (sorted_bin_gather(t, idx, perm, sids) * cot).sum()
    ))(table)
    ref = np.zeros(nb)
    np.add.at(ref, idx_np.ravel(), np.asarray(cot).ravel())
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-12, atol=1e-12)

    # linearize + transpose of the linearized map (metric-style use)
    _, lin = jax.linearize(
        lambda t: sorted_bin_gather(t, idx, perm, sids), table
    )
    tan = jnp.asarray(rng.normal(size=nb))
    np.testing.assert_array_equal(np.asarray(lin(tan)), np.asarray(table[idx]) * 0 + np.asarray(tan[idx]))
    lt = jax.linear_transpose(lin, table)
    np.testing.assert_allclose(np.asarray(lt(cot)[0]), ref, rtol=1e-12)

    # vmap over the table batch axis
    tables = jnp.stack([table, 2.0 * table, -table])
    outs = jax.vmap(lambda t: sorted_bin_gather(t, idx, perm, sids))(tables)
    np.testing.assert_array_equal(np.asarray(outs[1]), np.asarray(2.0 * table)[idx_np])


def test_unbinned_cf_sorted_adjoint_route(rng, monkeypatch):
    """Forcing the runtime-consts threshold to 1 byte routes an unbinned
    CF through consts + sorted-adjoint distributor; outputs and gradients
    must match the baked-constant build."""
    import nifty_tpu as jft
    import nifty_tpu.models.correlated_field as cfmod

    def build():
        cfm = jft.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=0.5, offset_std=(1e-1, 3e-2))
        cfm.add_fluctuations(
            (24, 24), distances=1.0 / 24, fluctuations=(1.0, 5e-1),
            loglogavgslope=(-2.5, 2e-1), flexibility=(1e0, 5e-1),
        )
        return cfm.finalize()

    cf_ref = build()
    monkeypatch.setattr(
        cfmod.CorrelatedFieldMaker, "RUNTIME_DIST_MIN_BYTES", 1
    )
    cf_rt = build()
    assert cf_rt.consts is not None and any(
        k.startswith("pd_perm") for k in cf_rt.consts
    )
    x = cf_ref.init(jax.random.PRNGKey(5))
    a = jax.jit(cf_ref)(x)
    b = cf_rt.jcall(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-14)

    # gradients (pull the scatter transpose through the model)
    cot = jnp.asarray(rng.normal(size=a.shape))
    ga = jax.grad(lambda p: (cf_ref(p) * cot).sum())(x)
    gb = jax.grad(lambda p: (cf_rt(p) * cot).sum())(x)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-10, atol=1e-12)
