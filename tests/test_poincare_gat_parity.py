"""Numeric parity for PoincareConv aggregation methods 2/3 and
PoincareGATConv against the EXECUTED reference.

Round-4 verdict items 8/3: the reference's alternate PoincareConv
aggregations (poincaregnn.py:195-216, unreachable at HEAD because
poincaregnn.py:132 hardcodes `method = 1`) and the unregistered
PoincareGATConv (poincaregnn.py:296-463) now have first-class
counterparts (convs.py agg_method / PoincareGATConv).

Method-2/3 testing executes the GENUINE reference propagate: the test
re-compiles the reference method's own source with the single constant
`method = 1` rewritten (no reference logic is transcribed), binds it onto a
real reference PoincareConv instance, and runs the full forward.

PoincareGATConv needs no patching — the reference class is complete and
executable (with the tests/reference_loader.py torch_scatter stub, which
supports the scatter-'max' its attention softmax uses); forward is called
directly for both head-gather modes.
"""

import inspect
import textwrap

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from complexhyperbolickge_tpu.models.gnn import convs as C

from tests.reference_loader import load
from tests.test_gnn_numeric_parity import (
    N_ENT,
    N_REL,
    _edges_aligned,
    _edges_sorted_halves,
    _hyp_conv_params,
    _randomize,
    t2n,
)


def _patched_method_propagate(mod, method: int):
    """Recompile the reference PoincareConv.propagate with its hardcoded
    `method = 1` selector (poincaregnn.py:132) rewritten to `method`.
    Executes the reference's own code object for the 2/3 branches."""
    src = textwrap.dedent(inspect.getsource(mod.PoincareConv.propagate))
    patched = src.replace("method = 1", f"method = {method}")
    assert patched != src, "reference method selector not found"
    ns = {}
    exec(compile(patched, f"<ref-propagate-m{method}>", "exec"),
         vars(mod), ns)
    return ns["propagate"]


@pytest.mark.parametrize("method", [2, 3])
def test_poincare_conv_methods_2_3_match_executed_reference(method):
    rng = np.random.default_rng(23 + method)
    d = 8
    mod = load("models.hyperbolicgnn.poincaregnn")
    conv = mod.PoincareConv(
        in_channels=d, out_channels=d, in_channels_r=d, out_channels_r=d,
        act=None, dropout=0.0, dtype="double",
    ).double()
    conv.propagate = _patched_method_propagate(mod, method).__get__(conv)
    p = _hyp_conv_params(conv, rng)
    mine = C.PoincareConv(d, d, d, d, act=None, dropout=0.0,
                          agg_method=method)

    x = rng.normal(0, 0.3, (N_ENT, d))
    rel = rng.normal(0, 0.3, (N_REL, 3 * d))
    curv_raw = rng.normal(0, 0.5, (N_REL, 1))

    h_a, t_a, r_a = _edges_aligned()
    out_ref, (rel_ref, craw_ref) = conv(
        torch.from_numpy(x),
        torch.from_numpy(np.stack([h_a, t_a])).long(),
        torch.from_numpy(r_a).long(),
        (torch.from_numpy(rel), torch.from_numpy(curv_raw)),
    )

    h_s, t_s, r_s = _edges_sorted_halves()
    out_my, (rel_my, craw_my) = mine.apply(
        p, jnp.asarray(x),
        (jnp.asarray(h_s), jnp.asarray(t_s), jnp.asarray(r_s)),
        (jnp.asarray(rel), jnp.asarray(curv_raw)),
        jnp.ones((h_s.shape[0],), jnp.float64),
    )
    # the 1/deg norms here include the +1 loop entry (method 2) or the raw
    # per-direction degrees (method 3); the reference computes them in
    # float32 (messagepassing.py:83 `.float()`), so the band absorbs a
    # float32 rounding of the norm — equation errors would be O(1)
    np.testing.assert_allclose(np.asarray(out_my), t2n(out_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rel_my), t2n(rel_ref),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(craw_my), t2n(craw_ref),
                               rtol=1e-9, atol=1e-11)


# ------------------------------ PoincareGATConv -------------------------------


def _gat_params(conv, rng):
    """Randomize + extract the GAT conv parameter set (keeps b_rel2 = 0:
    the inherited un-softplused-curvature quirk, inactive at zero bias —
    same convention as the PoincareConv parity test)."""
    _randomize(
        [("w_loop", conv.w_loop), ("w_in", conv.w_in), ("w_out", conv.w_out),
         ("b_loop", conv.b_loop), ("b_in", conv.b_in), ("b_out", conv.b_out),
         ("w_rel_w", conv.w_rel.weight), ("w_rel_b", conv.w_rel.bias),
         ("b_rel1", conv.b_rel1), ("b_rel2", conv.b_rel2),
         ("loop_curvature", conv.loop_curvature),
         ("loop_weight", conv.loop_weight),
         ("mlp0_w", conv.mlp_curvature.layers[0].weight),
         ("mlp0_b", conv.mlp_curvature.layers[0].bias),
         ("mlp1_w", conv.mlp_curvature.layers[1].weight),
         ("mlp1_b", conv.mlp_curvature.layers[1].bias),
         ("loop_rel", conv.loop_rel), ("w_k_r", conv.w_k_r),
         ("W_r", conv.W_r), ("a_h", conv.a_h), ("a_r", conv.a_r),
         ("a_t", conv.a_t)],
        rng, skip=("b_rel2",),
    )
    return {
        "w_loop": jnp.asarray(t2n(conv.w_loop)),
        "w_in": jnp.asarray(t2n(conv.w_in)),
        "w_out": jnp.asarray(t2n(conv.w_out)),
        "b_loop": jnp.asarray(t2n(conv.b_loop)),
        "b_in": jnp.asarray(t2n(conv.b_in)),
        "b_out": jnp.asarray(t2n(conv.b_out)),
        "w_rel": {"w": jnp.asarray(t2n(conv.w_rel.weight).T),
                  "b": jnp.asarray(t2n(conv.w_rel.bias))},
        "b_rel1": jnp.asarray(t2n(conv.b_rel1)),
        "b_rel2": jnp.asarray(t2n(conv.b_rel2)),
        "loop_curvature": jnp.asarray(t2n(conv.loop_curvature)),
        "loop_weight": jnp.asarray(t2n(conv.loop_weight)),
        "mlp_curvature": [
            {"w": jnp.asarray(t2n(conv.mlp_curvature.layers[0].weight).T),
             "b": jnp.asarray(t2n(conv.mlp_curvature.layers[0].bias))},
            {"w": jnp.asarray(t2n(conv.mlp_curvature.layers[1].weight).T),
             "b": jnp.asarray(t2n(conv.mlp_curvature.layers[1].bias))},
        ],
        "loop_rel": jnp.asarray(t2n(conv.loop_rel)),
        "w_k_r": jnp.asarray(t2n(conv.w_k_r)),
        "W_r": jnp.asarray(t2n(conv.W_r)),
        "a_h": jnp.asarray(t2n(conv.a_h)),
        "a_r": jnp.asarray(t2n(conv.a_r)),
        "a_t": jnp.asarray(t2n(conv.a_t)),
    }


@pytest.mark.parametrize("gather", ["mean", "concat"])
def test_poincare_gat_conv_matches_executed_reference(gather):
    rng = np.random.default_rng(29)
    d = 8  # concat: out_att = 2 per head (even, Givens-compatible)
    mod = load("models.hyperbolicgnn.poincaregnn")
    conv = mod.PoincareGATConv(
        gather=gather, in_channels=d, out_channels=d, in_channels_r=d,
        out_channels_r=d, act=None, dropout=0.0, dtype="double",
    ).double()
    p = _gat_params(conv, rng)
    mine = C.PoincareGATConv(d, d, d, d, act=None, dropout=0.0,
                             gather=gather)
    assert mine.out_att == conv.out_att

    x = rng.normal(0, 0.3, (N_ENT, d))
    rel = rng.normal(0, 0.3, (N_REL, 3 * d))
    curv_raw = rng.normal(0, 0.5, (N_REL, 1))

    h_a, t_a, r_a = _edges_aligned()
    out_ref, (rel_ref, craw_ref) = conv(
        torch.from_numpy(x),
        torch.from_numpy(np.stack([h_a, t_a])).long(),
        torch.from_numpy(r_a).long(),
        (torch.from_numpy(rel), torch.from_numpy(curv_raw)),
    )

    h_s, t_s, r_s = _edges_sorted_halves()
    out_my, (rel_my, craw_my) = mine.apply(
        p, jnp.asarray(x),
        (jnp.asarray(h_s), jnp.asarray(t_s), jnp.asarray(r_s)),
        (jnp.asarray(rel), jnp.asarray(curv_raw)),
        jnp.ones((h_s.shape[0],), jnp.float64),
    )
    # the GAT attention path is full f64 in the reference (its compute_norm
    # override never drops to float32), so the band is tight
    np.testing.assert_allclose(np.asarray(out_my), t2n(out_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(rel_my), t2n(rel_ref),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(craw_my), t2n(craw_ref),
                               rtol=1e-9, atol=1e-11)


def test_poincare_gat_model_trains_and_evals():
    """End-to-end PoincareGAT (our side): registry build, one epoch, finite
    params, eval above the all-ties floor — the model-level wiring check
    (per-layer gather mean/concat/mean, PoincareGCN decoder).  The full
    learning-parity pattern (test_gnn_numeric_parity.py) is not duplicated
    here: the conv parity above covers the math, and the reference model
    was never trained at its own HEAD (unregistered)."""
    import jax

    from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
    from complexhyperbolickge_tpu.models import ModelConfig, get_model
    from complexhyperbolickge_tpu.train.evaluate import avg_both, compute_metrics
    from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

    data = synthetic_kg(n_entities=50, n_relations=3, n_train=200,
                        n_valid=20, n_test=20)
    n_ent, n_rel, _ = data.get_shape()

    class _A:
        hidden_dim = 16
        layers = 2
        edge_dropout = 0.1
        dropout = 0.1

    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      bias="learn", multi_c=True, dtype="float32")
    model = get_model("PoincareGAT")(cfg, _A, data)
    assert [l.gather for l in model.layers] == ["concat", "mean"]
    tr = Trainer(model, TrainConfig(optimizer="Adam", learning_rate=1e-3,
                                    batch_size=64, neg_sample_size=8),
                 n_ent, n_rel)
    params, opt_state = tr.init(jax.random.PRNGKey(0))
    bb, ww, _ = epoch_batches(data.get_examples("train"), 64,
                              np.random.default_rng(0))
    params, opt_state, loss = tr.run_epoch(params, opt_state, bb, ww,
                                           jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(params))
    mrr = avg_both(compute_metrics(model, params, data, "test", 16))["MRR"]
    assert 0.0 < mrr <= 1.0
