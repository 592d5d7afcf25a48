"""Real-chip verification of the SHARDED rankers on a 1x1 device mesh.

The CPU suite proves the sharded rankers' collective structure on virtual
8-device meshes in interpret mode, but interpret mode does not prove TPU
lowering (CLAUDE.md: a Lorentz kernel once shipped that only interpreted)
and a 1-chip image cannot run a >1-shard mesh for real.  A 1x1 mesh on the
real chip is the strongest available hardware check: the shard_map
structure, in-shard gathers, psum reductions, and the per-shard Pallas
programs (masked AND maskless) all compile + execute on the TPU — only the
cross-chip traffic is absent (its correctness is the CPU mesh tests' job).

Covers every fused kernel family x {masked, maskless} plus one dense
sharded leg, each checked rank-for-rank against the single-device dense
ranker.  Correctness-only: tolerates CPU contention.

Run: python -m benchmarks.sharded_eval_smoke   (real TPU; ~15-30 min of
tunnel compiles)
"""
import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.parallel import (
    make_best_sharded_ranker,
    make_mesh,
    shard_params,
)
from complexhyperbolickge_tpu.train.evaluate import get_ranking

N_ENT = 301  # odd, < tile_n: exercises pad rows on the single shard


def main():
    data = synthetic_kg(n_entities=N_ENT, n_relations=4, n_train=512,
                        n_valid=64, n_test=64, seed=1)
    n_ent, n_rel, _ = data.get_shape()
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    pack = data.eval_pack("test", "rhs")
    q, f = jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx)

    ok, failed = [], []
    # one (family, backends) row per distinct per-shard program; the dense
    # sharded path is family-independent, so one model covers it
    matrix = [
        ("FFTRotH", 8, ("dense", "pallas", "pallas_maskless")),
        ("RotH", 8, ("pallas", "pallas_maskless")),
        ("RotLH", 8, ("pallas", "pallas_maskless")),
        ("AttRH", 8, ("pallas", "pallas_maskless")),
    ]
    for name, rank, backends in matrix:
        cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                          multi_c=True, bias="learn", dtype="float32")
        model = get_model(name)(cfg)
        rng = np.random.default_rng(7)
        params = {
            k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape),
                           dtype=jnp.float32)
            for k, (shape, _) in model.param_specs().items()
        }
        params["c"] = jnp.abs(params["c"]) + 0.5
        dense = get_ranking(model, params, pack, batch_size=64)
        sp = shard_params(params, mesh)
        for backend in backends:
            tag = f"{name}/{backend}"
            try:
                ranker = make_best_sharded_ranker(model, mesh, n_ent,
                                                  backend=backend)
                r = np.asarray(ranker(sp, q, f))
                n_diff = int((r != dense).sum())
                # the sharded kernels share the single-device kernels' MXU
                # tie class vs the dense ranker: allow |diff| <= 1 there,
                # report the exact-match count
                assert np.abs(r - dense).max() <= 1, (
                    f"max |diff| {np.abs(r - dense).max()}"
                )
                ok.append(tag)
                print(f"{tag}: ranks == dense on {len(dense) - n_diff}/"
                      f"{len(dense)} (max |diff| "
                      f"{int(np.abs(r - dense).max())})", flush=True)
            except Exception as e:  # noqa: BLE001 — report the full matrix
                failed.append((tag, f"{type(e).__name__}: {e}"))
                print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)

    n_total = sum(len(b) for _, _, b in matrix)
    print(f"\n{len(ok)}/{n_total} sharded rank programs OK on TPU",
          flush=True)
    if failed:
        raise SystemExit(f"failures: {failed}")


if __name__ == "__main__":
    main()
