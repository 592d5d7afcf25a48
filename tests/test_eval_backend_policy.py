"""`--eval_backend auto` selection policy (train/evaluate.py::make_best_ranker).

r05 policy: 'auto' flips to the maskless subtract-filtered kernel at or
above AUTO_MASKLESS_MIN_ENTITIES on TPU backends for the supported
hyperbolic/CHYP families, and stays on the exact dense ranker everywhere
else.  The flip is justified by measured filtered-MRR deltas on trained
params (benchmarks/eval_mrr_delta.py; make_best_ranker docstring records
the numbers).  These tests pin the SELECTION logic only — the kernels
themselves are covered by tests/test_pallas_kernels.py and the on-chip
smokes; here the kernel constructors are stubbed so the policy is
checkable on CPU.

Reference protocol being served: /root/reference/models/base.py:264-322
(filtered ranking); the reference has a single dense torch path, so the
selector is new capability with no counterpart.
"""
import pytest

import complexhyperbolickge_tpu.kernels as kernels
import complexhyperbolickge_tpu.utils.platform as platform
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train import evaluate as ev

YAGO_N, WN_N = 123_182, 40_943


def _model(name: str, n_entities: int):
    cfg = ModelConfig(n_entities=n_entities, n_relations=22, rank=9,
                      multi_c=True, bias="learn", dtype="float32")
    return get_model(name)(cfg)


@pytest.fixture
def on_tpu(monkeypatch):
    monkeypatch.setattr(platform, "is_tpu_backend", lambda: True)


@pytest.fixture
def spy(monkeypatch):
    """Stub the three fused-kernel constructors; record (name, masked)."""
    calls = []

    def make_stub(name):
        def stub(model, eval_batch_size, interpret=None, precision=None,
                 masked=True):
            calls.append((name, masked))
            return lambda *a, **k: None
        return stub

    monkeypatch.setattr(kernels, "make_pallas_ranker", make_stub("chyp"))
    monkeypatch.setattr(kernels, "make_pallas_hyp_ranker", make_stub("hyp"))
    monkeypatch.setattr(kernels, "make_pallas_attrh_ranker",
                        make_stub("attrh"))
    return calls


@pytest.mark.parametrize("name,expect", [
    ("FFTRotH", "chyp"), ("RotH", "hyp"), ("HyboNet", "hyp"),
    ("AttRH", "attrh"),
])
def test_auto_selects_maskless_at_yago_scale_on_tpu(on_tpu, spy, name,
                                                    expect):
    ev.make_best_ranker(_model(name, YAGO_N), eval_batch_size=500)
    assert spy == [(expect, False)]  # masked=False == the maskless kernel


def test_auto_stays_dense_below_threshold(on_tpu, spy):
    fn = ev.make_best_ranker(_model("FFTRotH", WN_N), eval_batch_size=500)
    assert spy == [] and hasattr(fn, "rank_many")  # dense ranker marker


def test_auto_stays_dense_off_tpu(monkeypatch, spy):
    monkeypatch.setattr(platform, "is_tpu_backend", lambda: False)
    fn = ev.make_best_ranker(_model("FFTRotH", YAGO_N), eval_batch_size=500)
    assert spy == [] and hasattr(fn, "rank_many")


def test_auto_stays_dense_for_unsupported_family(on_tpu, spy):
    # euclidean models have no fused ranker — auto must not flip
    fn = ev.make_best_ranker(_model("TransE", YAGO_N), eval_batch_size=500)
    assert spy == [] and hasattr(fn, "rank_many")


def test_dense_forced_everywhere(on_tpu, spy):
    fn = ev.make_best_ranker(_model("FFTRotH", YAGO_N), eval_batch_size=500,
                             backend="dense")
    assert spy == [] and hasattr(fn, "rank_many")


def test_pallas_forced_still_masked(on_tpu, spy):
    ev.make_best_ranker(_model("FFTRotH", YAGO_N), eval_batch_size=500,
                        backend="pallas")
    assert spy == [("chyp", True)]
