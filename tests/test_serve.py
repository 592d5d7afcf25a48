"""kge-serve: HTTP prediction server over a trained checkpoint."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from complexhyperbolickge_tpu.cli.run import build_parser, train

    d = tmp_path_factory.mktemp("served")
    args = build_parser().parse_args([
        "--dataset", "synthetic", "--model", "FFTRotH", "--rank", "5",
        "--max_epochs", "1", "--valid", "1", "--batch_size", "128",
        "--eval_batch_size", "64", "--neg_sample_size", "5",
        "--optimizer", "Adam", "--learning_rate", "0.01", "--multi_c",
        "--dtype", "float32", "--save_dir", str(d),
    ])
    train(args)
    return str(d)


@pytest.fixture(scope="module")
def server(model_dir):
    from complexhyperbolickge_tpu.cli.serve import PredictService, make_server

    service = PredictService(model_dir, k=5, batch=8)  # auto filter width
    srv = make_server(service, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", service
    srv.shutdown()


def _post(url, payload, path="/predict"):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    url, service = server
    with urllib.request.urlopen(url + "/health") as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["model"] == "FFTRotH"
    assert h["n_entities"] == service.dataset.n_entities


def test_predict_matches_cli(server, model_dir):
    """The HTTP path (padded static batch) returns exactly what the one-shot
    kge-predict CLI returns for the same queries and k."""
    url, _ = server
    queries = [[3, 1], [17, 2], [44, 0]]
    status, got = _post(url, {"queries": queries, "k": 5})
    assert status == 200 and len(got) == 3

    from complexhyperbolickge_tpu.cli.predict import predict

    want = predict(model_dir, queries, k=5)
    for g, w in zip(got, want):
        assert g["tails"] == w["tails"]
        np.testing.assert_allclose(g["scores"], w["scores"], rtol=1e-6)


def test_predict_filter_known(server):
    """filter_known masks known facts; batch larger than the compiled batch
    chunks transparently (11 queries through batch=8)."""
    url, service = server
    queries = [[i % 20, i % 4] for i in range(11)]
    status, got = _post(url, {"queries": queries, "filter_known": True})
    assert status == 200 and len(got) == 11
    # filtered predictions exclude the known tails of each query
    from complexhyperbolickge_tpu.cli.predict import known_tail_filters

    fidx = np.asarray(known_tail_filters(service.dataset,
                                         np.asarray(queries, np.int32)))
    for row, out in zip(fidx, got):
        known = set(int(x) for x in row if x < service.dataset.n_entities)
        assert not (known & set(out["tails"]))


def test_predict_errors_are_400(server):
    url, _ = server
    for payload in ({"queries": [[99999999, 0]]},       # head out of range
                    {"queries": [[0, 0]], "k": 99},     # k > server k
                    {"queries": "nonsense"},            # wrong type
                    {}):                                # missing key
        status, body = _post(url, payload)
        assert status == 400 and "error" in body, (payload, status, body)


def test_unknown_paths_404(server):
    url, _ = server
    status, _body = _post(url, {}, path="/nope")
    assert status == 404
