"""kge-serve: HTTP serving of top-k tail prediction from a checkpoint.

Beyond the reference (which has no inference entry at all): a stdlib
ThreadingHTTPServer around train/evaluate.py::make_predictor, with
static-shape batching so every request hits one pre-compiled XLA program
(no per-request recompiles — requests are padded to --batch and sliced).

    kge-serve --model_dir runs/fftroth --port 8080 --k 10 --batch 32

    GET  /health            -> {"status": "ok", "model": ..., "n_entities": ...}
    POST /predict           body: {"queries": [[head, rel], ...],
                                   "k": <=server k (optional),
                                   "filter_known": bool (optional)}
                            -> [{"head", "rel", "tails", "scores"}, ...]

Device calls are serialized by a lock (one in-flight XLA dispatch), so
concurrent HTTP clients queue instead of racing the device.  Entity /
relation identifiers are integer ids (the reference's pickle format carries
no name vocabulary; map names to ids upstream).
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax.numpy as jnp


class PredictService:
    """Loaded model + one compiled fixed-shape predictor."""

    def __init__(self, model_dir: str, k: int = 10, batch: int = 32,
                 max_filter_len: int | None = None, warm_filters: bool = False):
        from complexhyperbolickge_tpu.cli.predict import (
            known_tail_filters,
            load_serving_state,
            max_known_tails,
        )
        from complexhyperbolickge_tpu.train.evaluate import make_predictor

        self.model, self.params, self.dataset = load_serving_state(model_dir)
        self.k, self.batch = k, batch
        # auto-size to the dataset's longest known-tail list so filtering
        # can never silently leak a known fact; an explicit max_filter_len
        # below the dataset max would make known_tail_filters raise per
        # request instead
        self.max_filter_len = (max_known_tails(self.dataset)
                               if max_filter_len is None else max_filter_len)
        self._known_tail_filters = known_tail_filters
        self._fn = make_predictor(self.model, k=k)
        self._lock = threading.Lock()
        # warm the unfiltered program so first requests don't pay the
        # compile; the filtered variant compiles lazily on its first request
        # (each compile costs 40s-6min through a remote tunnel) unless
        # warm_filters pre-pays it here
        pad_q = jnp.zeros((batch, 2), jnp.int32)
        np.asarray(self._fn(self.params, pad_q, None)[0])
        if warm_filters:
            pad_f = jnp.full((batch, self.max_filter_len),
                             self.dataset.n_entities, jnp.int32)
            np.asarray(self._fn(self.params, pad_q, pad_f)[0])

    def predict(self, queries, k: int | None = None,
                filter_known: bool = False):
        k = self.k if k is None else k
        if not 1 <= k <= self.k:
            raise ValueError(f"k must be in [1, {self.k}] (server --k)")
        q = np.asarray(queries, dtype=np.int32)
        if q.ndim != 2 or q.shape[1] != 2:
            raise ValueError("queries must be [[head, rel], ...]")
        n_ent, n_pred = self.dataset.n_entities, self.dataset.n_predicates
        if not ((q[:, 0] >= 0) & (q[:, 0] < n_ent)).all():
            raise ValueError("head id out of range")
        if not ((q[:, 1] >= 0) & (q[:, 1] < n_pred)).all():
            raise ValueError("relation id out of range")

        out = []
        for lo in range(0, len(q), self.batch):
            chunk = q[lo: lo + self.batch]
            n = len(chunk)
            padded = np.zeros((self.batch, 2), np.int32)
            padded[:n] = chunk
            fidx = None
            if filter_known:
                fidx = self._known_tail_filters(
                    self.dataset, padded, lmax=self.max_filter_len
                )
            with self._lock:  # one in-flight device dispatch
                ids, scores = self._fn(self.params, jnp.asarray(padded), fidx)
            ids, scores = np.asarray(ids)[:n, :k], np.asarray(scores)[:n, :k]
            for row_q, row_i, row_s in zip(chunk, ids, scores):
                out.append({
                    "head": int(row_q[0]), "rel": int(row_q[1]),
                    "tails": [int(x) for x in row_i],
                    "scores": [float(x) for x in row_s],
                })
        return out


def make_server(service: PredictService, host: str = "127.0.0.1",
                port: int = 8080) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            logging.info("%s " + fmt, self.address_string(), *args)

        def _send(self, code: int, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {
                    "status": "ok",
                    "model": type(service.model).__name__,
                    "n_entities": service.dataset.n_entities,
                    "n_relations": service.dataset.n_predicates,
                    "k": service.k,
                })
            else:
                self._send(404, {"error": "unknown path (GET /health)"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path (POST /predict)"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                out = service.predict(
                    req["queries"], k=req.get("k"),
                    filter_known=bool(req.get("filter_known", False)),
                )
                self._send(200, out)
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # noqa: BLE001 — a request must not kill the server
                logging.exception("prediction failed")
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main():
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    p = argparse.ArgumentParser(description="HTTP top-k prediction server")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8080, type=int)
    p.add_argument("--k", default=10, type=int,
                   help="max top-k the compiled predictor supports")
    p.add_argument("--batch", default=32, type=int,
                   help="compiled batch size (requests pad up / chunk down)")
    p.add_argument("--max_filter_len", default=None, type=int,
                   help="padded width of the known-fact filter rows "
                        "(default: the dataset's longest known-tail list, "
                        "so filtering never truncates)")
    p.add_argument("--warm_filters", action="store_true",
                   help="pre-compile the filtered predictor at startup "
                        "(otherwise the first filter_known request pays it)")
    a = p.parse_args()
    service = PredictService(a.model_dir, k=a.k, batch=a.batch,
                             max_filter_len=a.max_filter_len,
                             warm_filters=a.warm_filters)
    server = make_server(service, a.host, a.port)
    logging.info("serving %s on http://%s:%d (k<=%d, batch %d)",
                 a.model_dir, a.host, a.port, a.k, a.batch)
    server.serve_forever()


if __name__ == "__main__":
    main()
