"""HTTP serving front-end over the dynamic-batching layer (stdlib-only).

Endpoints (JSON in/out):

  POST /pv2smiles   {"pv": [53 floats], "normalized": false}
                    -> {"smiles": "..."}
                    Raw (denormalized) property values by default — they are
                    z-normalized with the bundled stats exactly like the
                    file-mode workload (reference d_pv2smiles_batched.py:64-66);
                    pass "normalized": true to send pre-normalized values.
                    Partial conditioning (the reference's single-query
                    workload, d_pv2smiles_single.py:60-66): send null for
                    any property to leave it unconstrained, and/or an
                    explicit "mask" list of 53 0/1 flags (1 = unconstrained;
                    nulls in pv are always masked, mask-flagged values are
                    ignored).
  POST /smiles2pv   {"smiles": "CCO"} -> {"pv": [53 floats]}  (denormalized)
  GET  /healthz     -> {"ok": true, "services": {...per-service stats}}

A ThreadingHTTPServer blocks each request's thread on its service future,
so concurrent clients coalesce into the fixed-size device batches that
spmm_tpu.serving launches (full-batch-or-deadline).  The reference has no
serving surface at all — every d_*.py is an offline script (SURVEY §1 L7).
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

N_PROPERTIES = 53


def make_server(services: dict, host: str, port: int,
                stats=None) -> ThreadingHTTPServer:
    """HTTP server routing to ``services`` ({'pv2smiles': ..., 'smiles2pv':
    ...}, each optional).  ``stats`` (PropertyStats) enables the raw-PV
    normalization on /pv2smiles.  Returns the server unstarted — call
    ``serve_forever()`` (tests bind port 0 and drive it from a thread)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet: one line per request is noise
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": f"no route {self.path}"})
            self._reply(200, {"ok": True, "services": {
                name: dict(svc.stats) for name, svc in services.items()}})

        def do_POST(self):
            name = self.path.lstrip("/")
            svc = services.get(name)
            if svc is None:
                return self._reply(404, {"error": f"no route {self.path}"})
            # phase 1 — parse/validate THIS request (client errors -> 400)
            try:
                raw = self.rfile.read(int(self.headers["Content-Length"]))
                req = json.loads(raw)
                if name == "pv2smiles":
                    vals = req["pv"]
                    if not isinstance(vals, list) or len(vals) != N_PROPERTIES:
                        raise ValueError(
                            f"pv must be a list of {N_PROPERTIES} entries, "
                            f"got {type(vals).__name__} of "
                            f"{len(vals) if isinstance(vals, list) else '?'}")
                    # null entries = unconstrained properties (partial
                    # conditioning, reference d_pv2smiles_single.py:60-66)
                    mask = np.asarray([v is None for v in vals], np.float32)
                    if "mask" in req:
                        m = req["mask"]
                        if (not isinstance(m, list)
                                or len(m) != N_PROPERTIES
                                or any(x not in (0, 1, 0.0, 1.0, False, True)
                                       for x in m)):
                            raise ValueError(
                                f"mask must be a list of {N_PROPERTIES} "
                                "0/1 flags")
                        mask = np.maximum(mask, np.asarray(m, np.float32))
                    pv = np.asarray([0.0 if v is None else float(v)
                                     for v in vals], np.float32)
                    if not req.get("normalized", False):
                        if stats is None:
                            raise ValueError(
                                "server has no normalization stats; send "
                                "normalized pv with \"normalized\": true")
                        pv = stats.normalize(pv)
                    # masked slots' values are inert; zero them so the
                    # normalization of a placeholder never leaks through
                    item = (np.where(mask > 0, 0.0, pv), mask)
                else:  # smiles2pv
                    item = req["smiles"]
                    if not isinstance(item, str) or not item:
                        raise ValueError("smiles must be a non-empty string")
            except (KeyError, ValueError, TypeError,
                    json.JSONDecodeError) as exc:
                return self._reply(400, {"error": str(exc)})
            # phase 2 — execute (batch failures are SERVER errors -> 500;
            # they may carry another coalesced request's message, never a
            # reason to blame this client's input)
            try:
                result = svc.submit(item).result()
                out = ({"smiles": result} if name == "pv2smiles"
                       else {"pv": [float(v) for v in result]})
            except Exception as exc:
                return self._reply(500, {"error": f"{type(exc).__name__}: "
                                                  f"{exc}"})
            self._reply(200, out)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    from spmm_tpu.checkpoint.io import load_spmm_params
    from spmm_tpu.cli._common import load_stats, make_tokenizer
    from spmm_tpu.parallel.mesh import auto_mesh
    from spmm_tpu.serving import Pv2SmilesService, Smiles2PvService

    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--stochastic", action="store_true",
                   help="sample beams multinomially (single-query mode: "
                        "k**2 stop, uniform pick among finished beams)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=128,
                   help="device batch per launch (v5e decode sweet spot 128)")
    p.add_argument("--max_wait_ms", type=float, default=25.0,
                   help="max time a request waits for a full batch, measured "
                        "from submission (an in-flight device launch can add "
                        "its remaining run time on top)")
    args = p.parse_args(argv)

    from spmm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    tok = make_tokenizer()
    stats = load_stats()
    params = load_spmm_params(args.checkpoint, with_pretrain_heads=False)
    mesh = auto_mesh()
    if mesh is not None:
        args.batch_size += -args.batch_size % mesh.devices.size
        print(f"data-parallel over {mesh.devices.size} devices")
    services = {
        "pv2smiles": Pv2SmilesService(
            params, tok, k=args.k, stochastic=args.stochastic,
            seed=args.seed, batch_size=args.batch_size,
            max_wait_ms=args.max_wait_ms, mesh=mesh),
        "smiles2pv": Smiles2PvService(
            params, tok, stats=stats, batch_size=args.batch_size,
            max_wait_ms=args.max_wait_ms, mesh=mesh),
    }
    server = make_server(services, args.host, args.port, stats=stats)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(POST /pv2smiles, POST /smiles2pv, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        for svc in services.values():
            svc.close()


if __name__ == "__main__":
    main()
