"""Threaded WSGI server for the editing interface (stdlib only).

Run: python -m inklayer_tpu.serve.server --port 5002 [--models_dir ...]
Mirrors the reference's `python custom_interface/app.py --port 5002`.
"""

from __future__ import annotations

import argparse
from socketserver import ThreadingMixIn
from wsgiref.simple_server import WSGIServer, make_server


class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
    daemon_threads = True


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=5002)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--models_dir", type=str, default=None)
    args = parser.parse_args()

    from inklayer_tpu.serve.app import InkLayerApp

    def factory():
        from inklayer_tpu.build import build_pipeline
        from inklayer_tpu.config import PipelineConfig

        return build_pipeline(PipelineConfig(), models_dir=args.models_dir)

    app = InkLayerApp(pipeline_factory=factory)
    server = make_server(args.host, args.port, app,
                         server_class=ThreadingWSGIServer)
    print(f"inklayer-tpu serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
