"""Serving layer: fused query engine + HTTP front end.

Reference analog: webserver.py (SURVEY.md §3.3) — load checkpoint + TSV
index, score queries with CPU numpy, argsort. Here the whole query path is
ONE jitted XLA program (encode → shard-local matmul → distributed exact
top-k merge); the host only tokenizes and maps result rows to id/text.
"""

from sse_tpu.serve.engine import QueryEngine
from sse_tpu.serve.batcher import MicroBatcher
from sse_tpu.serve.http import serve_http

__all__ = ["QueryEngine", "MicroBatcher", "serve_http"]
