"""Structured Streaming rendering of the reference's long-running
request server (the ``while(1)`` msgrcv loops at load_balancer.c:47,
primary_server.c:224, secondary_server.c:363)."""

from .ingest import (
    DOCUMENT_STREAM_SCHEMA,
    canonical_edge_stream,
    corpus_stream_stats,
    dedup_document_stream,
    read_document_stream,
    run_dedup_batch,
    run_edge_ingest_batch,
)
from .requests import (
    REQUEST_STREAM_SCHEMA,
    read_request_stream,
    request_load,
    route_stream,
    run_request_stream,
    running_route_totals,
    serve_requests_available_now,
)

__all__ = [
    "DOCUMENT_STREAM_SCHEMA",
    "REQUEST_STREAM_SCHEMA",
    "canonical_edge_stream",
    "corpus_stream_stats",
    "dedup_document_stream",
    "read_document_stream",
    "read_request_stream",
    "route_stream",
    "run_dedup_batch",
    "run_edge_ingest_batch",
    "request_load",
    "run_request_stream",
    "running_route_totals",
    "serve_requests_available_now",
]
