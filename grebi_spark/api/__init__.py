"""Serving-boundary API layer: a dependency-free HTTP facade over the
engine's query functions (see http_api)."""
