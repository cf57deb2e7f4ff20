"""Inference workloads: scan/beam decoders with preallocated KV caches."""
