"""Host-side input pipelines (datasets, batching, prefetch)."""
