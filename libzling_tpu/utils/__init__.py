"""Host-side utilities: stream adapters, hooks, metrics."""
