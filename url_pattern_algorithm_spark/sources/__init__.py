"""Sources & sinks: deterministic synthetic interleaved-docs generator,
checkpoint-table catalog, cluster text-file scan."""
