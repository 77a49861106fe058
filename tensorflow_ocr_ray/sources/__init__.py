"""Sources/sinks: documents tables, font .data files, training sidecars."""
