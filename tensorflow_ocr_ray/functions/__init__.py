"""Per-span text functions: postprocessing chains and text analysis."""
