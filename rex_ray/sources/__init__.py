"""Sources & sinks: parquet/Lance interleaved-doc reading, jsonl/csv IO,
embedding files, and the deterministic interleaved-doc synthesizer."""
